"""Entry point matching the reference's `python synthesize_images.py ...` invocation shape."""

from gance_tpu.cli.synthesize_images import cli

if __name__ == "__main__":
    cli()
