"""Entry point matching the reference's `python process_images.py ...` invocation shape."""

from gance_tpu.cli.process_images import cli

if __name__ == "__main__":
    cli()
