"""Entry point matching the reference's `python music_into_networks.py ...` invocation shape."""

from gance_tpu.cli.music_into_networks import cli

if __name__ == "__main__":
    cli()
