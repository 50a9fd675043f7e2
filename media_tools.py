"""Entry point for the raw-spill media utilities (`python media_tools.py ...`)."""

from gance_tpu.cli.media_tools import cli

if __name__ == "__main__":
    cli()
