"""Entry point matching the reference's `python check_move_networks.py ...` invocation shape."""

from gance_tpu.cli.check_move_networks import cli

if __name__ == "__main__":
    cli()
