"""Entry point for the online synthesis daemon: `python serve_network.py --network-path ...`."""

from gance_tpu.cli.serve import cli

if __name__ == "__main__":
    cli()
