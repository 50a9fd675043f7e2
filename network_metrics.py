"""Entry point for network quality metrics (PPL, Fréchet feature distance)."""

from gance_tpu.cli.network_metrics import cli

if __name__ == "__main__":
    cli()
