"""Entry point for StyleGAN2 training (resumable; exports loadable .pkl networks)."""

from gance_tpu.cli.train import cli

if __name__ == "__main__":
    cli()
