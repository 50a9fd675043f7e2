"""
Training CLI: train a tiny model for a few steps, checkpoint, resume, export a
.pkl, and synthesize from the exported network — the full closed loop.
"""

from pathlib import Path

import numpy as np
from click.testing import CliRunner

from gance_tpu.cli.train import cli
from gance_tpu.media.images import write_image


def test_train_resume_and_export(tmp_path):
    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.RandomState(0)
    for i in range(6):
        write_image((rng.rand(16, 16, 3) * 255).astype(np.uint8), data / f"{i}.png")

    ckpt = tmp_path / "ckpt.pkl"
    out_net = tmp_path / "trained.pkl"
    args = [
        "--dataset-directory", str(data),
        "--resolution", "16",
        "--batch-size", "4",
        "--learning-rate", "0.002",
        "--fmap-base", "256",
        "--fmap-max", "32",
        "--latent-size", "32",
        "--checkpoint-path", str(ckpt),
        "--checkpoint-every", "2",
        "--output-network", str(out_net),
        "--data-parallel", "4",
    ]
    result = CliRunner().invoke(cli, args + ["--total-steps", "2"], catch_exceptions=False)
    assert result.exit_code == 0
    assert ckpt.exists() and out_net.exists()

    # resume: continue to 4 steps from the checkpoint
    result = CliRunner().invoke(cli, args + ["--total-steps", "4"], catch_exceptions=False)
    assert result.exit_code == 0

    from gance_tpu.parallel.training import load_checkpoint

    assert int(load_checkpoint(ckpt).step) == 4

    # the exported pkl loads and synthesizes
    from gance_tpu.synthesis.runtime import SynthesisNetwork

    net = SynthesisNetwork.from_pkl(out_net)
    imgs = net.images_from_vectors(np.zeros((2, 32), np.float32))
    assert imgs.shape == (2, 16, 16, 3)
