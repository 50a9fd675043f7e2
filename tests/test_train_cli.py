"""
Training CLI: train a tiny model for a few steps, checkpoint, resume, export a
.pkl, and synthesize from the exported network — the full closed loop.
"""

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
    run_config = tmp_path / "run_config.json"
    result = CliRunner().invoke(
        cli,
        args + ["--total-steps", "2", "--run-config", str(run_config)],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    assert ckpt.exists() and out_net.exists()

    # --run-config reproducibility dump (same surface as the pipeline CLIs)
    import json

    dumped = json.loads(run_config.read_text())
    assert dumped["batch_size"] == 4 and dumped["pl_weight"] == 2.0

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


def _image_dir(tmp_path, count=10, side=8):
    data = tmp_path / "imgs"
    data.mkdir()
    rng = np.random.RandomState(1)
    for i in range(count):
        write_image((rng.rand(side, side, 3) * 255).astype(np.uint8), data / f"{i:03d}.png")
    return data


def test_streaming_dataset_resume_replays_identical_batches(tmp_path):
    """A mid-run resume must see exactly the batches an uninterrupted run sees."""
    from gance_tpu.parallel.data import StreamingImageDataset

    data = _image_dir(tmp_path)
    ds = StreamingImageDataset(data, resolution=8, seed=7)
    continuous = {step: batch for step, batch in ds.batches(0, 6, batch_size=3)}

    resumed = StreamingImageDataset(data, resolution=8, seed=7)
    first = dict(resumed.batches(0, 3, batch_size=3))
    second = dict(resumed.batches(3, 6, batch_size=3))  # resume mid-"epoch"
    assert sorted({**first, **second}) == sorted(continuous)
    for step, batch in continuous.items():
        got = first[step] if step in first else second[step]
        np.testing.assert_array_equal(got, batch)
        assert batch.shape == (3, 8, 8, 3)
        assert batch.min() >= -1.0 and batch.max() <= 1.0


def test_streaming_dataset_host_sharding(tmp_path):
    """Hosts get disjoint, covering file shards."""
    from gance_tpu.parallel.data import StreamingImageDataset, list_image_paths

    data = _image_dir(tmp_path, count=9)
    all_paths = list_image_paths(data)
    shard0 = StreamingImageDataset(data, 8, host_index=0, host_count=2).paths
    shard1 = StreamingImageDataset(data, 8, host_index=1, host_count=2).paths
    assert not set(shard0) & set(shard1)
    assert sorted(shard0 + shard1) == all_paths
    assert len(shard0) == 5 and len(shard1) == 4


def test_streaming_dataset_constant_memory(tmp_path):
    """The loader holds at most cache+prefetch images, not the whole folder."""
    from gance_tpu.parallel.data import StreamingImageDataset

    data = _image_dir(tmp_path, count=20)
    ds = StreamingImageDataset(data, resolution=8, cache_images=4)
    seen = [step for step, _ in ds.batches(0, 10, batch_size=2)]
    assert seen == list(range(10))
    # the decode cache is bounded at the configured capacity
    assert ds._load_cached.cache_info().currsize <= 4


def test_train_cli_scan_segment(tmp_path):
    """--scan-segment > 1 drives the scanned loop through the CLI: checkpoints
    land on boundaries and the exported network loads."""
    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.RandomState(1)
    for i in range(6):
        write_image((rng.rand(16, 16, 3) * 255).astype(np.uint8), data / f"{i}.png")

    ckpt = tmp_path / "ckpt_scan.pkl"
    out_net = tmp_path / "trained_scan.pkl"
    result = CliRunner().invoke(cli, [
        "--dataset-directory", str(data),
        "--resolution", "16",
        "--batch-size", "4",
        "--fmap-base", "256",
        "--fmap-max", "32",
        "--latent-size", "32",
        "--checkpoint-path", str(ckpt),
        "--checkpoint-every", "4",
        "--total-steps", "6",   # one full 2-segment block x2 + a tail of 2
        "--scan-segment", "2",
        "--output-network", str(out_net),
    ], catch_exceptions=False)
    assert result.exit_code == 0

    from gance_tpu.parallel.training import load_checkpoint
    from gance_tpu.synthesis.runtime import SynthesisNetwork

    assert int(load_checkpoint(ckpt).step) == 6
    net = SynthesisNetwork.from_pkl(out_net)
    image = net.images_from_vectors(np.zeros((1, 32), np.float32))
    assert image.shape == (1, 16, 16, 3)


def test_train_cli_metrics_every_writes_quality_curve(tmp_path):
    """--metrics-every evaluates the EMA generator at checkpoint boundaries and
    appends finite PPL/Fréchet records to the JSONL sidecar."""
    import json
    import math

    data = _image_dir(tmp_path, count=6, side=16)
    ckpt = tmp_path / "ckpt_metrics.pkl"
    out_net = tmp_path / "trained_metrics.pkl"
    result = CliRunner().invoke(cli, [
        "--dataset-directory", str(data),
        "--resolution", "16",
        "--batch-size", "4",
        "--fmap-base", "256",
        "--fmap-max", "32",
        "--latent-size", "32",
        "--checkpoint-path", str(ckpt),
        "--checkpoint-every", "2",
        "--total-steps", "4",
        "--metrics-every", "2",
        "--metrics-samples", "4",
        "--output-network", str(out_net),
    ], catch_exceptions=False)
    assert result.exit_code == 0

    metrics_file = ckpt.with_name(ckpt.name + ".metrics.jsonl")
    records = [json.loads(line) for line in metrics_file.read_text().splitlines()]
    assert [r["step"] for r in records] == [2, 4]
    for record in records:
        assert math.isfinite(record["ppl_w_full"])
        assert math.isfinite(record["frechet_feature_distance"])
        assert record["num_samples"] == 4


def test_train_cli_metrics_rejected_multi_host():
    """--metrics-every + --dist-* is a UsageError (single-process-only eval)."""
    result = CliRunner().invoke(cli, [
        "--dataset-directory", ".",
        "--checkpoint-path", "x.pkl",
        "--output-network", "y.pkl",
        "--metrics-every", "2",
        "--dist-coordinator", "localhost:9999",
        "--dist-num-processes", "2",
        "--dist-process-id", "0",
    ])
    assert result.exit_code != 0
    assert "single-process-only" in result.output


def test_batches_abandoned_consumer_releases_prefetch_thread(tmp_path):
    """Breaking out of batches() early must stop the producer thread (review
    finding: it previously blocked forever in put() on the bounded queue,
    leaking the thread and the decoded batches it held)."""
    import threading
    import time

    from gance_tpu.parallel.data import StreamingImageDataset

    data = _image_dir(tmp_path, count=6)
    ds = StreamingImageDataset(data, resolution=8, cache_images=4)
    gen = ds.batches(0, 100000, batch_size=2, prefetch=1)
    next(gen)
    gen.close()  # GeneratorExit -> finally: stop, drain, join

    deadline = time.time() + 5
    while time.time() < deadline and any(
        t.name == "dataset-prefetch" and t.is_alive() for t in threading.enumerate()
    ):
        time.sleep(0.05)
    assert not any(
        t.name == "dataset-prefetch" and t.is_alive() for t in threading.enumerate()
    )
