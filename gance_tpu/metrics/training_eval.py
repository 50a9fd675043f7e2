"""
Periodic network-quality evaluation during training.

The NVlabs fork the reference submodules runs metrics alongside training
(upstream `run_metrics.py` / the `--metrics` train flag; SURVEY §2.9 — the
fork's training is the one capability GANce itself never drives). Here the
equivalent is first-class: `train.py --metrics-every N` evaluates the EMA
generator's PPL and Fréchet feature distance against the training set at
checkpoint boundaries and appends one JSON line per evaluation to a sidecar
JSONL, so a training run produces its own quality curve.

Both metrics run over the pluggable perceptual features (projection/lpips.py):
the NVlabs `vgg16_zhang_perceptual.pkl` when the user brings it, the
deterministic random-VGG fallback otherwise — values are comparable only
within one metric configuration, which is exactly what a training curve needs.
"""

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from gance_tpu.models.stylegan2 import GeneratorConfig
from gance_tpu.utils.logging import LOGGER


def evaluate_training_metrics(
    ema_params: Dict[str, Any],
    model_config: GeneratorConfig,
    perceptual_params: Dict[str, Any],
    dataset_directory: Path,
    step: int,
    num_samples: int = 64,
    batch_size: int = 8,
    seed: int = 0,
) -> Dict[str, Any]:
    """
    One evaluation of the (host-resident) EMA generator: PPL (w/full, the
    headline NVlabs configuration) + Fréchet feature distance vs the training
    images. Returns the JSONL record (finite floats; provenance included).

    `num_samples` bounds BOTH metrics' sample counts — training-time evals
    favor cheap, comparable-across-steps numbers over publication precision.
    """
    from gance_tpu.metrics.frechet import frechet_distance_network_vs_images
    from gance_tpu.metrics.ppl import perceptual_path_length

    started = time.monotonic()
    ppl = perceptual_path_length(
        ema_params,
        model_config,
        perceptual_params,
        num_samples=num_samples,
        batch_size=batch_size,
        space="w",
        sampling="full",
        seed=seed,
    )
    frechet = frechet_distance_network_vs_images(
        ema_params,
        model_config,
        perceptual_params,
        Path(dataset_directory),
        num_samples=num_samples,
        batch_size=batch_size,
        seed=seed,
    )
    record = {
        "step": int(step),
        "ppl_w_full": float(ppl.ppl),
        "frechet_feature_distance": float(frechet["distance"]),
        "num_samples": int(num_samples),
        "feature_dim": int(frechet["feature_dim"]),
        "eval_seconds": round(time.monotonic() - started, 3),
    }
    LOGGER.info(
        "metrics @ step %d: ppl=%.4g frechet=%.4g (%.1fs)",
        record["step"],
        record["ppl_w_full"],
        record["frechet_feature_distance"],
        record["eval_seconds"],
    )
    return record


def append_metrics_record(path: Optional[Path], record: Dict[str, Any]) -> None:
    """Append one JSON line (parent dirs created; numpy scalars coerced)."""
    if path is None:
        return
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    clean = {
        key: (value.item() if isinstance(value, np.generic) else value)
        for key, value in record.items()
    }
    with path.open("a", encoding="utf-8") as handle:
        handle.write(json.dumps(clean) + "\n")
