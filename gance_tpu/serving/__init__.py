"""
Online synthesis serving: dynamic request batching onto fixed-shape compiled
programs (batcher.py) + a stdlib HTTP daemon (daemon.py) + the multi-host
control channel that runs that daemon over a process-spanning mesh
(multihost.py). Net-new vs the reference (esologic/GANce is offline CLIs
only) — the production-serving leg of SURVEY.md §6's north star.
"""

from gance_tpu.serving.audio import (
    AudioRequestError,
    plan_audio_request,
    synthesize_plan,
)
from gance_tpu.serving.batcher import DynamicBatcher, bucket_rows, default_max_batch
from gance_tpu.serving.client import ServingClient, ServingClientError
from gance_tpu.serving.daemon import SynthesisDaemon
from gance_tpu.serving.multihost import (
    ControlCoordinator,
    ControlWorker,
    MultiHostNetwork,
    MultiHostServingError,
    run_worker,
    wrap_networks_for_multihost,
)

__all__ = [
    "AudioRequestError",
    "ControlCoordinator",
    "ControlWorker",
    "plan_audio_request",
    "synthesize_plan",
    "DynamicBatcher",
    "MultiHostNetwork",
    "MultiHostServingError",
    "ServingClient",
    "ServingClientError",
    "SynthesisDaemon",
    "bucket_rows",
    "default_max_batch",
    "run_worker",
    "wrap_networks_for_multihost",
]
