"""
Online synthesis HTTP daemon over the dynamic batcher.

A small stdlib server (no web-framework dependency on this host class) that
exposes a loaded generator for production serving:

  GET  /healthz      -> {"ok": true, "resolution": R, "vector_length": V, ...}
  GET  /stats        -> batcher counters (batches, occupancy, latency p50/p99)
  POST /synthesize   -> images for a JSON request body:
      {"latents":  [[...], ...]}             z vectors (B, V)
      {"dlatents": [[[...], ...], ...]}      w+ matrices (B, R, V) — skip
                                             mapping/truncation, projection
                                             latents are final
      {"seeds": [0, 1, ...]}                 server-side N(0,1) z per seed
      {"count": N, "seed": S}                N z rows from one RandomState
      optional "format": "npy" (default; one (B, H, W, 3) uint8 np.save blob,
      shape echoed in X-Gance-Shape) or "png" (exactly one image).

Concurrency model: ThreadingHTTPServer gives one thread per connection; every
handler submits to the shared DynamicBatcher and blocks on its future, so
concurrent requests COALESCE into fixed-shape device batches (the whole point
— see batcher.py). The device work itself is serialized by the batcher's
single dispatch thread; no jit cache races.

No reference counterpart (the reference is offline CLIs only) — net-new
serving capability.
"""

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional, Tuple

import numpy as np

from gance_tpu.serving.batcher import DynamicBatcher
from gance_tpu.utils.logging import LOGGER

MAX_BODY_BYTES = 256 * 1024 * 1024  # latents are small; refuse absurd bodies
MAX_FRAMES_PER_REQUEST = 4096


class ServingError(ValueError):
    """Client-side request problem -> HTTP 400."""


def _rows_from_request(payload: Dict[str, Any], vector_length: int) -> np.ndarray:
    """Resolve the request body to a float32 batch (validated shapes)."""
    sources = [k for k in ("latents", "dlatents", "seeds", "count") if k in payload]
    if len(sources) != 1:
        raise ServingError(
            "provide exactly one of 'latents', 'dlatents', 'seeds', 'count' "
            f"(got {sources or 'none'})"
        )
    key = sources[0]
    if key == "latents":
        rows = np.asarray(payload["latents"], np.float32)
        if rows.ndim == 1:
            rows = rows[None, :]
        if rows.ndim != 2 or rows.shape[1] != vector_length:
            raise ServingError(
                f"'latents' must be (B, {vector_length}), got {rows.shape}"
            )
    elif key == "dlatents":
        rows = np.asarray(payload["dlatents"], np.float32)
        if rows.ndim == 2:
            rows = rows[None, ...]
        if rows.ndim != 3 or rows.shape[2] != vector_length:
            raise ServingError(
                f"'dlatents' must be (B, rows, {vector_length}), got {rows.shape}"
            )
    elif key == "seeds":
        seeds = payload["seeds"]
        if not isinstance(seeds, list) or not seeds:
            raise ServingError("'seeds' must be a non-empty list of integers")
        rows = np.stack(
            [
                np.random.RandomState(int(seed)).randn(vector_length)
                for seed in seeds
            ]
        ).astype(np.float32)
    else:  # count
        count = int(payload["count"])
        if count < 1:
            raise ServingError("'count' must be >= 1")
        rng = np.random.RandomState(int(payload.get("seed", 0)))
        rows = rng.randn(count, vector_length).astype(np.float32)
    if rows.shape[0] > MAX_FRAMES_PER_REQUEST:
        raise ServingError(
            f"request of {rows.shape[0]} frames exceeds the per-request cap "
            f"of {MAX_FRAMES_PER_REQUEST}"
        )
    return rows


def _encode_images(images: np.ndarray, fmt: str) -> Tuple[bytes, str]:
    """(B, H, W, 3) uint8 -> (body, content_type)."""
    if fmt == "npy":
        buffer = io.BytesIO()
        np.save(buffer, images)
        return buffer.getvalue(), "application/octet-stream"
    if fmt == "png":
        if images.shape[0] != 1:
            raise ServingError("'format': 'png' requires exactly one image")
        import cv2

        ok, encoded = cv2.imencode(".png", cv2.cvtColor(images[0], cv2.COLOR_RGB2BGR))
        if not ok:
            raise RuntimeError("PNG encode failed")
        return encoded.tobytes(), "image/png"
    raise ServingError(f"unknown format {fmt!r} (expected 'npy' or 'png')")


class SynthesisDaemon:
    """
    Own a network + batcher + HTTP server. `network` is any SynthesisNetwork-
    shaped object (including FakeSynthesisNetwork in tests). Port 0 binds an
    ephemeral port (read `.port` after construction).
    """

    def __init__(
        self,
        network: Any,
        host: str = "127.0.0.1",
        port: int = 8799,
        max_batch: int = 48,
        max_delay_ms: float = 5.0,
    ) -> None:
        self.network = network
        self.batcher = DynamicBatcher(
            network, max_batch=max_batch, max_delay_ms=max_delay_ms
        )
        daemon = self

        class Handler(BaseHTTPRequestHandler):
            # stdlib logs every request to stderr by default; route to LOGGER
            def log_message(self, fmt: str, *args: Any) -> None:
                LOGGER.debug("serving: " + fmt, *args)

            def _reply(
                self, status: int, body: bytes, content_type: str,
                extra: Optional[Dict[str, str]] = None,
            ) -> None:
                self.send_response(status)
                self.send_header("Content-Type", content_type)
                self.send_header("Content-Length", str(len(body)))
                for key, value in (extra or {}).items():
                    self.send_header(key, value)
                self.end_headers()
                self.wfile.write(body)

            def _reply_json(self, status: int, payload: Dict[str, Any]) -> None:
                self._reply(
                    status, json.dumps(payload).encode(), "application/json"
                )

            def do_GET(self) -> None:  # noqa: N802 (stdlib API)
                if self.path == "/healthz":
                    self._reply_json(200, daemon.health())
                elif self.path == "/stats":
                    self._reply_json(200, daemon.batcher.stats())
                else:
                    self._reply_json(404, {"error": f"no route {self.path}"})

            def do_POST(self) -> None:  # noqa: N802
                if self.path != "/synthesize":
                    self._reply_json(404, {"error": f"no route {self.path}"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                    if length <= 0 or length > MAX_BODY_BYTES:
                        raise ServingError("missing or oversized request body")
                    payload = json.loads(self.rfile.read(length))
                    rows = _rows_from_request(
                        payload, daemon.network.expected_vector_length
                    )
                    images = daemon.batcher.submit(rows).result()
                    body, content_type = _encode_images(
                        images, payload.get("format", "npy")
                    )
                except (ServingError, ValueError, json.JSONDecodeError) as error:
                    self._reply_json(400, {"error": str(error)})
                    return
                except Exception as error:  # pylint: disable=broad-except
                    LOGGER.exception("serving request failed")
                    self._reply_json(500, {"error": str(error)})
                    return
                self._reply(
                    200, body, content_type,
                    extra={"X-Gance-Shape": "x".join(map(str, images.shape))},
                )

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="serving-http", daemon=True
        )

    def health(self) -> Dict[str, Any]:
        import gance_tpu

        return {
            "ok": True,
            "version": gance_tpu.__version__,
            "vector_length": int(self.network.expected_vector_length),
            "resolution": int(getattr(self.network, "resolution", 0)),
        }

    def start(self) -> "SynthesisDaemon":
        self._thread.start()
        LOGGER.info("synthesis daemon listening on port %d", self.port)
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=30)
        self.batcher.close()

    def __enter__(self) -> "SynthesisDaemon":
        return self.start()

    def __exit__(self, *_exc) -> None:
        self.stop()
