"""
Dynamic request batching for online synthesis serving.

The TPU serves one COMPILED program per batch shape, and the measured
throughput curve is steeply batch-dependent (bench.py: batch 1 latency-bound,
batch 48 = 221 f/s at 1024px bf16). An online server therefore must not
synthesize per request: this module coalesces concurrent requests into device
batches, pads them to a small fixed set of bucket shapes (multiples of 8 —
batch rides the 8-wide sublane axis, so off-multiples pad up in hardware
anyway; log2 buckets bound wasted FLOPs at <2x while keeping the compile-cache
small, the same rule as runtime._bucket_size), and overlaps device compute
with host egress through a bounded fetch queue (dispatch thread issues async
device calls; fetch thread pulls results — the disk-tee/encoder pattern from
media/video.py applied to serving).

No reference counterpart: esologic/GANce has no online serving story (its
CLIs are offline renders). This is net-new capability in the spirit of
SURVEY.md §6's production-serving north star.
"""

import collections
import os
import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from gance_tpu.utils.logging import LOGGER

# Lane kinds: z vectors (rank 2 input) vs w+ matrices (rank 3). The two kinds
# run different compiled programs (matrices skip mapping + truncation). A
# request's LANE is its kind plus its full per-row shape — a device batch
# never mixes kinds OR row shapes (concatenating mixed w+ row counts would
# blow up mid-dispatch, and each shape is its own compiled program anyway).
LANE_VECTORS = "z"
LANE_MATRICES = "w+"


class _Request:
    """One submitted batch: rows are consumed (possibly across several device
    batches), parts accumulate in row order, the future resolves when all
    rows are done."""

    __slots__ = ("rows", "lane", "future", "parts", "remaining", "arrived")

    def __init__(self, rows: np.ndarray, lane: Tuple) -> None:
        self.rows = rows
        self.lane = lane
        self.future: "Future[np.ndarray]" = Future()
        self.parts: List[np.ndarray] = []
        self.remaining = rows.shape[0]
        self.arrived = time.monotonic()


def bucket_rows(real: int, max_batch: int, multiple: int = 8) -> int:
    """Smallest multiple*2^k >= real, capped at max_batch. Delegates to the
    runtime's bucketing rule (ONE policy for serving and synthesis — the
    compile-cache shapes must agree); `multiple` defaults to the TPU sublane
    width."""
    from gance_tpu.synthesis.runtime import _bucket_size

    return _bucket_size(real, max_batch, multiple=multiple)


def warmup_batch_sizes(max_batch: int, multiple: int = 8) -> List[int]:
    """Every bucket shape `bucket_rows` can produce for this ceiling — the
    set a server must compile so no request shape ever hits a cold jit."""
    sizes: List[int] = []
    size = multiple
    while size < max_batch:
        sizes.append(size)
        size *= 2
    sizes.append(max_batch)
    return sizes


class DynamicBatcher:
    """
    Coalesce concurrent synthesis requests into fixed-shape device batches.

    `network` is anything with the SynthesisNetwork serving surface
    (`device_images_from_vectors` / `device_images_from_matrices` or the
    generic `device_images_generic`, plus `expected_vector_length`).

    :param max_batch: device batch ceiling (48 = the measured v5e sweet spot
        at 1024px; smaller networks tolerate more).
    :param max_delay_ms: linger — how long the dispatcher waits for more rows
        once it has at least one (the latency the first request donates to
        throughput). 0 dispatches immediately.
    :param queue_depth: bound on device batches in flight between dispatch
        and fetch (backpressure; 2 suffices to overlap compute with egress).
    :param pad_multiple: bucket granularity (8 = TPU sublane width).
    """

    def __init__(
        self,
        network: Any,
        max_batch: int = 48,
        max_delay_ms: float = 5.0,
        queue_depth: int = 2,
        pad_multiple: int = 8,
    ) -> None:
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        # One batcher can serve SEVERAL resident networks (a list/tuple): each
        # request addresses one via submit(..., network_index=i) and the lane
        # carries the index, so a device batch never mixes networks. Same-
        # config networks share the module-level jit cache (params are traced
        # arguments), so N networks cost zero extra compiles.
        self.networks: List[Any] = (
            list(network) if isinstance(network, (list, tuple)) else [network]
        )
        if not self.networks:
            raise ValueError("at least one network required")
        self.network = self.networks[0]  # single-network callers' surface
        self.max_batch = int(max_batch)
        self.max_delay = max(0.0, float(max_delay_ms)) / 1000.0
        self.pad_multiple = max(1, int(pad_multiple))
        self._pending: "collections.deque[_Request]" = collections.deque()
        self._lock = threading.Condition()
        # Serializes DEVICE-op issuance: the dispatch thread holds it around
        # each device call, and run_exclusive() lets admin work (hot network
        # loads, which issue their own device_puts) interleave between
        # batches without ever reordering device programs — load-bearing in
        # multi-host serving, where cross-process program order is the
        # correctness invariant (multihost.py).
        self._device_lock = threading.Lock()
        self._closed = False
        # Every request whose future has not resolved yet (pending OR
        # in-flight) — close() fails these so no caller blocks forever.
        self._live: "set[_Request]" = set()
        self._fetch_queue: "queue.Queue" = queue.Queue(maxsize=max(1, queue_depth))
        # per-network unresolved-request counts (under _lock): retire waits
        # on these so a slot is never freed under an in-flight lane
        self._net_live: List[int] = [0] * len(self.networks)
        # stats (under _stats_lock; read by /stats)
        self._stats_lock = threading.Lock()
        self._stat = {
            "requests": 0,
            "frames": 0,
            "batches": 0,
            "dispatched_rows": 0,  # includes bucket padding
            "errors": 0,
        }
        self._latencies: "collections.deque[float]" = collections.deque(maxlen=512)
        self._net_frames = [0] * len(self.networks)
        self._dispatch_thread = threading.Thread(
            target=self._dispatch_loop, name="batcher-dispatch", daemon=True
        )
        self._fetch_thread = threading.Thread(
            target=self._fetch_loop, name="batcher-fetch", daemon=True
        )
        self._dispatch_thread.start()
        self._fetch_thread.start()

    # ---- public surface ----

    def submit(
        self, batch: np.ndarray, network_index: int = 0
    ) -> "Future[np.ndarray]":
        """
        Enqueue a (B, V) z batch or (B, R, V) w+ batch for network
        ``network_index``; the future resolves to the (B, H, W, 3) uint8
        images in row order. Raises ValueError on shape problems immediately
        (fail fast at the edge, not on the device).
        """
        if not 0 <= network_index < len(self.networks):
            raise ValueError(
                f"network_index {network_index} out of range "
                f"(serving {len(self.networks)} networks)"
            )
        rows = np.asarray(batch, np.float32)
        if rows.ndim == 2:
            lane = (int(network_index), LANE_VECTORS) + rows.shape[1:]
        elif rows.ndim == 3:
            lane = (int(network_index), LANE_MATRICES) + rows.shape[1:]
        else:
            raise ValueError(
                f"batch must be (B, V) vectors or (B, R, V) matrices, got "
                f"shape {rows.shape}"
            )
        expected = getattr(
            self.networks[network_index], "expected_vector_length", None
        )
        if expected is not None and rows.shape[-1] != expected:
            raise ValueError(
                f"latent length {rows.shape[-1]} != network's {expected}"
            )
        if rows.shape[0] == 0:
            raise ValueError("empty batch")
        request = _Request(rows, lane)
        with self._lock:
            if self._closed:
                raise RuntimeError("batcher is closed")
            # Checked under the SAME lock retire_network frees slots under:
            # outside it, a request could slip into the queue for a slot
            # retired between check and append and dispatch against None.
            if self.networks[network_index] is None:
                raise ValueError(f"network {network_index} has been unloaded")
            self._pending.append(request)
            self._live.add(request)
            self._net_live[lane[0]] += 1
            self._lock.notify_all()
        with self._stats_lock:
            self._stat["requests"] += 1
        return request.future

    def stats(self) -> Dict[str, Any]:
        with self._stats_lock:
            out = dict(self._stat)
            latencies = sorted(self._latencies)
            if len(self.networks) > 1:
                out["frames_by_network"] = list(self._net_frames)
        out["max_batch"] = self.max_batch
        out["occupancy"] = (
            out["frames"] / out["dispatched_rows"] if out["dispatched_rows"] else None
        )
        if latencies:
            out["latency_p50_ms"] = round(latencies[len(latencies) // 2] * 1e3, 2)
            out["latency_p99_ms"] = round(
                latencies[min(len(latencies) - 1, int(len(latencies) * 0.99))] * 1e3, 2
            )
        return out

    def add_network(self, network: Any) -> int:
        """Hot-add a resident network and return its index. Existing indices
        stay stable (clients address networks by index or name), so this is
        append-only; reuse of retired slots is deliberately NOT done."""
        if network is None:
            raise ValueError("network must not be None")
        with self._lock:
            if self._closed:
                raise RuntimeError("batcher is closed")
            self.networks.append(network)
            self._net_live.append(0)
            index = len(self.networks) - 1
        with self._stats_lock:
            self._net_frames.append(0)
        return index

    def retire_network(self, network_index: int, timeout_s: float = 600.0) -> bool:
        """
        Free a resident network's slot once its last request resolves.
        Callers must stop routing NEW requests to the index first (the daemon
        marks it retired at the HTTP edge); this waits for the in-flight
        count to reach zero, then drops the reference (device memory frees
        with it). Returns False on timeout (slot left intact). Idempotent.
        """
        deadline = time.monotonic() + timeout_s
        with self._lock:
            if not 0 <= network_index < len(self.networks):
                raise ValueError(f"network_index {network_index} out of range")
            if network_index == 0:
                raise ValueError(
                    "network 0 is the daemon's identity (healthz surface); "
                    "retire is for hot-swapped additions"
                )
            while self._net_live[network_index] > 0:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    return False
                self._lock.wait(timeout=remaining)
            self.networks[network_index] = None
        return True

    def run_exclusive(self, fn):
        """Run `fn` while no device batch is being issued (the dispatch
        thread holds the same lock around each device call). Admin work that
        issues its own device ops — hot network loads' device_puts — must go
        through here so device-program order stays single-threaded, the
        invariant multi-host serving depends on."""
        with self._device_lock:
            return fn()

    def live_requests(self) -> int:
        """Requests whose futures have not resolved yet (pending + in-flight)."""
        with self._lock:
            return len(self._live)

    def wait_idle(self, timeout_s: Optional[float] = None) -> bool:
        """
        Block until every submitted request has resolved (the drain half of a
        graceful shutdown — callers stop submitting first). Returns False if
        the timeout expires with work still live.
        """
        deadline = None if timeout_s is None else time.monotonic() + timeout_s
        while self.live_requests():
            if deadline is not None and time.monotonic() >= deadline:
                return False
            time.sleep(0.05)
        return True

    def close(self) -> None:
        """Drain-free shutdown: pending/in-flight requests fail loudly.

        If a thread is wedged inside a device call past the join timeout, the
        LIVE set still fails every unresolved future so no caller blocks
        forever on `.result()` (the daemon additionally bounds waits with a
        request timeout); the wedged thread's late completion is a no-op
        (`_finish` tolerates already-resolved futures)."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
            self._lock.notify_all()
        self._dispatch_thread.join(timeout=30)
        try:
            # Sentinel after dispatch stops producing. If the queue is full
            # (fetch thread wedged in a device fetch), skip it — the timed
            # join below and the live-set sweep still guarantee shutdown.
            self._fetch_queue.put_nowait(None)
        except queue.Full:
            pass
        self._fetch_thread.join(timeout=30)
        with self._lock:
            self._pending.clear()
            live = list(self._live)
        for request in live:
            self._finish(request, error=RuntimeError("batcher closed"))

    def _finish(
        self,
        request: _Request,
        result: Optional[np.ndarray] = None,
        error: Optional[BaseException] = None,
    ) -> None:
        """Resolve a request's future exactly once and drop it from the live
        set; tolerates races with close() (already-resolved futures)."""
        with self._lock:
            self._drop_live_locked(request)
        if request.future.done():
            return
        try:
            if error is not None:
                request.future.set_exception(error)
            else:
                request.future.set_result(result)
        except Exception:  # pylint: disable=broad-except
            pass  # lost the race to close(); the future already resolved

    def __enter__(self) -> "DynamicBatcher":
        return self

    def __exit__(self, *_exc) -> None:
        self.close()

    # ---- internals ----

    def _drop_live_locked(self, request: _Request) -> None:
        """Remove a request from the live set exactly once (idempotent) and
        keep the per-network live counts retire_network waits on accurate."""
        if request in self._live:
            self._live.remove(request)
            self._net_live[request.lane[0]] -= 1
            self._lock.notify_all()

    def _take_batch(self) -> Optional[List[Tuple[_Request, int, np.ndarray]]]:
        """Under the lock: wait for work, apply the linger, then consume up to
        max_batch rows of ONE lane from the queue front. Returns
        [(request, rows_consumed, row_slice)] or None on close."""
        with self._lock:
            while not self._closed:
                # Drop requests whose future already resolved (a dispatch
                # failure on an earlier slice of a split request, or a caller
                # cancel): their remaining rows must not burn device batches.
                while self._pending and self._pending[0].future.done():
                    dead = self._pending.popleft()
                    self._drop_live_locked(dead)
                if self._pending:
                    break
                self._lock.wait()
            if self._closed:
                return None
            if self.max_delay:
                # Linger: give concurrent callers max_delay to coalesce, but
                # stop early once a full batch is queued.
                deadline = time.monotonic() + self.max_delay
                while time.monotonic() < deadline and not self._closed:
                    lane = self._pending[0].lane
                    queued = sum(
                        r.rows.shape[0] for r in self._pending if r.lane == lane
                    )
                    if queued >= self.max_batch:
                        break
                    self._lock.wait(timeout=deadline - time.monotonic())
                if self._closed:
                    return None
            lane: Optional[Tuple] = None  # set by the first LIVE request
            consumed: List[Tuple[_Request, int, np.ndarray]] = []
            total = 0
            while self._pending and total < self.max_batch:
                head = self._pending[0]
                if head.future.done():  # failed/cancelled: skip its rows
                    self._pending.popleft()
                    self._drop_live_locked(head)
                    continue
                if lane is None:
                    lane = head.lane
                elif head.lane != lane:
                    break  # different program; next dispatch takes it
                take = min(head.rows.shape[0], self.max_batch - total)
                consumed.append((head, take, head.rows[:take]))
                total += take
                if take == head.rows.shape[0]:
                    self._pending.popleft()
                else:
                    # Partial consume: the tail stays queued for the next
                    # dispatch; `remaining` (rows not yet fetched) is
                    # decremented by the fetch thread.
                    head.rows = head.rows[take:]
                    break
            return consumed

    def _network_fn(self, lane: Tuple):
        """Resolve the device entry point for a lane (network index + kind);
        networks exposing only the generic surface (rank-dispatching) work
        too."""
        network = self.networks[lane[0]]
        name = (
            "device_images_from_vectors"
            if lane[1] == LANE_VECTORS
            else "device_images_from_matrices"
        )
        fn = getattr(network, name, None)
        if fn is None:
            fn = network.device_images_generic
        return fn

    def _dispatch_loop(self) -> None:
        while True:
            consumed = self._take_batch()
            if consumed is None:
                return
            if not consumed:  # only dead requests were queued
                continue
            lane = consumed[0][0].lane
            rows = np.concatenate([slice_ for _req, _take, slice_ in consumed])
            real = rows.shape[0]
            bucket = bucket_rows(real, self.max_batch, self.pad_multiple)
            if bucket > real:
                pad = np.zeros((bucket - real,) + rows.shape[1:], rows.dtype)
                rows = np.concatenate([rows, pad])
            try:
                with self._device_lock:
                    device_images = self._network_fn(lane)(rows)
            except Exception as error:  # pylint: disable=broad-except
                LOGGER.exception("serving dispatch failed")
                with self._stats_lock:
                    self._stat["errors"] += 1
                for request, _take, _slice in consumed:
                    self._finish(request, error=error)
                continue
            with self._stats_lock:
                self._stat["batches"] += 1
                self._stat["frames"] += real
                self._stat["dispatched_rows"] += bucket
                self._net_frames[lane[0]] += real
            meta = [(request, take) for request, take, _slice in consumed]
            while True:
                try:
                    # Bounded put = backpressure, but never a permanent wedge:
                    # re-check closed so a dead fetch thread can't strand us.
                    self._fetch_queue.put((device_images, meta, real), timeout=1.0)
                    break
                except queue.Full:
                    if self._closed:
                        for request, _take in meta:
                            self._finish(
                                request, error=RuntimeError("batcher closed")
                            )
                        return

    def _fetch_loop(self) -> None:
        from gance_tpu.parallel.mesh import fetch_to_host

        while True:
            item = self._fetch_queue.get()
            if item is None:
                return
            device_images, consumed, real = item
            try:
                host = fetch_to_host(device_images)[:real]
            except Exception as error:  # pylint: disable=broad-except
                LOGGER.exception("serving fetch failed")
                with self._stats_lock:
                    self._stat["errors"] += 1
                for request, _take in consumed:
                    self._finish(request, error=error)
                continue
            offset = 0
            for request, take in consumed:
                if request.future.done():
                    # Earlier slice failed, or the caller cancelled while the
                    # batch was in flight: drop the rows AND the live-set
                    # entry (idempotent) — otherwise a cancelled-in-flight
                    # request counts as live forever and wait_idle/retire
                    # never drain.
                    with self._lock:
                        self._drop_live_locked(request)
                    offset += take
                    continue
                request.parts.append(host[offset : offset + take])
                offset += take
                request.remaining -= take
                if request.remaining == 0:
                    result = (
                        request.parts[0]
                        if len(request.parts) == 1
                        else np.concatenate(request.parts)
                    )
                    with self._stats_lock:
                        self._latencies.append(time.monotonic() - request.arrived)
                    self._finish(request, result=result)


def default_max_batch() -> int:
    """GANCE_TPU_SERVE_BATCH or the measured 1024px v5e sweet spot (48)."""
    return int(os.environ.get("GANCE_TPU_SERVE_BATCH", "48"))
