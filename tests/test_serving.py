"""
Online serving (gance_tpu/serving/): dynamic batcher coalescing/splitting/
correctness, HTTP daemon endpoint contract, and the CLI. Net-new vs the
reference (offline CLIs only) — tested like the media boundary: correctness
first, concurrency edge cases explicitly.
"""

import io
import json
import threading
import urllib.error
import urllib.request
from pathlib import Path

import numpy as np
import pytest

from gance_tpu.serving import DynamicBatcher, SynthesisDaemon, bucket_rows
from gance_tpu.synthesis.runtime import FakeSynthesisNetwork


class _CountingFake(FakeSynthesisNetwork):
    """Fake that records every device batch shape it is asked to render."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.device_batches = []
        self._lock = threading.Lock()

    def device_images_from_vectors(self, z_batch):
        with self._lock:
            self.device_batches.append(("z", np.asarray(z_batch).shape))
        return self._render(np.asarray(z_batch))

    def device_images_from_matrices(self, dlatent_batch):
        with self._lock:
            self.device_batches.append(("w+", np.asarray(dlatent_batch).shape))
        # rows-identical invariant: render from row 0
        return self._render(np.asarray(dlatent_batch)[:, 0, :])


def test_bucket_rows():
    assert bucket_rows(1, 48) == 8
    assert bucket_rows(8, 48) == 8
    assert bucket_rows(9, 48) == 16
    assert bucket_rows(17, 48) == 32
    assert bucket_rows(33, 48) == 48
    assert bucket_rows(100, 48) == 48
    assert bucket_rows(3, 48, multiple=1) == 4
    # one policy: serving's buckets ARE the runtime's buckets
    from gance_tpu.synthesis.runtime import _bucket_size

    for real in range(1, 100):
        assert bucket_rows(real, 48) == _bucket_size(real, 48, multiple=8)


def test_warmup_batch_sizes_cover_every_bucket():
    from gance_tpu.serving.batcher import warmup_batch_sizes

    sizes = warmup_batch_sizes(48)
    assert sizes == [8, 16, 32, 48]
    # every reachable bucket is in the warm set
    for real in range(1, 49):
        assert bucket_rows(real, 48) in sizes
    assert warmup_batch_sizes(8) == [8]


def test_batcher_matches_direct_synthesis():
    fake = _CountingFake(resolution=16, expected_vector_length=32)
    rows = np.random.RandomState(0).randn(5, 32).astype(np.float32)
    with DynamicBatcher(fake, max_batch=8, max_delay_ms=0) as batcher:
        got = batcher.submit(rows).result(timeout=30)
    np.testing.assert_array_equal(got, fake.images_from_vectors(rows))
    # padded to the bucket (8), sliced back to 5
    assert got.shape[0] == 5
    assert fake.device_batches[0] == ("z", (8, 32))


def test_batcher_coalesces_concurrent_requests():
    fake = _CountingFake(resolution=16, expected_vector_length=32)
    rng = np.random.RandomState(1)
    batches = [rng.randn(2, 32).astype(np.float32) for _ in range(3)]
    # generous linger so all three submissions land in one device batch
    with DynamicBatcher(fake, max_batch=16, max_delay_ms=250) as batcher:
        futures = [batcher.submit(b) for b in batches]
        results = [f.result(timeout=30) for f in futures]
    for batch, result in zip(batches, results):
        np.testing.assert_array_equal(result, fake.images_from_vectors(batch))
    stats_batches = [s for s in fake.device_batches if s[0] == "z"]
    assert len(stats_batches) == 1, fake.device_batches
    assert stats_batches[0][1] == (8, 32)  # 6 rows -> bucket 8


def test_batcher_splits_oversized_request():
    fake = _CountingFake(resolution=16, expected_vector_length=32)
    rows = np.random.RandomState(2).randn(20, 32).astype(np.float32)
    with DynamicBatcher(fake, max_batch=8, max_delay_ms=0) as batcher:
        got = batcher.submit(rows).result(timeout=30)
    np.testing.assert_array_equal(got, fake.images_from_vectors(rows))
    assert [shape[0] for _kind, shape in fake.device_batches] == [8, 8, 8]


def test_batcher_separates_vector_and_matrix_lanes():
    fake = _CountingFake(resolution=16, expected_vector_length=32)
    z = np.random.RandomState(3).randn(2, 32).astype(np.float32)
    w = np.tile(
        np.random.RandomState(4).randn(2, 1, 32).astype(np.float32), (1, 5, 1)
    )
    with DynamicBatcher(fake, max_batch=8, max_delay_ms=100) as batcher:
        fz = batcher.submit(z)
        fw = batcher.submit(w)
        np.testing.assert_array_equal(
            fz.result(timeout=30), fake.images_from_vectors(z)
        )
        np.testing.assert_array_equal(
            fw.result(timeout=30), fake.images_from_matrices(w)
        )
    kinds = [kind for kind, _shape in fake.device_batches]
    assert sorted(kinds) == ["w+", "z"]  # two dispatches, never mixed


def test_batcher_never_mixes_matrix_row_counts():
    """w+ requests with different style-row counts are different programs —
    coalescing them would crash the dispatch concatenate."""
    fake = _CountingFake(resolution=16, expected_vector_length=32)
    w5 = np.random.RandomState(5).randn(2, 5, 32).astype(np.float32)
    w9 = np.random.RandomState(6).randn(2, 9, 32).astype(np.float32)
    with DynamicBatcher(fake, max_batch=8, max_delay_ms=100) as batcher:
        f5 = batcher.submit(w5)
        f9 = batcher.submit(w9)
        assert f5.result(timeout=30).shape[0] == 2
        assert f9.result(timeout=30).shape[0] == 2
    shapes = sorted(shape for kind, shape in fake.device_batches)
    assert shapes == [(8, 5, 32), (8, 9, 32)]  # two dispatches, never mixed


def test_batcher_works_with_generic_only_network():
    """A network exposing only device_images_generic (the documented minimum
    surface — FakeSynthesisNetwork itself) serves both lanes."""
    fake = FakeSynthesisNetwork(resolution=16, expected_vector_length=32)
    z = np.random.RandomState(7).randn(3, 32).astype(np.float32)
    with DynamicBatcher(fake, max_batch=8, max_delay_ms=0) as batcher:
        got = batcher.submit(z).result(timeout=30)
    np.testing.assert_array_equal(got, fake.images_from_vectors(z))


def test_batcher_drops_rows_of_cancelled_requests():
    """A request whose future resolved early (cancel, or a failed earlier
    slice) must not keep burning device batches on its queued rows."""
    fake = _CountingFake(resolution=16, expected_vector_length=32)
    doomed = np.zeros((4, 32), np.float32)
    live = np.random.RandomState(8).randn(2, 32).astype(np.float32)
    with DynamicBatcher(fake, max_batch=8, max_delay_ms=150) as batcher:
        doomed_future = batcher.submit(doomed)
        assert doomed_future.cancel()  # resolved before dispatch
        live_future = batcher.submit(live)
        got = live_future.result(timeout=30)
    np.testing.assert_array_equal(got, fake.images_from_vectors(live))
    # only the live rows were ever dispatched
    assert batcher.stats()["frames"] == 2


def test_batcher_close_fails_pending_futures():
    fake = _CountingFake(resolution=16, expected_vector_length=32)
    batcher = DynamicBatcher(fake, max_batch=8, max_delay_ms=10_000)
    future = batcher.submit(np.zeros((2, 32), np.float32))
    batcher.close()
    with pytest.raises(RuntimeError, match="closed"):
        future.result(timeout=5)


def test_batcher_rejects_bad_shapes_immediately():
    fake = FakeSynthesisNetwork(resolution=16, expected_vector_length=32)
    with DynamicBatcher(fake, max_batch=8, max_delay_ms=0) as batcher:
        with pytest.raises(ValueError, match="latent length"):
            batcher.submit(np.zeros((2, 31), np.float32))
        with pytest.raises(ValueError, match="vectors or"):
            batcher.submit(np.zeros((2, 2, 2, 2), np.float32))
        with pytest.raises(ValueError, match="empty"):
            batcher.submit(np.zeros((0, 32), np.float32))


def test_batcher_propagates_device_errors():
    class _Broken(FakeSynthesisNetwork):
        def device_images_from_vectors(self, z_batch):
            raise RuntimeError("device on fire")

    with DynamicBatcher(
        _Broken(resolution=16, expected_vector_length=32),
        max_batch=8, max_delay_ms=0,
    ) as batcher:
        future = batcher.submit(np.zeros((2, 32), np.float32))
        with pytest.raises(RuntimeError, match="device on fire"):
            future.result(timeout=30)
        assert batcher.stats()["errors"] == 1


def test_batcher_stats_and_close():
    fake = _CountingFake(resolution=16, expected_vector_length=32)
    batcher = DynamicBatcher(fake, max_batch=8, max_delay_ms=0)
    batcher.submit(np.zeros((3, 32), np.float32)).result(timeout=30)
    stats = batcher.stats()
    assert stats["requests"] == 1
    assert stats["frames"] == 3
    assert stats["batches"] == 1
    assert stats["dispatched_rows"] == 8
    assert stats["occupancy"] == pytest.approx(3 / 8)
    assert stats["latency_p50_ms"] >= 0
    batcher.close()
    with pytest.raises(RuntimeError, match="closed"):
        batcher.submit(np.zeros((1, 32), np.float32))


def _post(url: str, payload: dict) -> tuple:
    request = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(request, timeout=60) as response:
        return response.status, response.read(), dict(response.headers)


def _get_json(url: str) -> dict:
    with urllib.request.urlopen(url, timeout=60) as response:
        return json.loads(response.read())


@pytest.fixture(scope="module")
def real_daemon():
    """A daemon over a REAL (tiny) jitted SynthesisNetwork on an ephemeral port."""
    import jax

    from gance_tpu.models.stylegan2 import GeneratorConfig, init_generator_params
    from gance_tpu.synthesis.runtime import SynthesisNetwork

    config = GeneratorConfig(
        resolution=16, fmap_base=256, fmap_max=32, latent_size=64,
        dlatent_size=64, mapping_layers=2, mapping_fmaps=64,
    )
    params = init_generator_params(jax.random.PRNGKey(0), config)
    network = SynthesisNetwork(params=params, config=config)
    with SynthesisDaemon(network, port=0, max_batch=8, max_delay_ms=2) as daemon:
        yield daemon, network


def test_daemon_healthz_and_stats(real_daemon):
    daemon, network = real_daemon
    health = _get_json(f"http://127.0.0.1:{daemon.port}/healthz")
    assert health["ok"] is True
    assert health["vector_length"] == network.expected_vector_length
    assert health["resolution"] == 16
    stats = _get_json(f"http://127.0.0.1:{daemon.port}/stats")
    assert stats["max_batch"] == 8


def test_daemon_synthesize_latents_npy(real_daemon):
    daemon, network = real_daemon
    latents = np.random.RandomState(0).randn(
        3, network.expected_vector_length
    ).astype(np.float32)
    status, body, headers = _post(
        f"http://127.0.0.1:{daemon.port}/synthesize",
        {"latents": latents.tolist()},
    )
    assert status == 200
    images = np.load(io.BytesIO(body))
    assert headers["X-Gance-Shape"] == "x".join(map(str, images.shape))
    np.testing.assert_array_equal(images, network.images_from_vectors(latents))


def test_daemon_synthesize_seeds_and_png(real_daemon):
    daemon, network = real_daemon
    status, body, _ = _post(
        f"http://127.0.0.1:{daemon.port}/synthesize",
        {"seeds": [7], "format": "png"},
    )
    assert status == 200
    import cv2

    decoded = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
    expected = network.images_from_vectors(
        np.random.RandomState(7).randn(1, network.expected_vector_length)
        .astype(np.float32)
    )[0]
    np.testing.assert_array_equal(
        cv2.cvtColor(decoded, cv2.COLOR_BGR2RGB), expected
    )


def test_daemon_synthesize_dlatents(real_daemon):
    daemon, network = real_daemon
    matrix = np.tile(
        np.random.RandomState(1)
        .randn(1, 1, network.expected_vector_length)
        .astype(np.float32),
        (2, network.config.num_style_rows, 1),
    )
    status, body, _ = _post(
        f"http://127.0.0.1:{daemon.port}/synthesize", {"dlatents": matrix.tolist()}
    )
    assert status == 200
    np.testing.assert_array_equal(
        np.load(io.BytesIO(body)), network.images_from_matrices(matrix)
    )


def test_daemon_concurrent_requests_coalesce_and_match(real_daemon):
    daemon, network = real_daemon
    rng = np.random.RandomState(9)
    payloads = [
        rng.randn(2, network.expected_vector_length).astype(np.float32)
        for _ in range(4)
    ]
    results = [None] * len(payloads)

    def worker(index: int) -> None:
        _status, body, _ = _post(
            f"http://127.0.0.1:{daemon.port}/synthesize",
            {"latents": payloads[index].tolist()},
        )
        results[index] = np.load(io.BytesIO(body))

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(len(payloads))
    ]
    for thread in threads:
        thread.start()
    for thread in threads:
        thread.join(timeout=120)
    for payload, result in zip(payloads, results):
        np.testing.assert_array_equal(
            result, network.images_from_vectors(payload)
        )


def test_daemon_error_contract(real_daemon):
    daemon, network = real_daemon
    url = f"http://127.0.0.1:{daemon.port}/synthesize"
    # wrong latent length -> 400 with a JSON error
    with pytest.raises(urllib.error.HTTPError) as info:
        _post(url, {"latents": [[0.0] * (network.expected_vector_length + 1)]})
    assert info.value.code == 400
    assert "latents" in json.loads(info.value.read())["error"]
    # ambiguous body -> 400
    with pytest.raises(urllib.error.HTTPError) as info:
        _post(url, {"latents": [[0.0]], "seeds": [1]})
    assert info.value.code == 400
    # png with more than one image -> 400, rejected BEFORE synthesis
    frames_before = _get_json(f"http://127.0.0.1:{daemon.port}/stats")["frames"]
    with pytest.raises(urllib.error.HTTPError) as info:
        _post(url, {"seeds": [1, 2], "format": "png"})
    assert info.value.code == 400
    # unknown format -> 400, also pre-synthesis
    with pytest.raises(urllib.error.HTTPError) as info:
        _post(url, {"seeds": [1], "format": "jpeg"})
    assert info.value.code == 400
    frames_after = _get_json(f"http://127.0.0.1:{daemon.port}/stats")["frames"]
    assert frames_after == frames_before  # no device work was burned
    # non-object JSON body -> 400, not 500
    with pytest.raises(urllib.error.HTTPError) as info:
        _post(url, 5)
    assert info.value.code == 400
    # wrong w+ style-row count -> 400 at the edge, not a trace-time 500
    with pytest.raises(urllib.error.HTTPError) as info:
        _post(url, {"dlatents": np.zeros(
            (1, 3, network.expected_vector_length)).tolist()})
    assert info.value.code == 400
    assert "style rows" in json.loads(info.value.read())["error"]
    # over the per-request frame cap -> 400
    with pytest.raises(urllib.error.HTTPError) as info:
        _post(url, {"count": daemon.frame_cap + 1})
    assert info.value.code == 400
    assert "cap" in json.loads(info.value.read())["error"]
    # unknown route -> 404
    with pytest.raises(urllib.error.HTTPError) as info:
        _post(f"http://127.0.0.1:{daemon.port}/nope", {})
    assert info.value.code == 404


def test_daemon_frame_cap_honors_response_bytes():
    from gance_tpu.serving.daemon import MAX_FRAMES_PER_REQUEST, max_frames_for

    assert max_frames_for(0) == MAX_FRAMES_PER_REQUEST
    assert max_frames_for(16) == MAX_FRAMES_PER_REQUEST  # tiny frames: count cap
    # 1024px frames are 3 MiB each: the byte cap binds far below 4096 frames
    assert max_frames_for(1024) == (1 << 30) // (1024 * 1024 * 3)
    assert max_frames_for(1024) < MAX_FRAMES_PER_REQUEST


def test_serve_cli_help_and_wrapper():
    from click.testing import CliRunner

    from gance_tpu.cli.serve import cli

    result = CliRunner().invoke(cli, ["--help"])
    assert result.exit_code == 0
    assert "--max-batch" in result.output
    assert "--max-delay-ms" in result.output
    # root wrapper preserves the invocation shape
    assert "from gance_tpu.cli.serve import cli" in Path(
        Path(__file__).resolve().parents[1] / "serve_network.py"
    ).read_text()


class TestMultiNetwork:
    """Several resident networks behind ONE batcher/daemon (the reference's
    MultiNetwork, network_functions.py:484-640, brought online): lanes carry
    the network index so device batches never mix networks, and requests
    address a network by index or pickle-stem name."""

    def test_batcher_routes_by_network_index(self):
        a = _CountingFake(resolution=16, expected_vector_length=32)
        b = _CountingFake(resolution=8, expected_vector_length=32)
        rows = np.random.RandomState(0).randn(3, 32).astype(np.float32)
        with DynamicBatcher([a, b], max_batch=8, max_delay_ms=0) as batcher:
            fa = batcher.submit(rows, network_index=0)
            fb = batcher.submit(rows, network_index=1)
            images_a = fa.result(timeout=30)
            images_b = fb.result(timeout=30)
        # each network rendered exactly its own request, nothing else
        assert images_a.shape[1:] == (16, 16, 3)
        assert images_b.shape[1:] == (8, 8, 3)
        assert [s for _k, s in a.device_batches] == [(8, 32)]
        assert [s for _k, s in b.device_batches] == [(8, 32)]
        np.testing.assert_array_equal(images_a, a.images_from_vectors(rows))
        np.testing.assert_array_equal(images_b, b.images_from_vectors(rows))

    def test_batcher_coalesces_within_but_not_across_networks(self):
        a = _CountingFake(resolution=16, expected_vector_length=32)
        b = _CountingFake(resolution=16, expected_vector_length=32)
        rng = np.random.RandomState(1)
        with DynamicBatcher([a, b], max_batch=16, max_delay_ms=60) as batcher:
            futures = [
                batcher.submit(rng.randn(2, 32).astype(np.float32), network_index=i % 2)
                for i in range(6)
            ]
            for future in futures:
                future.result(timeout=30)
            stats = batcher.stats()
        # 3 requests x 2 rows per network coalesce into one batch each;
        # the two networks never share a device batch
        assert all(shape == (8, 32) for _k, shape in a.device_batches)
        assert all(shape == (8, 32) for _k, shape in b.device_batches)
        assert len(a.device_batches) + len(b.device_batches) == stats["batches"]
        assert stats["frames_by_network"] == [6, 6]

    def test_batcher_rejects_bad_network_index(self):
        a = _CountingFake(resolution=16, expected_vector_length=32)
        with DynamicBatcher([a], max_batch=8, max_delay_ms=0) as batcher:
            with pytest.raises(ValueError, match="out of range"):
                batcher.submit(np.zeros((1, 32), np.float32), network_index=1)
            with pytest.raises(ValueError, match="out of range"):
                batcher.submit(np.zeros((1, 32), np.float32), network_index=-1)

    @pytest.fixture(scope="class")
    def multi_daemon(self):
        alpha = FakeSynthesisNetwork(resolution=16, expected_vector_length=32)
        alpha.path = Path("/nets/alpha_net.pkl")
        beta = FakeSynthesisNetwork(resolution=8, expected_vector_length=32)
        beta.path = Path("/nets/beta_net.pkl")
        with SynthesisDaemon(
            [alpha, beta], port=0, max_batch=8, max_delay_ms=0
        ) as daemon:
            yield daemon, alpha, beta

    def test_daemon_healthz_lists_networks(self, multi_daemon):
        daemon, _alpha, _beta = multi_daemon
        health = _get_json(f"http://127.0.0.1:{daemon.port}/healthz")
        assert [n["name"] for n in health["networks"]] == ["alpha_net", "beta_net"]
        assert [n["resolution"] for n in health["networks"]] == [16, 8]
        assert health["resolution"] == 16  # top-level = network 0 (back-compat)

    def test_daemon_routes_by_index_and_name(self, multi_daemon):
        daemon, alpha, beta = multi_daemon
        url = f"http://127.0.0.1:{daemon.port}/synthesize"
        latents = np.random.RandomState(3).randn(2, 32).astype(np.float32)
        # default -> network 0
        _status, body, _ = _post(url, {"latents": latents.tolist()})
        np.testing.assert_array_equal(
            np.load(io.BytesIO(body)), alpha.images_from_vectors(latents)
        )
        # by index
        _status, body, _ = _post(url, {"latents": latents.tolist(), "network": 1})
        np.testing.assert_array_equal(
            np.load(io.BytesIO(body)), beta.images_from_vectors(latents)
        )
        # by pickle-stem name
        _status, body, _ = _post(
            url, {"latents": latents.tolist(), "network": "beta_net"}
        )
        np.testing.assert_array_equal(
            np.load(io.BytesIO(body)), beta.images_from_vectors(latents)
        )
        stats = _get_json(f"http://127.0.0.1:{daemon.port}/stats")
        assert stats["frames_by_network"] == [2, 4]

    def test_daemon_rejects_unknown_network(self, multi_daemon):
        daemon, _alpha, _beta = multi_daemon
        url = f"http://127.0.0.1:{daemon.port}/synthesize"
        with pytest.raises(urllib.error.HTTPError) as info:
            _post(url, {"seeds": [1], "network": 7})
        assert info.value.code == 400
        assert "out of range" in json.loads(info.value.read())["error"]
        with pytest.raises(urllib.error.HTTPError) as info:
            _post(url, {"seeds": [1], "network": "nope"})
        assert info.value.code == 400
        assert "beta_net" in json.loads(info.value.read())["error"]
        with pytest.raises(urllib.error.HTTPError) as info:
            _post(url, {"seeds": [1], "network": True})
        assert info.value.code == 400

    def test_serve_cli_accepts_multiple_network_sources(self):
        from click.testing import CliRunner

        from gance_tpu.cli.serve import cli

        result = CliRunner().invoke(cli, ["--help"])
        assert result.exit_code == 0
        assert "--networks-directory" in result.output
        assert "--networks-json" in result.output
        params = {p.name: p for p in cli.params}
        assert params["network_path"].multiple is True


class TestServingClient:
    """gance_tpu.serving.ServingClient against a live fake daemon: round-trip
    equality with direct synthesis, error surfacing, multi-network routing."""

    @pytest.fixture(scope="class")
    def client_daemon(self):
        from gance_tpu.serving import ServingClient

        alpha = FakeSynthesisNetwork(resolution=16, expected_vector_length=32)
        alpha.path = Path("/nets/alpha_net.pkl")
        beta = FakeSynthesisNetwork(resolution=8, expected_vector_length=32)
        beta.path = Path("/nets/beta_net.pkl")
        with SynthesisDaemon(
            [alpha, beta], port=0, max_batch=8, max_delay_ms=0
        ) as daemon:
            yield ServingClient(f"http://127.0.0.1:{daemon.port}"), alpha, beta

    def test_health_stats_and_latents_roundtrip(self, client_daemon):
        client, alpha, _beta = client_daemon
        assert client.health()["ok"] is True
        latents = np.random.RandomState(0).randn(3, 32).astype(np.float32)
        np.testing.assert_array_equal(
            client.synthesize(latents=latents), alpha.images_from_vectors(latents)
        )
        assert client.stats()["frames"] >= 3

    def test_seeds_count_and_network_routing(self, client_daemon):
        client, _alpha, beta = client_daemon
        images = client.synthesize(seeds=[5, 6], network="beta_net")
        assert images.shape == (2, 8, 8, 3)
        images = client.synthesize(count=2, seed=9, network=1)
        expected = beta.images_from_vectors(
            np.random.RandomState(9).randn(2, 32).astype(np.float32)
        )
        np.testing.assert_array_equal(images, expected)

    def test_png_roundtrip(self, client_daemon):
        import cv2

        client, alpha, _beta = client_daemon
        blob = client.synthesize_png(seeds=[7])
        decoded = cv2.imdecode(np.frombuffer(blob, np.uint8), cv2.IMREAD_COLOR)
        expected = alpha.images_from_vectors(
            np.random.RandomState(7).randn(1, 32).astype(np.float32)
        )[0]
        np.testing.assert_array_equal(
            cv2.cvtColor(decoded, cv2.COLOR_BGR2RGB), expected
        )

    def test_server_errors_surface_with_message(self, client_daemon):
        from gance_tpu.serving import ServingClientError

        client, _alpha, _beta = client_daemon
        with pytest.raises(ServingClientError, match="must be"):
            client.synthesize(latents=np.zeros((1, 31), np.float32))
        with pytest.raises(ServingClientError, match="out of range"):
            client.synthesize(seeds=[1], network=9)
        try:
            client.synthesize(seeds=[1], network=9)
        except ServingClientError as error:
            assert error.status == 400


def test_daemon_over_sharded_network_matches_single_device():
    """The daemon serves a mesh-sharded SynthesisNetwork (dp x tp over the 8
    virtual devices) bit-identically to the unsharded network — the multi-chip
    serving leg of the daemon (cli/serve.py --use-mesh/--data-parallel)."""
    import jax

    from gance_tpu.models.stylegan2 import GeneratorConfig, init_generator_params
    from gance_tpu.parallel.mesh import create_mesh
    from gance_tpu.serving import ServingClient
    from gance_tpu.synthesis.runtime import SynthesisNetwork

    config = GeneratorConfig(
        resolution=16, fmap_base=256, fmap_max=32, latent_size=64,
        dlatent_size=64, mapping_layers=2, mapping_fmaps=64,
    )
    params = init_generator_params(jax.random.PRNGKey(0), config)
    plain = SynthesisNetwork(params=params, config=config)
    sharded = SynthesisNetwork(
        params=params, config=config, mesh=create_mesh(data_parallel=4)
    )
    latents = np.random.RandomState(2).randn(3, 64).astype(np.float32)
    with SynthesisDaemon(sharded, port=0, max_batch=8, max_delay_ms=0) as daemon:
        client = ServingClient(f"http://127.0.0.1:{daemon.port}")
        images = client.synthesize(latents=latents)
    np.testing.assert_array_equal(images, plain.images_from_vectors(latents))


def test_network_params_are_device_resident():
    """SynthesisNetwork must hold params as committed device arrays — host
    numpy params are re-uploaded by jit on EVERY dispatched batch (~120 MB of
    config-f params per batch on the serving path, verified with
    jax.transfer_guard before the fix)."""
    import jax

    from gance_tpu.models.stylegan2 import GeneratorConfig, init_generator_params
    from gance_tpu.synthesis.runtime import SynthesisNetwork

    config = GeneratorConfig(
        resolution=16, fmap_base=256, fmap_max=32, latent_size=64,
        dlatent_size=64, mapping_layers=2, mapping_fmaps=64,
    )
    host_params = jax.tree.map(
        np.asarray, init_generator_params(jax.random.PRNGKey(0), config)
    )
    network = SynthesisNetwork(params=host_params, config=config)
    leaves = jax.tree.leaves(network.params)
    default = jax.devices()[0]
    assert all(isinstance(leaf, jax.Array) for leaf in leaves)
    assert all(leaf.devices() == {default} for leaf in leaves)


def test_daemon_accepts_stringified_index(multi_daemon_networks):
    daemon, _alpha, beta = multi_daemon_networks
    url = f"http://127.0.0.1:{daemon.port}/synthesize"
    latents = np.random.RandomState(4).randn(1, 32).astype(np.float32)
    _status, body, _ = _post(url, {"latents": latents.tolist(), "network": "1"})
    np.testing.assert_array_equal(
        np.load(io.BytesIO(body)), beta.images_from_vectors(latents)
    )
    # out-of-range digit string is still an error, not a crash
    with pytest.raises(urllib.error.HTTPError) as info:
        _post(url, {"seeds": [1], "network": "9"})
    assert info.value.code == 400


def test_serve_cli_without_sources_is_a_usage_error():
    from click.testing import CliRunner

    from gance_tpu.cli.serve import cli

    result = CliRunner().invoke(cli, [])
    assert result.exit_code == 2  # click usage error, not a raw traceback
    assert "No networks given" in result.output


def test_client_rejects_seed_without_count():
    from gance_tpu.serving import ServingClient

    client = ServingClient("http://127.0.0.1:1")  # never contacted
    with pytest.raises(ValueError, match="count"):
        client.synthesize(seeds=[1, 2], seed=42)


@pytest.fixture(scope="module")
def multi_daemon_networks():
    alpha = FakeSynthesisNetwork(resolution=16, expected_vector_length=32)
    alpha.path = Path("/nets/alpha_net.pkl")
    beta = FakeSynthesisNetwork(resolution=8, expected_vector_length=32)
    beta.path = Path("/nets/beta_net.pkl")
    with SynthesisDaemon([alpha, beta], port=0, max_batch=8, max_delay_ms=0) as daemon:
        yield daemon, alpha, beta


# ---- /metrics + graceful drain (round 4f) ----


def test_metrics_endpoint_prometheus_format():
    """GET /metrics returns well-formed Prometheus text exposition with the
    batcher counters and per-network frame totals."""
    import time

    from gance_tpu.serving import ServingClient

    alpha = FakeSynthesisNetwork(resolution=16, expected_vector_length=32)
    alpha.path = Path("/nets/alpha_net.pkl")
    beta = FakeSynthesisNetwork(resolution=8, expected_vector_length=32)
    beta.path = Path("/nets/beta_net.pkl")
    with SynthesisDaemon([alpha, beta], port=0, max_batch=8, max_delay_ms=0) as daemon:
        client = ServingClient(f"http://127.0.0.1:{daemon.port}")
        client.synthesize(latents=np.zeros((3, 32), np.float32))
        client.synthesize(latents=np.zeros((1, 32), np.float32), network=1)
        with urllib.request.urlopen(
            f"http://127.0.0.1:{daemon.port}/metrics"
        ) as response:
            assert response.headers["Content-Type"].startswith("text/plain")
            body = response.read().decode()
    assert "gance_serving_requests_total 2" in body
    assert "gance_serving_frames_total 4" in body
    assert "# TYPE gance_serving_requests_total counter" in body
    assert "# TYPE gance_serving_occupancy gauge" in body
    assert "gance_serving_draining 0" in body
    assert "gance_serving_live_requests 0" in body
    assert 'gance_serving_network_frames_total{network="alpha_net"} 3' in body
    assert 'gance_serving_network_frames_total{network="beta_net"} 1' in body
    assert "gance_serving_latency_p50_seconds" in body


def test_drain_finishes_inflight_and_rejects_new():
    """drain(): in-flight requests complete, new requests get a retryable
    503, /healthz flips to draining, and wait returns once idle."""
    import time

    from gance_tpu.serving import ServingClient, ServingClientError

    release = threading.Event()

    class _SlowFake(FakeSynthesisNetwork):
        def device_images_generic(self, batch):
            release.wait(timeout=30)
            return self._render(np.asarray(batch))

    fake = _SlowFake(resolution=16, expected_vector_length=32)
    with SynthesisDaemon(fake, port=0, max_batch=8, max_delay_ms=0) as daemon:
        url = f"http://127.0.0.1:{daemon.port}"
        results = {}

        def submit():
            results["images"] = ServingClient(url, timeout_s=60).synthesize(
                latents=np.zeros((2, 32), np.float32)
            )

        inflight = threading.Thread(target=submit)
        inflight.start()
        for _ in range(200):  # until the slow dispatch holds the request live
            if daemon.batcher.live_requests():
                break
            time.sleep(0.02)
        assert daemon.batcher.live_requests() == 1

        drain_outcome = {}
        drainer = threading.Thread(
            target=lambda: drain_outcome.setdefault(
                "idle", daemon.drain(timeout_s=30)
            )
        )
        drainer.start()
        for _ in range(200):
            if daemon.draining:
                break
            time.sleep(0.01)
        assert daemon.draining

        with pytest.raises(ServingClientError) as info:
            ServingClient(url, timeout_s=10).synthesize(
                latents=np.zeros((1, 32), np.float32)
            )
        assert info.value.status == 503
        assert "draining" in info.value.message
        health = ServingClient(url).health()
        assert health["draining"] is True and health["ok"] is False

        release.set()
        inflight.join(timeout=20)
        drainer.join(timeout=20)
        assert results["images"].shape == (2, 16, 16, 3)
        assert drain_outcome["idle"] is True
        assert daemon.batcher.live_requests() == 0


# ---- zero-downtime model rollout (round 4g) ----


def _fake_loader(path, _index=None, resolution=16):
    fake = FakeSynthesisNetwork(resolution=resolution, expected_vector_length=32)
    fake.path = Path(path)
    return fake


def test_hot_load_route_and_unload_single_host():
    """/admin/load adds a resident network addressable by name/index with
    zero restarts; /admin/unload retires it (new requests 400, name freed
    for re-load), and network 0 refuses to unload."""
    from gance_tpu.serving import ServingClient, ServingClientError

    alpha = _fake_loader("/nets/alpha_net.pkl")
    with SynthesisDaemon(
        alpha, port=0, max_batch=8, max_delay_ms=0,
        network_loader=lambda path, index: _fake_loader(path, index),
    ) as daemon:
        client = ServingClient(f"http://127.0.0.1:{daemon.port}")
        loaded = client.load_network("/nets/beta_net.pkl")
        assert loaded == {
            "index": 1, "name": "beta_net", "resolution": 16,
            "vector_length": 32,
        }
        images = client.synthesize(
            latents=np.zeros((2, 32), np.float32), network="beta_net"
        )
        assert images.shape == (2, 16, 16, 3)
        health = client.health()
        assert [n["name"] for n in health["networks"]] == ["alpha_net", "beta_net"]

        gone = client.unload_network("beta_net")
        assert gone == {"index": 1, "name": "beta_net", "drained": True}
        # by index: explicit "unloaded"; by name: the name is FREED (that is
        # how same-stem rollouts work), so it reads as unknown
        with pytest.raises(ServingClientError) as info:
            client.synthesize(latents=np.zeros((1, 32), np.float32), network=1)
        assert info.value.status == 400
        assert "unload" in info.value.message
        with pytest.raises(ServingClientError) as info:
            client.synthesize(
                latents=np.zeros((1, 32), np.float32), network="beta_net"
            )
        assert info.value.status == 400
        assert "unknown network" in info.value.message
        assert daemon.batcher.networks[1] is None  # params reference dropped
        health = client.health()
        assert health["networks"][1] == {
            "index": 1, "name": "beta_net", "retired": True,
        }

        # the name is free again: same-stem rollout = unload old, load new
        reloaded = client.load_network("/nets/beta_net.pkl")
        assert reloaded["index"] == 2 and reloaded["name"] == "beta_net"
        images = client.synthesize(
            latents=np.zeros((1, 32), np.float32), network="beta_net"
        )
        assert images.shape == (1, 16, 16, 3)

        with pytest.raises(ServingClientError) as info:
            client.unload_network(0)
        assert info.value.status == 400
        assert "identity" in info.value.message


def test_hot_load_without_loader_is_501():
    from gance_tpu.serving import ServingClient, ServingClientError

    with SynthesisDaemon(
        _fake_loader("/nets/alpha_net.pkl"), port=0, max_batch=8
    ) as daemon:
        with pytest.raises(ServingClientError) as info:
            ServingClient(f"http://127.0.0.1:{daemon.port}").load_network("/x.pkl")
        assert info.value.status == 501


def test_unload_waits_for_inflight_requests():
    """Retiring a network blocks until its in-flight requests resolve; the
    HTTP edge refuses new requests for it the moment the unload starts."""
    import time

    from gance_tpu.serving import ServingClient, ServingClientError

    release = threading.Event()

    class _SlowFake(FakeSynthesisNetwork):
        def device_images_generic(self, batch):
            release.wait(timeout=30)
            return self._render(np.asarray(batch))

    def loader(path, _index):
        fake = _SlowFake(resolution=16, expected_vector_length=32)
        fake.path = Path(path)
        return fake

    with SynthesisDaemon(
        _fake_loader("/nets/alpha_net.pkl"), port=0, max_batch=8,
        max_delay_ms=0, network_loader=loader,
    ) as daemon:
        url = f"http://127.0.0.1:{daemon.port}"
        client = ServingClient(url, timeout_s=60)
        assert client.load_network("/nets/slow_net.pkl")["index"] == 1

        results = {}

        def submit():
            results["images"] = client.synthesize(
                latents=np.zeros((2, 32), np.float32), network=1
            )

        inflight = threading.Thread(target=submit)
        inflight.start()
        for _ in range(200):
            if daemon.batcher.live_requests():
                break
            time.sleep(0.02)

        unload_result = {}
        unloader = threading.Thread(
            target=lambda: unload_result.setdefault(
                "reply", ServingClient(url, timeout_s=60).unload_network(1)
            )
        )
        unloader.start()
        for _ in range(200):  # until the edge marks it retired
            if 1 in daemon._retired:
                break
            time.sleep(0.01)
        with pytest.raises(ServingClientError) as info:
            ServingClient(url, timeout_s=10).synthesize(
                latents=np.zeros((1, 32), np.float32), network=1
            )
        assert info.value.status == 400

        release.set()
        inflight.join(timeout=20)
        unloader.join(timeout=20)
        assert results["images"].shape == (2, 16, 16, 3)
        assert unload_result["reply"]["drained"] is True
        assert daemon.batcher.networks[1] is None


def test_unload_retry_after_drain_timeout():
    """A drain timeout must not leak the slot forever: the edge stays closed
    (no new routing), and a SECOND /admin/unload retries the drain instead of
    400ing — once in-flight work resolves, the retry frees the slot and
    notifies the unloader exactly once."""
    release = threading.Event()

    class _SlowFake(FakeSynthesisNetwork):
        def device_images_generic(self, batch):
            release.wait(timeout=30)
            return self._render(np.asarray(batch))

    def loader(path, _index):
        fake = _SlowFake(resolution=16, expected_vector_length=32)
        fake.path = Path(path)
        return fake

    unloads = []
    with SynthesisDaemon(
        _fake_loader("/nets/alpha_net.pkl"), port=0, max_batch=8,
        max_delay_ms=0, network_loader=loader,
        network_unloader=unloads.append,
    ) as daemon:
        assert daemon.load_network("/nets/slow_net.pkl")["index"] == 1
        future = daemon.batcher.submit(
            np.zeros((2, 32), np.float32), network_index=1
        )
        for _ in range(200):  # until the request is live
            if daemon.batcher.live_requests():
                break
            import time as _time

            _time.sleep(0.01)

        first = daemon.unload_network(1, timeout_s=0.2)
        assert first == {"index": 1, "name": "slow_net", "drained": False}
        assert unloads == []  # nothing freed yet
        assert daemon.batcher.networks[1] is not None  # slot intact
        # the edge stopped routing regardless
        from gance_tpu.serving.daemon import ServingError

        with pytest.raises(ServingError, match="unloaded"):
            daemon.resolve_network_index({"network": 1})

        release.set()
        assert future.result(timeout=30).shape == (2, 16, 16, 3)

        # retry — by index AND by (retired) name both resolve the leak
        second = daemon.unload_network("slow_net", timeout_s=30.0)
        assert second == {"index": 1, "name": "slow_net", "drained": True}
        assert daemon.batcher.networks[1] is None
        assert daemon.networks[1] is None
        assert unloads == [1]  # workers told exactly once


def test_batcher_submit_checks_retired_slot_under_lock():
    """submit() must consult the slot under the same lock retire_network
    frees it under — a request for a freed slot raises at the edge instead
    of dispatching against None."""
    fakes = [
        FakeSynthesisNetwork(resolution=16, expected_vector_length=32)
        for _ in range(2)
    ]
    with DynamicBatcher(fakes, max_batch=8, max_delay_ms=0) as batcher:
        assert batcher.retire_network(1, timeout_s=5.0) is True
        with pytest.raises(ValueError, match="unloaded"):
            batcher.submit(np.zeros((1, 32), np.float32), network_index=1)


def test_prometheus_labels_escaped():
    """A pickle stem carrying a quote or backslash must not invalidate the
    whole Prometheus scrape (exposition-format label escaping)."""
    from gance_tpu.serving.daemon import _prometheus_metrics

    weird = FakeSynthesisNetwork(resolution=16, expected_vector_length=32)
    weird.path = Path('/nets/sty"le\\gan.pkl')
    with SynthesisDaemon(
        [_fake_loader("/nets/alpha_net.pkl"), weird], port=0, max_batch=8,
        max_delay_ms=0,
    ) as daemon:
        daemon.batcher.submit(
            np.zeros((1, 32), np.float32), network_index=1
        ).result(timeout=30)
        text = _prometheus_metrics(daemon)
    assert 'network="sty\\"le\\\\gan"' in text
    assert 'network="sty"le' not in text


def test_two_phase_loader_keeps_serving_through_prepare():
    """The single-host rollout contract: the slow host-side pickle parse
    (prepare) runs OUTSIDE the batcher's device-op lock, so /synthesize keeps
    flowing through it; only the device placement (commit) pauses batches."""
    prepare_entered = threading.Event()
    prepare_release = threading.Event()

    class _TwoPhase:
        @staticmethod
        def prepare(path, _index):
            prepare_entered.set()
            assert prepare_release.wait(timeout=30)
            return {"staged": path}

        @staticmethod
        def commit(staged, path, _index):
            return _fake_loader(path)

        def __call__(self, path, _index):  # pragma: no cover - not used here
            raise AssertionError("two-phase loader must use prepare/commit")

    with SynthesisDaemon(
        _fake_loader("/nets/alpha_net.pkl"), port=0, max_batch=8,
        max_delay_ms=0, network_loader=_TwoPhase(),
    ) as daemon:
        load_result = {}
        loader_thread = threading.Thread(
            target=lambda: load_result.setdefault(
                "reply", daemon.load_network("/nets/beta_net.pkl")
            )
        )
        loader_thread.start()
        assert prepare_entered.wait(timeout=10)
        # serving continues while the parse grinds
        images = daemon.batcher.submit(
            np.zeros((3, 32), np.float32), network_index=0
        ).result(timeout=10)
        assert images.shape == (3, 16, 16, 3)
        prepare_release.set()
        loader_thread.join(timeout=30)
        assert load_result["reply"]["index"] == 1
        images = daemon.batcher.submit(
            np.zeros((1, 32), np.float32), network_index=1
        ).result(timeout=30)
        assert images.shape == (1, 16, 16, 3)


def test_daemon_compressed_egress_png_zip_and_avi(real_daemon):
    """Compressed egress formats: png-zip round-trips LOSSLESSLY to the npy
    frames; avi returns playable MJPEG of the same shape at the posted fps."""
    import zipfile

    import cv2

    daemon, network = real_daemon
    latents = np.random.RandomState(1).randn(
        4, network.expected_vector_length
    ).astype(np.float32)
    expected = network.images_from_vectors(latents)

    status, body, _ = _post(
        f"http://127.0.0.1:{daemon.port}/synthesize",
        {"latents": latents.tolist(), "format": "png-zip"},
    )
    assert status == 200
    with zipfile.ZipFile(io.BytesIO(body)) as archive:
        names = sorted(archive.namelist())
        assert names == [f"frame_{i:06d}.png" for i in range(4)]
        decoded = np.stack(
            [
                cv2.cvtColor(
                    cv2.imdecode(
                        np.frombuffer(archive.read(name), np.uint8),
                        cv2.IMREAD_COLOR,
                    ),
                    cv2.COLOR_BGR2RGB,
                )
                for name in names
            ]
        )
    np.testing.assert_array_equal(decoded, expected)

    status, body, _ = _post(
        f"http://127.0.0.1:{daemon.port}/synthesize",
        {"latents": latents.tolist(), "format": "avi", "fps": 24.0},
    )
    assert status == 200
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".avi") as handle:
        handle.write(body)
        handle.flush()
        capture = cv2.VideoCapture(handle.name)
        assert int(capture.get(cv2.CAP_PROP_FRAME_COUNT)) == 4
        assert capture.get(cv2.CAP_PROP_FPS) == 24.0
        ok, frame = capture.read()
        capture.release()
    assert ok and frame.shape == expected.shape[1:]

    # unknown formats still rejected before device work
    with pytest.raises(urllib.error.HTTPError) as info:
        _post(
            f"http://127.0.0.1:{daemon.port}/synthesize",
            {"latents": latents.tolist(), "format": "jpeg"},
        )
    assert info.value.code == 400
    # avi's fps is parsed + range-checked BEFORE synthesis: null and 0 are
    # client errors (400), not post-render 500s
    for bad_fps in (None, 0, -5, "fast"):
        with pytest.raises(urllib.error.HTTPError) as info:
            _post(
                f"http://127.0.0.1:{daemon.port}/synthesize",
                {"latents": latents.tolist(), "format": "avi", "fps": bad_fps},
            )
        assert info.value.code == 400, bad_fps


def test_client_synthesize_compressed(real_daemon):
    from gance_tpu.serving import ServingClient

    daemon, network = real_daemon
    client = ServingClient(f"http://127.0.0.1:{daemon.port}", timeout_s=60.0)
    blob = client.synthesize_compressed(seeds=[3, 4], format="png-zip")
    import zipfile

    with zipfile.ZipFile(io.BytesIO(blob)) as archive:
        assert len(archive.namelist()) == 2
    with pytest.raises(ValueError, match="png-zip"):
        client.synthesize_compressed(seeds=[3], format="bmp")
