"""
Online audio-reactive synthesis (gance_tpu/serving/audio.py + the daemon's
/synthesize_audio route): the reference's flagship music->frames transform
(visualization_inputs.py:94-166 + music_into_networks index semantics)
served over HTTP. Certified against the OFFLINE pipeline: the endpoint's
frames must equal rendering alpha_blend_vectors_max_rms_power_audio's plan
directly — same latents, same per-frame network routing, bit-identical.
"""

from pathlib import Path

import numpy as np
import pytest

from gance_tpu.audio.io import fabricate_percussive_wav
from gance_tpu.serving import DynamicBatcher, ServingClient, SynthesisDaemon
from gance_tpu.serving.audio import (
    AudioRequestError,
    _network_groups,
    plan_audio_request,
    synthesize_plan,
)
from gance_tpu.synthesis.runtime import FakeSynthesisNetwork

# The production latent length: the RMS reducer frames audio at the librosa
# 512-sample hop, so vector_length 512 keeps index count == frame count (the
# same alignment the reference depends on).
VECTOR_LENGTH = 512


@pytest.fixture(scope="module")
def wav_bytes(tmp_path_factory) -> bytes:
    path = fabricate_percussive_wav(
        tmp_path_factory.mktemp("audio") / "clip.wav", seconds=1.0
    )
    return Path(path).read_bytes()


def _fakes(count: int = 2, resolution: int = 16):
    fakes = []
    for index in range(count):
        fake = FakeSynthesisNetwork(
            resolution=resolution, expected_vector_length=VECTOR_LENGTH
        )
        fake.path = Path(f"/nets/{index}_net.pkl")
        fakes.append(fake)
    return fakes


class _CountingAudioFake(FakeSynthesisNetwork):
    """Fake recording every device batch shape (see multihost's twin)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.device_batches = []

    def device_images_from_vectors(self, z_batch):
        self.device_batches.append(("z", np.asarray(z_batch).shape))
        return self._render(np.asarray(z_batch))


def _payload(wav: bytes, **extra):
    import base64

    body = {"wav_base64": base64.b64encode(wav).decode(), "fps": 15.0}
    body.update(extra)
    return body


def test_plan_matches_offline_input_synthesis(wav_bytes):
    """The plan's latents and indices are EXACTLY the offline noise-blend
    input synthesis on the same (time-stretched) audio."""
    from gance_tpu.audio.io import read_wav_bytes, read_wavs_scale_for_video
    from gance_tpu.synthesis.inputs import alpha_blend_vectors_max_rms_power_audio

    networks = _fakes(2)
    plan = plan_audio_request(
        _payload(wav_bytes, alpha=0.4), networks, [0, 1], frame_cap=4096
    )
    assert plan.vector_length == VECTOR_LENGTH
    assert plan.combined.shape == (plan.indices.shape[0], VECTOR_LENGTH)
    assert plan.fps == 15.0
    # ~15 frames for a 1s clip at 15 fps
    assert 13 <= plan.indices.shape[0] <= 17

    scaled = read_wavs_scale_for_video(
        [read_wav_bytes(wav_bytes)],
        vector_length=VECTOR_LENGTH,
        frames_per_second=15.0,
    )
    offline = alpha_blend_vectors_max_rms_power_audio(
        alpha=0.4,
        fft_roll_enabled=False,
        fft_amplitude_range=(-10.0, 10.0),
        time_series_audio_vectors=scaled.wav_data,
        vector_length=VECTOR_LENGTH,
        network_indices=[0, 1],
    )
    np.testing.assert_array_equal(
        plan.combined,
        np.asarray(offline.combined.data, np.float32).reshape(-1, VECTOR_LENGTH),
    )
    np.testing.assert_array_equal(
        plan.indices, np.asarray(offline.network_indices.result.data, np.int64)
    )
    # determinism: the noise source is seeded — same WAV, same plan
    again = plan_audio_request(
        _payload(wav_bytes, alpha=0.4), networks, [0, 1], frame_cap=4096
    )
    np.testing.assert_array_equal(plan.combined, again.combined)


def test_network_groups_partition_and_cover():
    indices = np.asarray([0, 0, 1, 1, 1, 0, 2])
    groups = _network_groups(indices)
    assert [(idx, pos.tolist()) for idx, pos in groups] == [
        (0, [0, 1, 5]), (1, [2, 3, 4]), (2, [6]),
    ]
    covered = np.sort(np.concatenate([pos for _idx, pos in groups]))
    assert covered.tolist() == list(range(len(indices)))
    assert _network_groups(np.asarray([3]))[0][0] == 3


def test_alternating_indices_batch_as_two_groups():
    """Loudness at a quantization midpoint alternates the index every frame;
    grouping must submit ONE request per network (full batches), not one
    padded dispatch per frame."""
    networks = _fakes(2)
    indices = np.asarray([0, 1] * 8)
    combined = np.random.RandomState(3).randn(16, VECTOR_LENGTH).astype(np.float32)
    from gance_tpu.serving.audio import AudioSynthesisPlan

    plan = AudioSynthesisPlan(
        combined=combined, indices=indices, selected=[0, 1], fps=15.0,
        vector_length=VECTOR_LENGTH, wav_bytes=b"",
    )
    counting = [
        _CountingAudioFake(resolution=16, expected_vector_length=VECTOR_LENGTH)
        for _ in range(2)
    ]
    with DynamicBatcher(counting, max_batch=48, max_delay_ms=0) as batcher:
        images = synthesize_plan(batcher, plan, timeout_s=60.0)
    # one 8-row bucket per network — not 16 single-frame dispatches
    assert counting[0].device_batches == [("z", (8, VECTOR_LENGTH))]
    assert counting[1].device_batches == [("z", (8, VECTOR_LENGTH))]
    # and the scatter restored frame order exactly
    direct = np.stack(
        [
            counting[index].images_generic(row[None, :])[0]
            for row, index in zip(combined, indices)
        ]
    )
    np.testing.assert_array_equal(images, direct)


def test_synthesize_plan_routes_per_frame_and_matches_direct(wav_bytes):
    """Frames route to the network their loudness selected, and the result
    equals rendering each frame directly on its network."""
    networks = _fakes(2)
    plan = plan_audio_request(
        _payload(wav_bytes), networks, [0, 1], frame_cap=4096
    )
    assert set(np.unique(plan.indices)) <= {0, 1}
    with DynamicBatcher(networks, max_batch=8, max_delay_ms=0) as batcher:
        images = synthesize_plan(batcher, plan, timeout_s=60.0)
    assert images.shape == (plan.indices.shape[0], 16, 16, 3)
    direct = np.stack(
        [
            networks[index].images_generic(row[None, :])[0]
            for row, index in zip(plan.combined, plan.indices)
        ]
    )
    np.testing.assert_array_equal(images, direct)


def test_palette_remaps_onto_selected_networks(wav_bytes):
    """A request palette of batcher indices [2, 0] maps quantized index 0 to
    network 2 and 1 to network 0 — the offline CLI's ordered-list contract."""
    networks = _fakes(3)
    plan = plan_audio_request(
        _payload(wav_bytes), networks, [2, 0], frame_cap=4096
    )
    assert set(np.unique(plan.indices)) <= {2, 0}
    # same audio, identity palette: index VALUES differ only by the remap
    identity = plan_audio_request(
        _payload(wav_bytes), networks, [0, 1], frame_cap=4096
    )
    np.testing.assert_array_equal(
        plan.indices, np.asarray([2, 0])[identity.indices]
    )


def test_plan_request_validation(wav_bytes):
    networks = _fakes(2)
    with pytest.raises(AudioRequestError, match="wav_base64"):
        plan_audio_request({"fps": 30}, networks, [0], frame_cap=100)
    with pytest.raises(AudioRequestError, match="base64"):
        plan_audio_request(
            {"wav_base64": "not base64!!"}, networks, [0], frame_cap=100
        )
    with pytest.raises(AudioRequestError, match="WAV content"):
        plan_audio_request(
            _payload(b"\x00" * 64), networks, [0], frame_cap=100
        )
    with pytest.raises(AudioRequestError, match="fps"):
        plan_audio_request(
            _payload(wav_bytes, fps=-1), networks, [0], frame_cap=100
        )
    with pytest.raises(AudioRequestError, match="alpha"):
        plan_audio_request(
            _payload(wav_bytes, alpha=1.5), networks, [0], frame_cap=100
        )
    with pytest.raises(AudioRequestError, match="cap"):
        plan_audio_request(_payload(wav_bytes), networks, [0], frame_cap=3)
    mixed = _fakes(1) + _fakes(1, resolution=32)
    with pytest.raises(AudioRequestError, match="resolution"):
        plan_audio_request(_payload(wav_bytes), mixed, [0, 1], frame_cap=100)


def test_daemon_synthesize_audio_end_to_end(wav_bytes):
    """The HTTP route: frames + plan preview + palette errors, via the SDK."""
    networks = _fakes(2)
    with SynthesisDaemon(networks, port=0, max_batch=8, max_delay_ms=0) as daemon:
        client = ServingClient(f"http://127.0.0.1:{daemon.port}", timeout_s=60.0)

        plan = client.synthesize_audio(wav_bytes, fps=15.0, plan=True)
        assert plan["vector_length"] == VECTOR_LENGTH
        assert plan["names"] == ["0_net", "1_net"]
        assert len(plan["indices"]) == plan["frames"]

        images = client.synthesize_audio(wav_bytes, fps=15.0)
        assert images.shape == (plan["frames"], 16, 16, 3)
        assert images.dtype == np.uint8

        # explicit palette by name; single-network palette routes everything
        solo = client.synthesize_audio(
            wav_bytes, fps=15.0, networks=["1_net"], plan=True
        )
        assert set(solo["indices"]) == {1}

        from gance_tpu.serving import ServingClientError

        with pytest.raises(ServingClientError) as info:
            client.synthesize_audio(wav_bytes, networks=["missing_net"])
        assert info.value.status == 400
        with pytest.raises(ServingClientError) as info:
            client.synthesize_audio(wav_bytes, networks=[0, 0])
        assert info.value.status == 400
        with pytest.raises(ServingClientError) as info:
            client.synthesize_audio(b"junk" * 10)
        assert info.value.status == 400


def test_daemon_audio_avi_response_is_playable(wav_bytes, tmp_path):
    """format='avi' returns the complete reference deliverable from one
    request: a video file whose frames match the plan, with the posted audio
    muxed in (the native muxer on this host class)."""
    import cv2

    from gance_tpu.serving import ServingClient

    networks = _fakes(1)
    with SynthesisDaemon(networks, port=0, max_batch=8, max_delay_ms=0) as daemon:
        client = ServingClient(f"http://127.0.0.1:{daemon.port}", timeout_s=60.0)
        plan = client.synthesize_audio(wav_bytes, fps=15.0, plan=True)
        blob = client.synthesize_audio(wav_bytes, fps=15.0, format="avi")
    assert isinstance(blob, bytes) and blob[:4] == b"RIFF"
    out = tmp_path / "clip.avi"
    out.write_bytes(blob)
    capture = cv2.VideoCapture(str(out))
    frames = 0
    while capture.read()[0]:
        frames += 1
    capture.release()
    assert frames == plan["frames"]

    with SynthesisDaemon(networks, port=0, max_batch=8) as daemon:
        client = ServingClient(f"http://127.0.0.1:{daemon.port}", timeout_s=60.0)
        from gance_tpu.serving import ServingClientError

        with pytest.raises(ServingClientError) as info:
            client.synthesize_audio(wav_bytes, format="mp3")
        assert info.value.status == 400


def test_daemon_audio_palette_skips_retired(wav_bytes):
    """The default palette is LIVE networks only — a retired slot never
    routes audio frames."""
    networks = _fakes(3)
    with SynthesisDaemon(networks, port=0, max_batch=8, max_delay_ms=0) as daemon:
        daemon.unload_network(1, timeout_s=10.0)
        client = ServingClient(f"http://127.0.0.1:{daemon.port}", timeout_s=60.0)
        plan = client.synthesize_audio(wav_bytes, fps=15.0, plan=True)
        assert plan["names"] == ["0_net", "2_net"]
        assert set(plan["indices"]) <= {0, 2}


def test_synthesize_plan_cancels_siblings_on_failure(wav_bytes):
    """One failing run must not strand the other runs' rows in the queue."""
    networks = _fakes(2)

    boom = networks[1]

    def explode(batch):  # network 1 dies on dispatch
        raise RuntimeError("device on fire")

    boom.device_images_from_vectors = explode
    boom.device_images_generic = explode
    plan = plan_audio_request(
        _payload(wav_bytes), networks, [0, 1], frame_cap=4096
    )
    if not (plan.indices == 1).any():  # pragma: no cover - audio-dependent
        pytest.skip("quantizer chose one network for this clip")
    with DynamicBatcher(networks, max_batch=8, max_delay_ms=0) as batcher:
        with pytest.raises(RuntimeError, match="device on fire"):
            synthesize_plan(batcher, plan, timeout_s=60.0)
        assert batcher.wait_idle(timeout_s=10.0)


# ------------------------------------------------------------- plan cache


def test_plan_cache_hit_skips_dsp_and_is_bit_identical(wav_bytes):
    """Identical requests reuse the cached planning DSP; different params,
    palette SIZES, and projection content miss. Same-size palettes with
    different members HIT (mapping is per-request)."""
    from gance_tpu.serving.audio import (
        PlanCache,
        plan_audio_request,
        registration_from_latents,
    )

    networks = _fakes(3)
    cache = PlanCache()
    body = _payload(wav_bytes, alpha=0.4)
    first = plan_audio_request(body, networks, [0, 1], 4096, plan_cache=cache)
    assert cache.stats()["misses"] == 1 and cache.stats()["hits"] == 0
    second = plan_audio_request(body, networks, [0, 1], 4096, plan_cache=cache)
    assert cache.stats()["hits"] == 1
    np.testing.assert_array_equal(first.combined, second.combined)
    np.testing.assert_array_equal(first.indices, second.indices)

    # same palette size, different members: DSP hits, mapping differs
    remapped = plan_audio_request(
        body, networks, [2, 1], 4096, plan_cache=cache
    )
    assert cache.stats()["hits"] == 2
    np.testing.assert_array_equal(remapped.combined, first.combined)
    palette = np.asarray([2, 1])
    np.testing.assert_array_equal(
        remapped.indices, palette[np.searchsorted([0, 1], first.indices)]
    )

    # different alpha / different palette size: miss
    plan_audio_request(
        _payload(wav_bytes, alpha=0.5), networks, [0, 1], 4096, plan_cache=cache
    )
    plan_audio_request(body, networks, [0, 1, 2], 4096, plan_cache=cache)
    assert cache.stats()["misses"] == 3

    # projection path: content hash keys the cache; re-registering different
    # latents under the same handle must MISS
    rows = int(networks[0].config.num_style_rows)
    rng = np.random.RandomState(3)
    latents_a = np.tile(rng.randn(8, 1, 512).astype(np.float32), (1, rows, 1))
    latents_b = np.tile(rng.randn(8, 1, 512).astype(np.float32), (1, rows, 1))
    reg_a = registration_from_latents(latents_a, 15.0, "clip")
    reg_b = registration_from_latents(latents_b, 15.0, "clip")
    proj_body = _payload(wav_bytes, blend_depth=2)
    plan_a = plan_audio_request(
        proj_body, networks, [0, 1], 4096, projection=reg_a, plan_cache=cache
    )
    misses = cache.stats()["misses"]
    plan_a2 = plan_audio_request(
        proj_body, networks, [0, 1], 4096, projection=reg_a, plan_cache=cache
    )
    assert cache.stats()["misses"] == misses  # hit
    np.testing.assert_array_equal(plan_a.combined, plan_a2.combined)
    plan_audio_request(
        proj_body, networks, [0, 1], 4096, projection=reg_b, plan_cache=cache
    )
    assert cache.stats()["misses"] == misses + 1  # different content: miss


def test_plan_cache_lru_and_byte_bounds():
    from gance_tpu.serving.audio import PlanCache

    cache = PlanCache(max_entries=2, max_bytes=1 << 20)
    a = np.zeros((4, 512), np.float32)
    q = np.zeros(4, np.int64)
    cache.put(("k1",), a, q)
    cache.put(("k2",), a, q)
    cache.put(("k3",), a, q)  # evicts k1
    assert cache.get(("k1",)) is None
    assert cache.get(("k2",)) is not None
    # an entry bigger than the byte bound is refused, not stored
    cache.put(("huge",), np.zeros((600, 512), np.float64), q)
    big = np.zeros((1024, 512), np.float32)  # 2 MB > 1 MB bound
    cache.put(("big",), big, q)
    assert cache.get(("big",)) is None


def test_daemon_stats_expose_plan_cache(wav_bytes):
    """/stats and /metrics carry the plan-cache counters."""
    import json
    import urllib.request

    with SynthesisDaemon(_fakes(2), port=0, max_batch=8, max_delay_ms=0) as daemon:
        from gance_tpu.serving import ServingClient

        client = ServingClient(f"http://127.0.0.1:{daemon.port}", timeout_s=60.0)
        client.synthesize_audio(wav_bytes, fps=15.0, plan=True)
        client.synthesize_audio(wav_bytes, fps=15.0, plan=True)
        stats = json.loads(
            urllib.request.urlopen(
                f"http://127.0.0.1:{daemon.port}/stats", timeout=30
            ).read()
        )
        assert stats["plan_cache"]["misses"] == 1
        assert stats["plan_cache"]["hits"] == 1
        metrics = urllib.request.urlopen(
            f"http://127.0.0.1:{daemon.port}/metrics", timeout=30
        ).read().decode()
        assert "gance_serving_plan_cache_hits_total 1" in metrics
