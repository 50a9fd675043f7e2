"""
The FLAGSHIP transform served online: projection-file blend through
/synthesize_audio (reference visualization_inputs.py:169-270 +
projection_file_blend.py:56-343, brought to the serving daemon).

Certification pattern mirrors tests/test_serving_audio.py: the server-side
plan must be BIT-IDENTICAL to the offline pipeline's input synthesis on the
same WAV + final latents, and the daemon's HTTP surface must enforce the
offline contract's gates (fps multiple, blend depth range, row/length
agreement, registration lifecycle).
"""

import base64
from pathlib import Path

import numpy as np
import pytest

from gance_tpu.audio.io import fabricate_percussive_wav, read_wav_bytes, read_wavs_scale_for_video
from gance_tpu.serving.audio import (
    AudioRequestError,
    load_projection_registration,
    plan_audio_request,
    registration_from_latents,
)
from gance_tpu.serving.daemon import SynthesisDaemon
from gance_tpu.synthesis.inputs import alpha_blend_projection_file
from gance_tpu.synthesis.runtime import FakeSynthesisNetwork
from gance_tpu.types import MatricesLabel

VECTOR_LENGTH = 512
ROWS_16PX = 6  # GeneratorConfig(resolution=16).num_style_rows


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


def _final_latents(frames: int = 10, rows: int = ROWS_16PX) -> np.ndarray:
    """(frames, rows, V) with the projector's rows-identical property."""
    rng = np.random.RandomState(11)
    row0 = rng.randn(frames, 1, VECTOR_LENGTH).astype(np.float32)
    return np.tile(row0, (1, rows, 1))


def _payload(wav: bytes, **extra):
    body = {"wav_base64": base64.b64encode(wav).decode(), "fps": 15.0}
    body.update(extra)
    return body


# ------------------------------------------------------------- registration


def test_registration_from_latents_layout():
    latents = _final_latents(frames=7)
    reg = registration_from_latents(latents, projection_fps=15.0, name="posted")
    assert reg.frame_count == 7
    assert reg.num_rows == ROWS_16PX
    assert reg.vector_length == VECTOR_LENGTH
    # the concatenated layout must round-trip to the posted frames
    back = reg.matrices.reshape(ROWS_16PX, 7, VECTOR_LENGTH).transpose(1, 0, 2)
    np.testing.assert_array_equal(back, latents)


def test_registration_from_latents_validation():
    with pytest.raises(AudioRequestError, match="frames, rows"):
        registration_from_latents(np.zeros((4, 512)), 15.0, "bad")
    with pytest.raises(AudioRequestError, match="projection_fps"):
        registration_from_latents(_final_latents(3), 0.0, "bad")
    # row-DISTINCT latents (e.g. style-mixed) must be rejected loudly: the
    # blend's row-0 shortcut would silently discard rows 1..N otherwise
    mixed = np.random.RandomState(0).randn(4, ROWS_16PX, VECTOR_LENGTH)
    with pytest.raises(AudioRequestError, match="identical style rows"):
        registration_from_latents(mixed.astype(np.float32), 15.0, "mixed")


def test_load_projection_registration_from_file(tmp_path):
    """A real (tiny) projection file loads with the offline pipeline's gate."""
    from gance_tpu.projection.file_writer import ProjectionFileWriter
    from gance_tpu.projection.projection_types import (
        LATEST_VERSION,
        ProjectionAttributes,
    )

    frames = 5
    latents = _final_latents(frames)

    def write(path, complete):
        attrs = ProjectionAttributes(
            version_number=LATEST_VERSION, complete=False,
            original_target_path="t", original_width_height=(16, 16),
            projection_width_height=(16, 16), target_md5_hash="0" * 32,
            original_network_path="n", network_md5_hash="0" * 32,
            steps_in_projection=1, noises_shapes=np.nan,
            latents_histories_enabled=False, noises_histories_enabled=False,
            images_histories_enabled=False, original_fps=30.0,
            projection_fps=15.0, original_frame_count=frames,
            projection_frame_count=frames,
        )
        writer = ProjectionFileWriter(path, attrs)
        target = np.zeros((16, 16, 3), np.uint8)
        for index in range(frames):
            with writer.frame_writer() as frame_writer:
                frame_writer.finish(target, latents[index][None], target)
        writer.close(complete=complete)

    good = tmp_path / "good.hdf5"
    write(good, complete=True)
    reg = load_projection_registration(str(good))
    assert reg.name == "good"
    assert reg.frame_count == frames
    assert reg.num_rows == ROWS_16PX
    assert reg.projection_fps == 15.0
    assert reg.path == str(good)
    back = reg.matrices.reshape(
        ROWS_16PX, frames, VECTOR_LENGTH
    ).transpose(1, 0, 2)
    np.testing.assert_allclose(back, latents, rtol=0, atol=0)

    bad = tmp_path / "incomplete.hdf5"
    write(bad, complete=False)
    with pytest.raises(AudioRequestError, match="incomplete"):
        load_projection_registration(str(bad))
    with pytest.raises(AudioRequestError, match="no projection file"):
        load_projection_registration(str(tmp_path / "missing.hdf5"))


# ---------------------------------------------------- plan cert vs offline


def test_projection_plan_matches_offline_input_synthesis(wav_bytes):
    """The server-side plan is BIT-IDENTICAL to the offline pipeline's input
    synthesis (pipelines/projection_file_blend.py:455-476) on the same WAV +
    final latents: same time stretch (target mode), same blend, same indices."""
    networks = _fakes(2)
    latents = _final_latents(frames=10)
    reg = registration_from_latents(latents, projection_fps=15.0, name="p")
    alpha, blend_depth, fps = 0.4, 3, 30.0

    plan = plan_audio_request(
        _payload(wav_bytes, fps=fps, alpha=alpha, blend_depth=blend_depth,
                 projection="p"),
        networks, [0, 1], frame_cap=4096, projection=reg,
    )
    assert plan.projection == "p"
    assert plan.blend_depth == blend_depth
    assert plan.frame_multiplier == 2  # 30 fps over a 15 fps projection
    assert plan.combined.ndim == 3  # w+ lane
    assert plan.combined.shape[1:] == (ROWS_16PX, VECTOR_LENGTH)

    # offline: the exact pipeline calls
    wav = read_wav_bytes(wav_bytes)
    scaled = read_wavs_scale_for_video(
        [wav], vector_length=VECTOR_LENGTH,
        target_num_vectors=2 * reg.frame_count,
    )
    offline = alpha_blend_projection_file(
        final_latents_matrices_label=MatricesLabel(
            data=reg.matrices, vector_length=VECTOR_LENGTH, label=reg.label
        ),
        alpha=alpha, fft_roll_enabled=False,
        fft_amplitude_range=(-10.0, 10.0), blend_depth=blend_depth,
        time_series_audio_vectors=scaled.wav_data,
        vector_length=VECTOR_LENGTH, network_indices=[0, 1],
    )
    expected = (
        np.asarray(offline.combined.data, np.float32)
        .reshape(ROWS_16PX, -1, VECTOR_LENGTH)
        .transpose(1, 0, 2)
    )
    count = plan.combined.shape[0]
    np.testing.assert_array_equal(plan.combined, expected[:count])
    quantized = np.asarray(offline.network_indices.result.data, np.int64)
    np.testing.assert_array_equal(
        plan.indices, np.clip(quantized[:count], 0, 1)
    )
    # rows below blend_depth are PURE projection latents, duplicated to the
    # output frame count (multiplier 2: each latent appears twice)
    pure = plan.combined[:, blend_depth:, :]
    duplicated = np.repeat(latents[:, blend_depth:, :], 2, axis=0)[:count]
    np.testing.assert_array_equal(pure, duplicated)


def test_projection_plan_contract_errors(wav_bytes):
    networks = _fakes(2)
    reg = registration_from_latents(_final_latents(), 15.0, "p")

    # fps not an integer multiple of projection fps
    with pytest.raises(AudioRequestError, match="integer multiple"):
        plan_audio_request(
            _payload(wav_bytes, fps=20.0), networks, [0, 1], 4096,
            projection=reg,
        )
    with pytest.raises(AudioRequestError, match="whole numbers"):
        plan_audio_request(
            _payload(wav_bytes, fps=22.5), networks, [0, 1], 4096,
            projection=reg,
        )
    # blend depth out of range / wrong type
    with pytest.raises(AudioRequestError, match="blend_depth"):
        plan_audio_request(
            _payload(wav_bytes, blend_depth=ROWS_16PX + 1), networks,
            [0, 1], 4096, projection=reg,
        )
    with pytest.raises(AudioRequestError, match="blend_depth"):
        plan_audio_request(
            _payload(wav_bytes, blend_depth="deep"), networks, [0, 1], 4096,
            projection=reg,
        )
    # frame cap is exact (multiplier x latent count), checked pre-DSP
    with pytest.raises(AudioRequestError, match="per-request cap"):
        plan_audio_request(
            _payload(wav_bytes), networks, [0, 1], frame_cap=5, projection=reg,
        )
    # style-row disagreement: 64px fakes expect 10 rows, registration has 6
    networks_64 = _fakes(2, resolution=64)
    with pytest.raises(AudioRequestError, match="style rows"):
        plan_audio_request(
            _payload(wav_bytes), networks_64, [0, 1], 4096, projection=reg,
        )
    # vector-length disagreement
    short = registration_from_latents(
        np.zeros((4, ROWS_16PX, 256), np.float32), 15.0, "short"
    )
    with pytest.raises(AudioRequestError, match="wide latents"):
        plan_audio_request(
            _payload(wav_bytes), networks, [0, 1], 4096, projection=short,
        )


# ------------------------------------------------------------- HTTP surface


def test_daemon_projection_blend_end_to_end(wav_bytes):
    """Register (posted latents) -> plan preview -> render -> lifecycle."""
    from gance_tpu.serving import ServingClient, ServingClientError

    networks = _fakes(2)
    latents = _final_latents(frames=10)
    with SynthesisDaemon(networks, port=0, max_batch=8, max_delay_ms=0) as daemon:
        client = ServingClient(f"http://127.0.0.1:{daemon.port}", timeout_s=60.0)

        registered = client.register_projection(
            final_latents=latents, projection_fps=15.0, name="clip"
        )
        assert registered == {
            "name": "clip", "frames": 10, "rows": ROWS_16PX,
            "vector_length": VECTOR_LENGTH, "projection_fps": 15.0,
            "replaced": False,
        }
        listing = client.projections()
        assert [p["name"] for p in listing["projections"]] == ["clip"]
        assert listing["projections"][0]["path"] is None

        plan = client.synthesize_audio(
            wav_bytes, fps=30.0, projection="clip", blend_depth=2, plan=True
        )
        assert plan["projection"] == "clip"
        assert plan["blend_depth"] == 2
        assert plan["frame_multiplier"] == 2
        assert plan["frames"] <= 20

        images = client.synthesize_audio(
            wav_bytes, fps=30.0, projection="clip", blend_depth=2
        )
        assert images.shape == (plan["frames"], 16, 16, 3)
        assert images.dtype == np.uint8

        # the rendered frames are the fake's deterministic function of the
        # planned dlatents — proves the w+ lane carried the blend
        reg = registration_from_latents(latents, 15.0, "clip")
        direct_plan = plan_audio_request(
            _payload(wav_bytes, fps=30.0, blend_depth=2, projection="clip"),
            networks, [0, 1], daemon.frame_cap, projection=reg,
        )
        expected = np.concatenate(
            [
                networks[index].images_from_matrices(
                    direct_plan.combined[position : position + 1]
                )
                for position, index in enumerate(direct_plan.indices)
            ]
        )
        np.testing.assert_array_equal(images, expected)

        # contract errors over HTTP
        with pytest.raises(ServingClientError) as info:
            client.synthesize_audio(wav_bytes, fps=20.0, projection="clip")
        assert info.value.status == 400
        with pytest.raises(ServingClientError) as info:
            client.synthesize_audio(wav_bytes, fps=30.0, projection="ghost")
        assert info.value.status == 400
        assert "register_projection" in str(info.value)

        # re-register replaces; unregister frees the handle
        assert client.register_projection(
            final_latents=latents, projection_fps=15.0, name="clip"
        )["replaced"]
        assert client.unregister_projection("clip") == {
            "name": "clip", "unregistered": True,
        }
        with pytest.raises(ServingClientError) as info:
            client.synthesize_audio(wav_bytes, fps=30.0, projection="clip")
        assert info.value.status == 400
        with pytest.raises(ServingClientError) as info:
            client.unregister_projection("clip")
        assert info.value.status == 400


def test_daemon_register_projection_from_file(wav_bytes, tmp_path):
    """{"path": ...} registration reads a server-local projection file."""
    from gance_tpu.projection.file_writer import ProjectionFileWriter
    from gance_tpu.projection.projection_types import (
        LATEST_VERSION,
        ProjectionAttributes,
    )
    from gance_tpu.serving import ServingClient, ServingClientError

    frames = 8
    latents = _final_latents(frames)
    attrs = ProjectionAttributes(
        version_number=LATEST_VERSION, complete=False,
        original_target_path="t", original_width_height=(16, 16),
        projection_width_height=(16, 16), target_md5_hash="0" * 32,
        original_network_path="n", network_md5_hash="0" * 32,
        steps_in_projection=1, noises_shapes=np.nan,
        latents_histories_enabled=False, noises_histories_enabled=False,
        images_histories_enabled=False, original_fps=15.0,
        projection_fps=15.0, original_frame_count=frames,
        projection_frame_count=frames,
    )
    path = tmp_path / "session.hdf5"
    writer = ProjectionFileWriter(path, attrs)
    target = np.zeros((16, 16, 3), np.uint8)
    for index in range(frames):
        with writer.frame_writer() as frame_writer:
            frame_writer.finish(target, latents[index][None], target)
    writer.close(complete=True)

    with SynthesisDaemon(_fakes(1), port=0, max_batch=8, max_delay_ms=0) as daemon:
        client = ServingClient(f"http://127.0.0.1:{daemon.port}", timeout_s=60.0)
        registered = client.register_projection(path=str(path))
        assert registered["name"] == "session"
        assert registered["frames"] == frames
        images = client.synthesize_audio(
            wav_bytes, fps=15.0, projection="session"
        )
        assert images.shape[0] <= frames
        assert images.shape[1:] == (16, 16, 3)
        # bad registrations are 400s
        with pytest.raises(ServingClientError) as info:
            client.register_projection(path=str(tmp_path / "nope.hdf5"))
        assert info.value.status == 400
        with pytest.raises(ServingClientError) as info:
            client._post_json("/admin/register_projection", {})
        assert info.value.status == 400
        with pytest.raises(ServingClientError) as info:
            client._post_json(
                "/admin/register_projection",
                {"final_latents_base64": "!!!", "name": "x"},
            )
        assert info.value.status == 400


# -------------------------------------------------- overlay-composited avi


FACE_IMAGE = "/root/reference/test/assets/face_image.jpeg"


class _FaceFake(FakeSynthesisNetwork):
    """Fake whose output IS a face image, so the eye tracker finds eyes in
    both the overlay foreground (projection targets) and background
    (synthesis) and the composite gate can fire."""

    def __init__(self, face: np.ndarray, **kwargs):
        super().__init__(**kwargs)
        self._face = face

    def _render(self, batch: np.ndarray) -> np.ndarray:
        return np.broadcast_to(
            self._face[None], (batch.shape[0],) + self._face.shape
        ).copy()


def _face_square(side: int) -> np.ndarray:
    import cv2

    image = cv2.imread(FACE_IMAGE)
    assert image is not None
    h, w = image.shape[:2]
    short = min(h, w)
    crop = image[:short, (w - short) // 2 : (w - short) // 2 + short]
    return cv2.cvtColor(
        cv2.resize(crop, (side, side), interpolation=cv2.INTER_AREA),
        cv2.COLOR_BGR2RGB,
    )


def _write_projection_file(path, latents, targets, projection_fps=15.0):
    from gance_tpu.projection.file_writer import ProjectionFileWriter
    from gance_tpu.projection.projection_types import (
        LATEST_VERSION,
        ProjectionAttributes,
    )

    frames = latents.shape[0]
    side = targets.shape[1]
    attrs = ProjectionAttributes(
        version_number=LATEST_VERSION, complete=False,
        original_target_path="t", original_width_height=(side, side),
        projection_width_height=(side, side), target_md5_hash="0" * 32,
        original_network_path="n", network_md5_hash="0" * 32,
        steps_in_projection=1, noises_shapes=np.nan,
        latents_histories_enabled=False, noises_histories_enabled=False,
        images_histories_enabled=False, original_fps=projection_fps,
        projection_fps=projection_fps, original_frame_count=frames,
        projection_frame_count=frames,
    )
    writer = ProjectionFileWriter(path, attrs)
    for index in range(frames):
        with writer.frame_writer() as frame_writer:
            frame_writer.finish(targets[index], latents[index][None], targets[index])
    writer.close(complete=True)


def test_daemon_overlay_composited_music_video(wav_bytes, tmp_path):
    """format=avi + overlay: the projection file's target frames composite
    into the video where the eye gates agree — the complete Won Pound
    transform from one HTTP request. Validation: overlay requires avi, a
    registered projection, and a file-backed registration."""
    import cv2

    from gance_tpu.serving import ServingClient, ServingClientError

    side = 256
    face = _face_square(side)
    # the synthesized background is a DIMMED face: eyes still detectable in
    # both streams, and a fired composite visibly restores the bright target
    network = _FaceFake(
        (face * 0.6).astype(np.uint8), resolution=side,
        expected_vector_length=VECTOR_LENGTH,
    )
    network.path = Path("/nets/face_net.pkl")
    rows = int(network.config.num_style_rows)
    frames = 8
    rng = np.random.RandomState(7)
    latents = np.tile(
        rng.randn(frames, 1, VECTOR_LENGTH).astype(np.float32), (1, rows, 1)
    )
    targets = np.broadcast_to(face[None], (frames,) + face.shape).copy()
    projection_path = tmp_path / "faces.hdf5"
    _write_projection_file(projection_path, latents, targets)

    overlay = {"phash_distance": 30, "bbox_distance": 50.0, "track_length": 1}
    with SynthesisDaemon(network, port=0, max_batch=8, max_delay_ms=0) as daemon:
        client = ServingClient(f"http://127.0.0.1:{daemon.port}", timeout_s=120.0)
        client.register_projection(path=str(projection_path))

        # validation: overlay without avi / without projection / posted-latents
        with pytest.raises(ServingClientError) as info:
            client.synthesize_audio(
                wav_bytes, fps=15.0, projection="faces", overlay=overlay
            )
        assert info.value.status == 400 and "avi" in info.value.message
        with pytest.raises(ServingClientError) as info:
            client.synthesize_audio(
                wav_bytes, fps=15.0, format="avi", overlay=overlay
            )
        assert info.value.status == 400 and "projection" in info.value.message
        client.register_projection(
            final_latents=latents, projection_fps=15.0, name="posted"
        )
        with pytest.raises(ServingClientError) as info:
            client.synthesize_audio(
                wav_bytes, fps=15.0, format="avi", projection="posted",
                overlay=overlay,
            )
        assert info.value.status == 400 and "target frames" in info.value.message
        with pytest.raises(ServingClientError) as info:
            client.synthesize_audio(
                wav_bytes, fps=15.0, format="avi", projection="faces",
                overlay={"phash_distance": 30},
            )
        assert info.value.status == 400 and "all-or-none" in info.value.message

        # the real thing: a playable video with the overlay composited
        avi = client.synthesize_audio(
            wav_bytes, fps=15.0, format="avi", projection="faces",
            overlay=overlay,
        )
        video_path = tmp_path / "flagship.avi"
        video_path.write_bytes(avi)
        capture = cv2.VideoCapture(str(video_path))
        count = int(capture.get(cv2.CAP_PROP_FRAME_COUNT))
        ok, first = capture.read()
        capture.release()
        assert ok and count == frames and first.shape == (side, side, 3)

        # certify against the library path: same plan + composite direct
        from gance_tpu.serving.audio import (
            composite_overlay,
            load_projection_registration,
            parse_overlay_params,
            plan_audio_request,
        )

        reg = load_projection_registration(str(projection_path))
        plan = plan_audio_request(
            _payload(wav_bytes, fps=15.0, projection="faces"),
            [network], [0], daemon.frame_cap, projection=reg,
        )
        rendered = network.images_from_matrices(plan.combined)
        composited = composite_overlay(
            rendered, reg, plan.frame_multiplier,
            parse_overlay_params({"overlay": overlay}),
        )
        # fg==bg (both the face): eyes match at distance 0, every frame
        # composites — the composite differs from the raw render exactly
        # where the eye boxes were drawn
        assert not np.array_equal(composited, rendered)
        assert np.array_equal(composited.shape, rendered.shape)
