"""
VGG16 weight import: a synthetic torchvision-layout state dict converts to the
LPIPS param layout, runs through the distance, and roundtrips via torch .pth.
"""

from pathlib import Path

import numpy as np
import pytest

from gance_tpu.projection.lpips import lpips_distance, load_vgg_params
from gance_tpu.projection.vgg_import import convert_torchvision_vgg16, import_vgg_weights

_TORCH_CONV_SHAPES = [
    (0, 64, 3), (2, 64, 64),
    (5, 128, 64), (7, 128, 128),
    (10, 256, 128), (12, 256, 256), (14, 256, 256),
    (17, 512, 256), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
]


def _synthetic_state_dict(rng):
    state = {}
    for idx, cout, cin in _TORCH_CONV_SHAPES:
        state[f"features.{idx}.weight"] = rng.randn(cout, cin, 3, 3).astype(np.float32) * 0.01
        state[f"features.{idx}.bias"] = np.zeros(cout, np.float32)
    return state


def test_convert_layout(rng):
    params = convert_torchvision_vgg16(_synthetic_state_dict(rng))
    assert params["block0_conv0_w"].shape == (3, 3, 3, 64)  # HWIO
    assert params["block4_conv2_w"].shape == (3, 3, 512, 512)
    # distance runs on the converted params
    a = rng.randn(1, 32, 32, 3).astype(np.float32)
    d = np.asarray(lpips_distance(params, a, a))
    np.testing.assert_allclose(d, 0.0, atol=1e-6)


def test_import_roundtrip_torch(tmp_path, rng):
    torch = pytest.importorskip("torch")

    state = {k: torch.from_numpy(v) for k, v in _synthetic_state_dict(rng).items()}
    src = tmp_path / "vgg16.pth"
    torch.save(state, str(src))

    dst = tmp_path / "vgg16.npz"
    import_vgg_weights(src, dst)
    params = load_vgg_params(dst)
    assert params["block2_conv1_w"].shape == (3, 3, 256, 256)


def test_convert_rejects_wrong_channels(rng):
    state = _synthetic_state_dict(rng)
    state["features.0.weight"] = rng.randn(32, 3, 3, 3).astype(np.float32)
    with pytest.raises(ValueError, match="out channels"):
        convert_torchvision_vgg16(state)
