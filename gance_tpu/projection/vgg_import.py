"""
Import pretrained VGG16 weights for true LPIPS projection.

The reference's projector uses NVlabs' vgg16_zhang_perceptual pickle. This host has
no pretrained weights and no egress, so the projector defaults to deterministic
random features (projection/lpips.py); when a user brings weights, two import
paths produce the .npz layout lpips.load_vgg_params expects:

  * torchvision vgg16 state_dict (.pth / .pt: features.N.{weight,bias} with OIHW
    conv kernels) -> block{b}_conv{c}_{w,b} HWIO arrays;
  * an .npz already in our naming, passed through unchanged.
"""

from pathlib import Path
from typing import Dict

import numpy as np

from gance_tpu.projection.lpips import VGG16_BLOCKS

# torchvision vgg16 'features' conv layer indices per block (pools between).
_TORCHVISION_CONV_INDICES = (
    (0, 2),
    (5, 7),
    (10, 12, 14),
    (17, 19, 21),
    (24, 26, 28),
)


def convert_torchvision_vgg16(state_dict: Dict[str, "np.ndarray"]) -> Dict[str, np.ndarray]:
    """
    Convert a torchvision vgg16 `features` state_dict (tensors or ndarrays, conv
    weights OIHW) to the gance_tpu LPIPS param layout (HWIO).
    """
    params: Dict[str, np.ndarray] = {}
    for block, conv_indices in enumerate(_TORCHVISION_CONV_INDICES):
        expected_out, n_convs = VGG16_BLOCKS[block]
        if len(conv_indices) != n_convs:
            raise AssertionError("torchvision layout table out of sync")
        for conv, layer_idx in enumerate(conv_indices):
            weight = np.asarray(state_dict[f"features.{layer_idx}.weight"])
            bias = np.asarray(state_dict[f"features.{layer_idx}.bias"])
            if weight.ndim != 4:
                raise ValueError(f"features.{layer_idx}.weight is not a conv kernel")
            if weight.shape[0] != expected_out:
                raise ValueError(
                    f"features.{layer_idx}: expected {expected_out} out channels, "
                    f"got {weight.shape[0]}"
                )
            # OIHW -> HWIO
            params[f"block{block}_conv{conv}_w"] = np.transpose(
                weight, (2, 3, 1, 0)
            ).astype(np.float32)
            params[f"block{block}_conv{conv}_b"] = bias.astype(np.float32)
    return params


def import_vgg_weights(source: Path, destination_npz: Path) -> None:
    """
    Import VGG16 weights from a torch checkpoint or npz into the npz file the
    projector consumes (`TPUProjector(vgg_weights_path=...)`).
    """
    source = Path(source)
    if source.suffix == ".npz":
        from gance_tpu.projection.lpips import load_vgg_params

        params = load_vgg_params(source)
    else:
        import torch

        loaded = torch.load(str(source), map_location="cpu", weights_only=True)
        state_dict = loaded.get("state_dict", loaded) if isinstance(loaded, dict) else loaded
        params = convert_torchvision_vgg16(
            {k: v.numpy() for k, v in state_dict.items() if k.startswith("features.")}
        )
    np.savez(str(destination_npz), **params)
