"""
Fused bias + activation (+gain, +clamp).

TPU-native replacement for the reference submodule's CUDA op
(stylegan2 dnnlib/tflib/ops/fused_bias_act.{cu,py}; SURVEY.md §2.9). On TPU the
elementwise chain `act(x + b) * gain` is fused into the producing matmul/conv by XLA,
so the "custom kernel" here is simply a carefully-shaped jnp composition; a Pallas
variant exists for the synthesis hot path (gance_tpu.ops.pallas.fused_ops) where the
noise-inject + bias + lrelu chain is fused explicitly.

Activation table mirrors the submodule's: 'linear' (gain 1) and 'lrelu'
(alpha 0.2, gain sqrt(2)) are the only ones StyleGAN2 inference uses.
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp

LRELU_ALPHA = 0.2
LRELU_GAIN = math.sqrt(2.0)

_ACT_DEFAULT_GAIN = {
    "linear": 1.0,
    "lrelu": LRELU_GAIN,
    "relu": LRELU_GAIN,
    "tanh": 1.0,
    "sigmoid": 1.0,
}


def bias_act(
    x: jax.Array,
    b: Optional[jax.Array] = None,
    act: str = "linear",
    alpha: float = LRELU_ALPHA,
    gain: Optional[float] = None,
    clamp: Optional[float] = None,
    axis: int = -1,
) -> jax.Array:
    """
    Compute `act(x + b) * gain`, optionally clamped to [-clamp, clamp].

    :param x: input of any rank.
    :param b: bias broadcast along `axis` (channel axis; NHWC ⇒ -1).
    :param act: one of 'linear', 'lrelu', 'relu', 'tanh', 'sigmoid'.
    :param gain: post-activation gain; defaults to the activation's canonical gain
        (sqrt(2) for lrelu — the constant that keeps activations unit-variance).
    :param clamp: clamp bound; None disables (StyleGAN2 config-f uses no clamp).
    """
    if act not in _ACT_DEFAULT_GAIN:
        raise ValueError(f"Unknown activation {act!r}")
    if gain is None:
        gain = _ACT_DEFAULT_GAIN[act]

    if b is not None:
        shape = [1] * x.ndim
        shape[axis] = b.shape[0]
        x = x + b.reshape(shape).astype(x.dtype)

    if act == "lrelu":
        # For 0 < alpha < 1, lrelu(x) == max(x, alpha*x): one VPU max instead of
        # compare+select (the profile showed the selects as ~19% of synthesis).
        x = jnp.maximum(x, x * jnp.asarray(alpha, dtype=x.dtype))
    elif act == "relu":
        x = jnp.maximum(x, 0)
    elif act == "tanh":
        x = jnp.tanh(x)
    elif act == "sigmoid":
        x = jax.nn.sigmoid(x)

    if gain != 1.0:
        x = x * jnp.asarray(gain, dtype=x.dtype)
    if clamp is not None:
        x = jnp.clip(x, -clamp, clamp)
    return x
