"""
Slow, obviously-correct numpy implementations of the StyleGAN2 primitives, written
directly from the published op definitions (NVlabs upfirdn_2d / modulated_conv2d
semantics as documented in SURVEY.md §2.9). The JAX/XLA ops are validated against
these — NOT against the reference repo's code, which is CUDA/TF1 and not runnable
here.
"""

import numpy as np


def setup_kernel(k, gain=1.0):
    k = np.asarray(k, dtype=np.float64)
    if k.ndim == 1:
        k = np.outer(k, k)
    k /= np.sum(k)
    return k * gain


def upfirdn2d_np(x, kernel, up=1, down=1, pad0=0, pad1=0):
    """
    x: (N, H, W, C). kernel: 2D. Literal zero-stuff → pad → convolve → decimate.
    """
    n, h, w, c = x.shape
    kh, kw = kernel.shape

    # 1. zero-stuff to H*up (each sample followed by up-1 zeros)
    up_x = np.zeros((n, h * up, w * up, c), dtype=np.float64)
    up_x[:, ::up, ::up, :] = x

    # 2. pad (negative pads crop)
    def pad_axis(arr, axis, before, after):
        pads = [(0, 0)] * arr.ndim
        pads[axis] = (max(before, 0), max(after, 0))
        arr = np.pad(arr, pads)
        if before < 0:
            arr = np.take(arr, range(-before, arr.shape[axis]), axis=axis)
        if after < 0:
            arr = np.take(arr, range(0, arr.shape[axis] + after), axis=axis)
        return arr

    up_x = pad_axis(up_x, 1, pad0, pad1)
    up_x = pad_axis(up_x, 2, pad0, pad1)

    # 3. true convolution with the 2D kernel, per channel
    hh, ww = up_x.shape[1], up_x.shape[2]
    oh, ow = hh - kh + 1, ww - kw + 1
    out = np.zeros((n, oh, ow, c), dtype=np.float64)
    kflip = kernel[::-1, ::-1]
    for i in range(oh):
        for j in range(ow):
            patch = up_x[:, i : i + kh, j : j + kw, :]
            out[:, i, j, :] = np.einsum("nhwc,hw->nc", patch, kflip)

    # 4. decimate
    return out[:, ::down, ::down, :]


def upsample_2d_np(x, k=(1, 3, 3, 1), factor=2, gain=1.0):
    kk = setup_kernel(k, gain * factor**2)
    p = kk.shape[0] - factor
    return upfirdn2d_np(x, kk, up=factor, pad0=(p + 1) // 2 + factor - 1, pad1=p // 2)


def downsample_2d_np(x, k=(1, 3, 3, 1), factor=2, gain=1.0):
    kk = setup_kernel(k, gain)
    p = kk.shape[0] - factor
    return upfirdn2d_np(x, kk, up=1, down=factor, pad0=(p + 1) // 2, pad1=p // 2)


def conv2d_np(x, w, stride=1, padding=0):
    """Cross-correlation, NHWC x HWIO -> NHWC, integer symmetric padding."""
    if padding:
        x = np.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    n, h, ww_, c = x.shape
    kh, kw, cin, cout = w.shape
    oh = (h - kh) // stride + 1
    ow = (ww_ - kw) // stride + 1
    out = np.zeros((n, oh, ow, cout), dtype=np.float64)
    for i in range(oh):
        for j in range(ow):
            patch = x[:, i * stride : i * stride + kh, j * stride : j * stride + kw, :]
            out[:, i, j, :] = np.einsum("nhwc,hwco->no", patch, w)
    return out


def conv2d_transpose_np(x, w, factor=2):
    """
    tf.nn.conv2d_transpose(x, w', strides=factor, VALID) with w' = NVlabs' flipped,
    io-swapped arrangement — net effect: correlation of the zero-stuffed input
    (length (H-1)*f+1) padded (ck-1) with the ORIGINAL HWIO weight.
    """
    n, h, wd, c = x.shape
    kh, kw, cin, cout = w.shape
    up_x = np.zeros((n, (h - 1) * factor + 1, (wd - 1) * factor + 1, c), dtype=np.float64)
    up_x[:, ::factor, ::factor, :] = x
    return conv2d_np(up_x, w, stride=1, padding=kh - 1)


def upsample_conv_2d_np(x, w, k=(1, 3, 3, 1), factor=2, gain=1.0):
    ck = w.shape[0]
    kk = setup_kernel(k, gain * factor**2)
    p = (kk.shape[0] - factor) - (ck - 1)
    y = conv2d_transpose_np(x, w, factor=factor)
    return upfirdn2d_np(y, kk, pad0=(p + 1) // 2 + factor - 1, pad1=p // 2 + 1)


def conv_downsample_2d_np(x, w, k=(1, 3, 3, 1), factor=2, gain=1.0):
    ck = w.shape[0]
    kk = setup_kernel(k, gain)
    p = (kk.shape[0] - factor) + (ck - 1)
    y = upfirdn2d_np(x, kk, pad0=(p + 1) // 2, pad1=p // 2)
    return conv2d_np(y, w, stride=factor, padding=0)


def modulated_conv2d_np(
    x, style_w, weight, mod_weight, mod_bias, up=False, down=False, demodulate=True,
    k=(1, 3, 3, 1),
):
    """Literal per-sample modulated conv (builds per-sample weights explicitly)."""
    kh, kw, cin, cout = weight.shape
    b = x.shape[0]
    w_coef = 1.0 / np.sqrt(kh * kw * cin)
    mod_coef = 1.0 / np.sqrt(mod_weight.shape[0])
    w = weight.astype(np.float64) * w_coef

    s = style_w @ (mod_weight * mod_coef) + mod_bias + 1.0  # (B, Cin)

    out = np.zeros(0)
    results = []
    for bi in range(b):
        ww = w * s[bi][None, None, :, None]  # modulate input channels
        if demodulate:
            d = 1.0 / np.sqrt(np.sum(ww**2, axis=(0, 1, 2)) + 1e-8)  # (Cout,)
            ww = ww * d[None, None, None, :]
        xi = x[bi : bi + 1].astype(np.float64)
        if up:
            yi = upsample_conv_2d_np(xi, ww, k=k)
        elif down:
            yi = conv_downsample_2d_np(xi, ww, k=k)
        else:
            yi = conv2d_np(xi, ww, stride=1, padding=kh // 2)
        results.append(yi)
    out = np.concatenate(results, axis=0)
    return out
