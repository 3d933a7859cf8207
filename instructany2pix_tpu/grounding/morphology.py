"""Mask morphology as XLA ops — erode/dilate/Gaussian blur.

The reference post-processes SAM masks with OpenCV on CPU
(`cv2.erode(10) → cv2.dilate(40) → cv2.GaussianBlur(20±1)`, reference
gdino/lib.py:42-49). Here the same operators run on-device:
erosion/dilation are min/max pool windows (`lax.reduce_window`), blur
is a separable Gaussian conv — so the whole subject-consistency mask
path stays on the TPU.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _pool2d(mask: jax.Array, size: int, op: str) -> jax.Array:
    """mask: (H, W) float. Square structuring element like cv2's default."""
    if size <= 1:
        return mask
    init = -jnp.inf if op == "max" else jnp.inf
    fn = jax.lax.max if op == "max" else jax.lax.min
    pad = size // 2
    return jax.lax.reduce_window(
        mask,
        init,
        fn,
        window_dimensions=(size, size),
        window_strides=(1, 1),
        padding=((pad, size - 1 - pad), (pad, size - 1 - pad)),
    )


def dilate(mask: jax.Array, size: int) -> jax.Array:
    return _pool2d(mask, size, "max")


def erode(mask: jax.Array, size: int) -> jax.Array:
    return _pool2d(mask, size, "min")


def gaussian_kernel1d(size: int, sigma: float | None = None) -> jnp.ndarray:
    if size % 2 == 0:
        size += 1  # cv2 requires odd kernels; reference passes 21
    if sigma is None:
        # cv2 default: 0.3·((ksize−1)·0.5 − 1) + 0.8
        sigma = 0.3 * ((size - 1) * 0.5 - 1) + 0.8
    x = np.arange(size) - size // 2
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return jnp.asarray(k / k.sum(), jnp.float32)


def gaussian_blur(mask: jax.Array, size: int, sigma: float | None = None) -> jax.Array:
    """Separable Gaussian blur over (H, W)."""
    k = gaussian_kernel1d(size, sigma)
    n = k.shape[0]
    x = mask.astype(jnp.float32)[None, :, :, None]
    kh = k.reshape(n, 1, 1, 1)
    kw = k.reshape(1, n, 1, 1)
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(n // 2, n // 2), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), [(0, 0), (n // 2, n // 2)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return x[0, :, :, 0]


def refine_mask(
    mask: jax.Array, dilate_size: int = 40, erode_size: int = 10, blur_size: int = 21
) -> jax.Array:
    """The reference's mask cleanup (gdino/lib.py:42-49): erode small
    noise, dilate to cover the subject with margin, feather edges."""
    m = mask.astype(jnp.float32)
    m = erode(m, erode_size)
    m = dilate(m, dilate_size)
    m = gaussian_blur(m, blur_size)
    return jnp.clip(m, 0.0, 1.0)
