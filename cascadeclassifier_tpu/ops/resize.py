"""Bit-exact replication of OpenCV's INTER_LINEAR_EXACT resize for uint8.

The OpenCV runtime detector builds its image pyramid with
``resize(..., INTER_LINEAR_EXACT)``; detection parity therefore requires
reproducing its fixed-point arithmetic bit-for-bit:

  - source position: exact rational fx = (d + 0.5)·ssz/dsz − 0.5
  - border clamp: sx < 0 → (0, frac 0); sx ≥ ssz−1 → (ssz−2, frac 1)
  - 8-fractional-bit coefficients, round-half-even
  - separable passes accumulated in uint32, final (v + 2^15) >> 16 saturated

Validated bit-exact against cv2.resize(INTER_LINEAR_EXACT) across up/down
scales including degenerate sizes (see tests/test_resize.py).

Coefficient tables are tiny, shape-static, and computed host-side; the JAX
apply is two gathers + integer math (jit/vmap friendly).
"""

from __future__ import annotations

import functools
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=4096)
def _axis_tab(ssz: int, dsz: int):
    """(src_idx, coef1) int32 arrays for one axis."""
    sx_l = np.empty(dsz, np.int32)
    c_l = np.empty(dsz, np.int32)
    for d in range(dsz):
        fx = Fraction((2 * d + 1) * ssz - dsz, 2 * dsz)
        sx = fx.numerator // fx.denominator  # floor
        frac = fx - sx
        if sx < 0:
            sx, frac = 0, Fraction(0)
        if sx >= ssz - 1:
            sx, frac = (ssz - 2, Fraction(1)) if ssz > 1 else (0, Fraction(0))
        sx_l[d] = sx
        c_l[d] = round(frac * 256)  # Fraction round() = half-even, like OpenCV
    return sx_l, c_l


def resize_linear_exact(img: jax.Array, dst_w: int, dst_h: int) -> jax.Array:
    """Resize (..., H, W) uint8 → (..., dst_h, dst_w) uint8, bit-exact with
    cv2.resize(INTER_LINEAR_EXACT)."""
    sh, sw = img.shape[-2], img.shape[-1]
    if (sh, sw) == (dst_h, dst_w):
        return img
    sxs, cxs = _axis_tab(sw, dst_w)
    sys_, cys = _axis_tab(sh, dst_h)
    sx0 = jnp.asarray(sxs)
    sx1 = jnp.asarray(np.minimum(sxs + 1, sw - 1))
    cx = jnp.asarray(cxs, jnp.uint32)
    sy0 = jnp.asarray(sys_)
    sy1 = jnp.asarray(np.minimum(sys_ + 1, sh - 1))
    cy = jnp.asarray(cys, jnp.uint32)

    s = img.astype(jnp.uint32)
    h = (256 - cx) * jnp.take(s, sx0, axis=-1) + cx * jnp.take(s, sx1, axis=-1)
    v = (256 - cy)[:, None] * jnp.take(h, sy0, axis=-2) + cy[:, None] * jnp.take(
        h, sy1, axis=-2
    )
    out = (v + (1 << 15)) >> 16
    return jnp.minimum(out, 255).astype(jnp.uint8)


def resize_linear_exact_np(img: np.ndarray, dst_w: int, dst_h: int) -> np.ndarray:
    """NumPy twin of resize_linear_exact (host-side pipelines/tools)."""
    sh, sw = img.shape[-2], img.shape[-1]
    if (sh, sw) == (dst_h, dst_w):
        return img
    sxs, cxs = _axis_tab(sw, dst_w)
    sys_, cys = _axis_tab(sh, dst_h)
    s = img.astype(np.uint32)
    h = (256 - cxs) * np.take(s, sxs, axis=-1) + cxs * np.take(
        s, np.minimum(sxs + 1, sw - 1), axis=-1
    )
    v = (256 - cys)[:, None] * np.take(h, sys_, axis=-2) + cys[:, None] * np.take(
        h, np.minimum(sys_ + 1, sh - 1), axis=-2
    )
    return np.minimum((v + (1 << 15)) >> 16, 255).astype(np.uint8)
