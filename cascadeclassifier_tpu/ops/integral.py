"""Batched integral-image kernels (sum, squared-sum, tilted 45°).

TPU-native equivalents of ``cv::integral`` as used by the reference
evaluators (reference: traincascade/lib/src/haarfeatures.cpp:100-114,
lbpfeatures.cpp:22-28). All functions are batched over a leading sample axis
and jit-friendly (static shapes, no Python control flow on traced values).

Conventions (identical to OpenCV):
  - input  ``img``  : (..., H, W) integer or float image
  - output ``sum``  : (..., H+1, W+1) with ``sum[..., y, x] = Σ_{i<y, j<x} img[..., i, j]``
    (first row and column are zero)
  - ``tilted[..., Y, X] = Σ over pixels (y, x) with |X - x - 1| <= Y - y - 1``
    (45°-rotated prefix sum, validated bit-exact against ``cv2.integral3``)

dtype policy:
  - ``sum`` / ``tilted`` accumulate in int32: a 1080p uint8 image sums to
    at most 255·2.1e6 ≈ 5.3e8 < 2^31.
  - ``sqsum`` accumulates in float64 on CPU and int64 elsewhere by default;
    for window-sized training images (≤ 2^31 / 255² ≈ 33k px) int32 is safe
    and ``integral_sq(img, dtype=jnp.int32)`` may be used.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def integral_image(img: jax.Array, dtype=jnp.int32) -> jax.Array:
    """Standard integral image with a zero top row / left column.

    img: (..., H, W) -> (..., H+1, W+1) of ``dtype``.
    """
    x = img.astype(dtype)
    s = jnp.cumsum(jnp.cumsum(x, axis=-1, dtype=dtype), axis=-2, dtype=dtype)
    pad = [(0, 0)] * (img.ndim - 2) + [(1, 0), (1, 0)]
    return jnp.pad(s, pad)


def integral_sq(img: jax.Array, dtype=jnp.int64) -> jax.Array:
    """Integral image of squared pixel values.

    Defaults to exact int64 accumulation (a 1080p uint8 image needs up to
    ~37 bits); uses a trace-time x64 scope so the surrounding program can
    keep JAX's default 32-bit mode.
    """
    if dtype == jnp.int64:
        with jax.enable_x64(True):
            x = img.astype(jnp.int64)
            return integral_image(x * x, dtype=jnp.int64)
    x = img.astype(dtype)
    return integral_image(x * x, dtype=dtype)


def _tilted_2d(img: jax.Array) -> jax.Array:
    """Tilted integral for one (H, W) image; returns (H+1, W+1) int32.

    Row recurrence (validated against cv2.integral3):
      T[Y, X] = T[Y-1, X-1] + T[Y-1, X+1] - T[Y-2, X]
                + img[Y-1, X-1] + img[Y-2, X-1]
    The recurrence is exact in the interior; boundary effects propagate
    inward by at most one column per row, so computing on a canvas padded
    with H+1 zero columns on each side and cropping yields the exact result
    everywhere.
    """
    H, W = img.shape
    P = H + 1
    x = jnp.pad(img.astype(jnp.int32), ((0, 0), (P, P)))
    Wp = W + 2 * P
    # rows shifted right by one (img[Y-1, X-1] term), with leading zero col
    rows = jnp.pad(x, ((0, 0), (1, 0)))[:, : Wp + 1]
    zero_row = jnp.zeros((Wp + 1,), jnp.int32)

    def step(carry, row_pair):
        t_m1, t_m2 = carry  # T[Y-1], T[Y-2]
        r1, r2 = row_pair  # img rows Y-1, Y-2 (shifted)
        left = jnp.pad(t_m1[:-1], (1, 0))
        right = jnp.pad(t_m1[1:], (0, 1))
        t = left + right - t_m2 + r1 + r2
        return (t, t_m1), t

    prev_rows = jnp.concatenate([zero_row[None], rows[:-1]], axis=0)
    (_, _), body = jax.lax.scan(step, (zero_row, zero_row), (rows, prev_rows))
    t = jnp.concatenate([zero_row[None], body], axis=0)
    return t[:, P : P + W + 1]


def integral_tilted(img: jax.Array) -> jax.Array:
    """Batched tilted (45°-rotated) integral image.

    img: (..., H, W) -> (..., H+1, W+1) int32. Matches cv2.integral3's third
    output bit-exactly (reference consumer: CV_TILTED_OFFSETS,
    traincascade_features.h:54-63).
    """
    if img.ndim == 2:
        return _tilted_2d(img)
    flat = img.reshape((-1,) + img.shape[-2:])
    out = jax.vmap(_tilted_2d)(flat)
    return out.reshape(img.shape[:-2] + out.shape[-2:])


def integral_all(img: jax.Array, need_tilted: bool = False, sq_dtype=jnp.int64):
    """Compute (sum, sqsum, tilted-or-None) in one call."""
    s = integral_image(img)
    sq = integral_sq(img, dtype=sq_dtype)
    t = integral_tilted(img) if need_tilted else None
    return s, sq, t


def _tri_bf16(blk: int, lower: bool) -> jax.Array:
    import numpy as np

    i = np.arange(blk)
    t = (i[:, None] <= i[None, :]) if not lower else (i[:, None] >= i[None, :])
    return jnp.asarray(t.astype(np.float32), jnp.bfloat16)


def cumsum2d_mxu(x: jax.Array, axis: int, in_bits: int,
                 blk: int = 256) -> jax.Array:
    """Inclusive int32-wraparound cumsum along one axis via MXU limb
    matmuls — bit-identical to ``jnp.cumsum(x, axis, dtype=int32)`` for
    non-negative ``x < 2**in_bits``.

    XLA's native cumsum lowers to log-depth vector passes over the whole
    array (HBM-bound at canvas sizes); this formulation splits the input
    into 8-bit limbs (exact in bfloat16), runs a (blk, blk) triangular
    matmul per limb per block (every partial sum ≤ 255·blk < 2^24, exact
    in the MXU's f32 accumulation), recombines limbs with int32
    wraparound shifts, and adds the tiny inter-block carry. The MXU does
    the O(n·blk) work at matmul rate, turning the canvas integral from a
    bandwidth problem into a (cheap) compute one."""
    assert x.dtype == jnp.int32 and x.ndim == 2 and axis in (0, 1)
    nlimb = -(-in_bits // 8)
    n = x.shape[axis]
    nb = -(-n // blk)
    pad = nb * blk - n
    if axis == 1:
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)))
        xb = x.reshape(x.shape[0], nb, blk)
        T = _tri_bf16(blk, lower=False)  # T[k, j] = k <= j
        comb = None
        for k in range(nlimb):
            limb = ((xb >> (8 * k)) & 0xFF).astype(jnp.bfloat16)
            pref = jax.lax.dot_general(
                limb, T, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            term = jax.lax.shift_left(pref, jnp.int32(8 * k)) if k else pref
            comb = term if comb is None else comb + term
        tot = comb[:, :, -1]
        carry = jnp.cumsum(tot, axis=1, dtype=jnp.int32) - tot
        comb = comb + carry[:, :, None]
        out = comb.reshape(x.shape[0], nb * blk)
        return out[:, :n] if pad else out
    # axis == 0: row blocks, no transpose — T2[i, k] = k <= i contracts
    # the block-row axis in place
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    xb = x.reshape(nb, blk, x.shape[1])
    T2 = _tri_bf16(blk, lower=True)
    comb = None
    for k in range(nlimb):
        limb = ((xb >> (8 * k)) & 0xFF).astype(jnp.bfloat16)
        # (blk_i, blk_k) @ (nb, blk_k, W) -> (nb, blk_i, W)
        pref = jax.lax.dot_general(
            T2, limb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (blk_i, nb, W)
        pref = jnp.swapaxes(pref, 0, 1).astype(jnp.int32)
        term = jax.lax.shift_left(pref, jnp.int32(8 * k)) if k else pref
        comb = term if comb is None else comb + term
    tot = comb[:, -1, :]
    carry = jnp.cumsum(tot, axis=0, dtype=jnp.int32) - tot
    comb = comb + carry[:, None, :]
    out = comb.reshape(nb * blk, x.shape[1])
    return out[:n] if pad else out


def integral2d_mxu(px: jax.Array, need_sq: bool, w_real: int):
    """(H, W) int32 pixel canvas (values 0..255) → inclusive 2D integral
    (and squared integral) with int32 wraparound, bit-identical to the
    chained ``jnp.cumsum`` formulation in detect/detector._build_canvas.

    w_real: true row width bound (for the row-pass limb count)."""
    import numpy as np

    row_bits = int(np.ceil(np.log2(255 * w_real + 1)))
    c1 = cumsum2d_mxu(px, 1, 8)
    c = cumsum2d_mxu(c1, 0, row_bits)
    if not need_sq:
        return c, None
    sq_row_bits = int(np.ceil(np.log2(255 * 255 * w_real + 1)))
    s1 = cumsum2d_mxu(px * px, 1, 16)
    csq = cumsum2d_mxu(s1, 0, min(sq_row_bits, 32))
    return c, csq


def window_norm_factor(sum_img: jax.Array, sq_img: jax.Array) -> jax.Array:
    """Per-window normalization factor sqrt(area·sqSum − sum²).

    Matches the reference ``calcNormFactor`` (features.cpp:13-25): the norm
    rect is (x=1, y=1, w=W-2, h=H-2) in pixel coordinates for an (H, W)-pixel
    window whose integral arrays are (H+1, W+1) — i.e. the window interior
    excluding a one-pixel border.

    sum_img: (..., H+1, W+1); returns (...,) float32.
    """
    h1, w1 = sum_img.shape[-2], sum_img.shape[-1]
    rh, rw = h1 - 3, w1 - 3  # rect height/width = H-2, W-2
    area = rh * rw

    with jax.enable_x64(True):

        def rect4(a):
            return (
                a[..., 1, 1].astype(jnp.int64)
                - a[..., 1, 1 + rw].astype(jnp.int64)
                - a[..., 1 + rh, 1].astype(jnp.int64)
                + a[..., 1 + rh, 1 + rw].astype(jnp.int64)
            )

        v_sum = rect4(sum_img)
        v_sq = rect4(sq_img)
        val = area * v_sq - v_sum * v_sum  # exact in int64
        out = jnp.sqrt(jnp.maximum(val, 0).astype(jnp.float64))
    return out.astype(jnp.float32)
