"""Single-pass Pallas 2D integral (sum + squared) for the pyramid canvas.

The XLA formulation (``jnp.cumsum`` along each axis) lowers to log-depth
shift/add chains that re-materialize the full ~90 MB canvas per step —
measured ~8 ms of the detection head at 1080p against a ~0.3 ms HBM
roofline. This kernel computes BOTH inclusive 2D cumsums (pixel and
pixel², int32 wrap-around — the exactness argument of
detect/detector._build_canvas) in ONE pass over the canvas:

  grid = row blocks, executed sequentially (TPU grids are loops, so a
  VMEM scratch row carries the running per-column totals across blocks);
  each (TH, W) block does its local 2D prefix with in-register log-step
  lane/sublane shifts and adds the carried row.

Per-level top-row resets are NOT applied: every downstream consumer
(dense/plane rect sums, variance gates, the patchify + corner-incidence
MXU tails) takes 4-corner differences in which any per-level row offset
cancels identically under int32 wrap-around, so the classic
``c − c[top_of_row]`` pass is pure waste (see _build_canvas).

Replaces cv::integral in the runtime pipeline the reference delegates to
(reference tools/detection/Cpp/main.cpp:42-49 → cv::CascadeClassifier).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_lanes(x, k, w):
    """x shifted right by k lanes, zeros shifted in (static k)."""
    return jnp.concatenate(
        [jnp.zeros((x.shape[0], k), x.dtype), x[:, : w - k]], axis=1
    )


def _shift_rows(x, k, h):
    """x shifted down by k sublanes, zeros shifted in (static k)."""
    return jnp.concatenate(
        [jnp.zeros((k, x.shape[1]), x.dtype), x[: h - k]], axis=0
    )


@functools.lru_cache(maxsize=16)
def make_integral_fn(hp: int, wp: int, need_sq: bool, th: int = 256,
                     interpret: bool = False):
    """fn(px_pad (hp, wp) i32) → (c, csq | None), both (hp, wp) i32:
    inclusive 2D prefix sums of px and px² with int32 wrap-around,
    bit-identical to chained ``jnp.cumsum`` (mod 2^32)."""
    assert hp % th == 0 and wp % 128 == 0
    grid = (hp // th,)

    def cum2d(x):
        k = 1
        while k < wp:
            x = x + _shift_lanes(x, k, wp)
            k *= 2
        k = 1
        while k < th:
            x = x + _shift_rows(x, k, th)
            k *= 2
        return x

    def kernel(px_ref, *refs):
        if need_sq:
            c_ref, q_ref, carry = refs
        else:
            (c_ref, carry) = refs
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry[...] = jnp.zeros_like(carry)

        x = px_ref[...]
        cs = cum2d(x) + carry[0:1, :]
        c_ref[...] = cs
        carry[0:1, :] = cs[th - 1 : th, :]
        if need_sq:
            qs = cum2d(x * x) + carry[1:2, :]
            q_ref[...] = qs
            carry[1:2, :] = qs[th - 1 : th, :]

    blk = pl.BlockSpec((th, wp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    n_out = 2 if need_sq else 1
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk],
        out_specs=[blk] * n_out if need_sq else blk,
        out_shape=(
            [jax.ShapeDtypeStruct((hp, wp), jnp.int32)] * n_out
            if need_sq
            else jax.ShapeDtypeStruct((hp, wp), jnp.int32)
        ),
        scratch_shapes=[pltpu.VMEM((8, wp), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )

    def run(px_pad):
        out = call(px_pad)
        if need_sq:
            return out[0], out[1]
        return out, None

    return jax.jit(run)
