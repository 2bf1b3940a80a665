"""Pallas TPU kernel for dense cascade-stage evaluation.

The XLA dense path (detect/dense.py) is HBM-bound: every tree's rectangle
sums materialize canvas-sized intermediates, so a 2135-stump cascade moves
~2TB per 1080p frame. This kernel restores arithmetic intensity the way the
hardware wants it:

  - the canvas is processed in (TH, TW) tiles; each kernel instance DMAs
    its tile + (win_h, win_w) halo into VMEM **once** and evaluates every
    stage of the chunk from VMEM slices — canvas traffic drops to one read
    per chunk
  - the per-window early exit of the reference detector (SURVEY §3.2)
    reappears at tile granularity: when every window in the tile is dead,
    remaining stages of the chunk are skipped via `lax.cond` — on natural
    images most tiles die in the first stages

Stump Haar cascades (the OpenCV-shipped models and our trainer's default)
are supported; tilted features read a second (tilted-canvas) tile. The XLA
path remains the reference implementation for LBP / deep trees and the
`exact=True` float64 mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_pallas_chunk_fn(
    stages,
    stage_ids,
    win_w: int,
    win_h: int,
    canvas_h: int,
    canvas_w: int,
    tile_h: int = 256,
    tile_w: int = 512,
    collect_passed0: bool = False,
    use_tilted: bool = False,
    interpret: bool = False,
):
    """Build fn(sum_pad, tilt_pad, inv_nf, alive) → (alive', passed0).

    sum_pad/tilt_pad: (Hp+win_h, Wp+win_w) int32 canvases padded so that
    Hp, Wp are multiples of the tile size and every halo read is in range.
    inv_nf/alive: (Hp, Wp) float32 / bool on the same padded grid.
    """
    out_h = canvas_h - win_h
    out_w = canvas_w - win_w
    hp = -(-out_h // tile_h) * tile_h
    wp = -(-out_w // tile_w) * tile_w
    grid = (hp // tile_h, wp // tile_w)
    # Mosaic DMA slice shapes must align to the (8, 128) register tiling
    halo_h = -(-win_h // 8) * 8
    halo_w = -(-win_w // 128) * 128

    chunk_stages = [stages[si] for si in stage_ids]
    first_is_stage0 = collect_passed0 and stage_ids[0] == 0

    def kernel(sum_hbm, tilt_hbm, inv_ref, alive_ref, out_ref, p0_ref,
               tile_s, tile_t, sem_s, sem_t):
        i = pl.program_id(0)
        j = pl.program_id(1)

        cp_s = pltpu.make_async_copy(
            sum_hbm.at[
                pl.ds(i * tile_h, tile_h + halo_h),
                pl.ds(j * tile_w, tile_w + halo_w),
            ],
            tile_s,
            sem_s,
        )
        cp_s.start()
        if use_tilted:
            cp_t = pltpu.make_async_copy(
                tilt_hbm.at[
                    pl.ds(i * tile_h, tile_h + halo_h),
                    pl.ds(j * tile_w, tile_w + halo_w),
                ],
                tile_t,
                sem_t,
            )
            cp_t.start()
        cp_s.wait()
        if use_tilted:
            cp_t.wait()

        inv_nf = inv_ref[:]
        # carry the mask as int32: Mosaic's i1 vector relayouts are fragile
        # inside lax.cond bodies
        alive0 = (alive_ref[:] != 0).astype(jnp.int32)

        def rect_sum(ref, rx, ry, w, h):
            # static (python-int) slices of the VMEM tile
            return (
                ref[ry : ry + tile_h, rx : rx + tile_w]
                - ref[ry : ry + tile_h, rx + w : rx + w + tile_w]
                - ref[ry + h : ry + h + tile_h, rx : rx + tile_w]
                + ref[ry + h : ry + h + tile_h, rx + w : rx + w + tile_w]
            )

        def tilt_sum(rx, ry, w, h):
            return (
                tile_t[ry : ry + tile_h, rx : rx + tile_w]
                - tile_t[ry + h : ry + h + tile_h, rx - h : rx - h + tile_w]
                - tile_t[ry + w : ry + w + tile_h, rx + w : rx + w + tile_w]
                + tile_t[
                    ry + w + h : ry + w + h + tile_h,
                    rx + w - h : rx + w - h + tile_w,
                ]
            )

        def eval_stage(st, alive):
            ssum = jnp.zeros((tile_h, tile_w), jnp.float32)
            for t in range(st.ntrees):
                raw = None
                for r in range(3):
                    wt = float(st.weights[t, r])
                    if wt == 0.0:
                        continue
                    rx, ry, w, h = (int(v) for v in st.feat_rects[t, r])
                    if st.tilted[t]:
                        term = tilt_sum(rx, ry, w, h).astype(
                            jnp.float32
                        ) * np.float32(wt)
                    else:
                        term = rect_sum(tile_s, rx, ry, w, h).astype(
                            jnp.float32
                        ) * np.float32(wt)
                    raw = term if raw is None else raw + term
                val = raw * inv_nf
                leaf = jnp.where(
                    val < np.float32(st.thr[t]),
                    np.float32(st.left_leaf[t]),
                    np.float32(st.right_leaf[t]),
                )
                ssum = ssum + leaf
            return (ssum >= np.float32(st.threshold)).astype(jnp.int32)

        alive = alive0
        for k, st in enumerate(chunk_stages):
            if k == 0 and first_is_stage0:
                # stage 0 always evaluates (the skip-walk needs its mask)
                passed = eval_stage(st, alive)
                p0_ref[:] = passed.astype(jnp.int8)
                alive = alive * passed
            else:
                def live(al, _st=st):
                    return al * eval_stage(_st, al)

                def dead(al):
                    return al

                alive = jax.lax.cond(jnp.max(alive) > 0, live, dead, alive)
        out_ref[:] = alive.astype(jnp.int8)
        if not first_is_stage0:
            p0_ref[:] = jnp.zeros((tile_h, tile_w), jnp.int8)

    blk = lambda: pl.BlockSpec(  # noqa: E731
        (tile_h, tile_w),
        lambda i, j: (i, j),
        memory_space=pltpu.VMEM,
    )

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            blk(),
            blk(),
        ],
        out_specs=(blk(), blk()),
        out_shape=(
            jax.ShapeDtypeStruct((hp, wp), jnp.int8),
            jax.ShapeDtypeStruct((hp, wp), jnp.int8),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_h + halo_h, tile_w + halo_w), jnp.int32),
            pltpu.VMEM(
                (tile_h + halo_h, tile_w + halo_w)
                if use_tilted
                else (8, 128),
                jnp.int32,
            ),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )

    def run(sum_pad, tilt_pad, inv_nf, alive):
        out, p0 = call(sum_pad, tilt_pad, inv_nf, alive.astype(jnp.int8))
        return out != 0, p0 != 0

    return jax.jit(run), (hp, wp, halo_h, halo_w)
