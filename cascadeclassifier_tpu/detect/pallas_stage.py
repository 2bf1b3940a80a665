"""Pallas TPU kernel for dense cascade-stage evaluation.

The XLA dense path (detect/dense.py) is HBM-bound: every tree's rectangle
sums materialize canvas-sized intermediates, so a 2135-stump cascade moves
~2TB per 1080p frame. This kernel restores arithmetic intensity:

  - the canvas is processed in (TH, TW) tiles; each kernel instance DMAs
    its tile + halo into VMEM **once** and evaluates the whole cascade
    from VMEM — canvas HBM traffic drops to one read per frame
  - the per-window early exit of the reference detector (SURVEY §3.2)
    reappears at tile granularity: a `lax.cond` skips a whole stage when
    every window in the tile is already dead
  - tree parameters (rect offsets, weights, thresholds, leaves) live in
    scalar-prefetched SMEM and drive `fori_loop`s — the kernel body is
    loop-rolled, so Mosaic compiles in seconds instead of unrolling
    thousands of vector ops

Mosaic cannot lower dynamic VMEM offsets directly (sublane offsets must be
provably 8-aligned; dynamic lane offsets are unsupported), so shifted tile
reads are decomposed:

  row shift ry  →  aligned load at (ry//8)*8 + an 8-way `lax.switch`
                   over the remainder (static sublane sub-slices)
  lane shift rx →  `pltpu.roll` by (W - rx) % W (dynamic lane rotate,
                   positive shifts only) + a static lane slice

and the upright rect sum is regrouped as
  (top - bot) @ x  -  (top - bot) @ (x+w)
so each rect costs two row shifts + two lane rolls instead of four
dynamically-indexed corner loads.

Stump Haar cascades (the OpenCV-shipped models and our trainer's default)
are supported, including tilted features (a second canvas tile whose lane
offsets are biased by +TILT_BIAS so x-h never goes negative). The XLA path
remains the engine for LBP / deep trees and the exact-f64 mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# lane-offset bias applied to tilted-canvas reads: tilted corners use
# x - h which can be negative relative to the window column
TILT_BIAS = 128


def _pack_chunk_params(stages, stage_ids, tilt_bias):
    """Flatten chunk stages into scalar-prefetch arrays.

    Trees are concatenated over the chunk's stages;
    stage_start[k] : stage_start[k+1] spans stage k's trees."""
    starts = [0]
    sthr = []
    rx, ry, rw, rh, wt, til = [], [], [], [], [], []
    thr, ll, rr = [], [], []
    for si in stage_ids:
        st = stages[si]
        for t in range(st.ntrees):
            tilted = bool(st.tilted[t])
            for r in range(3):
                x = int(st.feat_rects[t, r, 0])
                rx.append(x + tilt_bias if tilted else x)
                ry.append(int(st.feat_rects[t, r, 1]))
                rw.append(int(st.feat_rects[t, r, 2]))
                rh.append(int(st.feat_rects[t, r, 3]))
                wt.append(float(st.weights[t, r]))
            til.append(1 if tilted else 0)
            thr.append(float(st.thr[t]))
            ll.append(float(st.left_leaf[t]))
            rr.append(float(st.right_leaf[t]))
        starts.append(starts[-1] + st.ntrees)
        sthr.append(float(st.threshold))
    return (
        np.asarray(starts, np.int32),
        np.asarray(sthr, np.float32),
        np.asarray(rx, np.int32).reshape(-1, 3),
        np.asarray(ry, np.int32).reshape(-1, 3),
        np.asarray(rw, np.int32).reshape(-1, 3),
        np.asarray(rh, np.int32).reshape(-1, 3),
        np.asarray(wt, np.float32).reshape(-1, 3),
        np.asarray(til, np.int32),
        np.asarray(thr, np.float32),
        np.asarray(ll, np.float32),
        np.asarray(rr, np.float32),
    )


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

    Padded shapes: canvases (Hp+halo_h, Wp+halo_w) int32 (the tilted canvas
    additionally shifted right by TILT_BIAS columns); inv_nf/alive (Hp, Wp)
    on the tile grid."""
    out_h = canvas_h - win_h
    out_w = canvas_w - win_w
    hp = -(-out_h // tile_h) * tile_h
    wp = -(-out_w // tile_w) * tile_w
    grid = (hp // tile_h, wp // tile_w)
    # +8 rows so the 8-aligned base load (ry//8)*8 .. +tile_h+8 stays in
    # bounds for every ry ≤ 2*win (tilted rows reach y+w+h)
    max_row = 2 * max(win_h, win_w) if use_tilted else win_h
    halo_h = -(-max_row // 8) * 8 + 8
    halo_w = (
        -(-(TILT_BIAS + 2 * win_w) // 128) * 128 if use_tilted else 128
    )
    W = tile_w + halo_w

    params = _pack_chunk_params(stages, stage_ids, TILT_BIAS if use_tilted else 0)
    n_stages = len(stage_ids)
    first_is_stage0 = collect_passed0 and stage_ids[0] == 0

    def kernel(
        stage_start,
        stage_thr,
        prx,
        pry,
        prw,
        prh,
        pwt,
        ptil,
        pthr,
        pll,
        prr,
        sum_hbm,
        tilt_hbm,
        inv_ref,
        alive_ref,
        out_ref,
        p0_ref,
        tile_s,
        tile_t,
        sem_s,
        sem_t,
    ):
        i = pl.program_id(0)
        j = pl.program_id(1)

        alive_in = (alive_ref[:] != 0).astype(jnp.int32)
        if first_is_stage0:
            any_alive = True  # first chunk always runs (p0 collection)
        else:
            any_alive = jnp.max(alive_in) > 0

        def tile_body():
            cp_s = pltpu.make_async_copy(
                sum_hbm.at[
                    pl.ds(i * tile_h, tile_h + halo_h),
                    pl.ds(j * tile_w, W),
                ],
                tile_s,
                sem_s,
            )
            cp_s.start()
            if use_tilted:
                cp_t = pltpu.make_async_copy(
                    tilt_hbm.at[
                        pl.ds(i * tile_h, tile_h + halo_h),
                        pl.ds(j * tile_w, W),
                    ],
                    tile_t,
                    sem_t,
                )
                cp_t.start()
            cp_s.wait()
            if use_tilted:
                cp_t.wait()

            def row_shift(ref, ry):
                # value of ref rows [ry : ry+tile_h) — Mosaic needs sublane
                # offsets provably 8-aligned, so load at (ry//8)*8 and
                # switch on the remainder
                q = (ry // 8) * 8
                a = ref[pl.ds(q, tile_h + 8), pl.ds(0, W)]
                return jax.lax.switch(
                    ry - q,
                    [lambda i=i: a[i : i + tile_h, :] for i in range(8)],
                )

            def lane_shift(v, rx):
                # v[:, rx : rx+tile_w] — dynamic lane offsets are
                # unsupported; rotate left by rx (positive shifts only)
                # and slice
                return pltpu.roll(v, (W - rx) % W, 1)[:, :tile_w]

            def upright_rect(ref, t, r):
                rx = prx[t, r]
                ry = pry[t, r]
                w = prw[t, r]
                h = prh[t, r]
                d = row_shift(ref, ry) - row_shift(ref, ry + h)
                return (lane_shift(d, rx) - lane_shift(d, rx + w)).astype(
                    jnp.float32
                )

            def tilted_rect(ref, t, r):
                rx = prx[t, r]
                ry = pry[t, r]
                w = prw[t, r]
                h = prh[t, r]
                a = lane_shift(row_shift(ref, ry), rx)
                b = lane_shift(row_shift(ref, ry + h), rx - h)
                c = lane_shift(row_shift(ref, ry + w), rx + w)
                d = lane_shift(row_shift(ref, ry + w + h), rx + w - h)
                return (a - b - c + d).astype(jnp.float32)

            def tree_value(t):
                def rect_body(r, raw):
                    w_t = pwt[t, r]

                    def live():
                        if use_tilted:
                            rs = jax.lax.cond(
                                ptil[t] != 0,
                                lambda: tilted_rect(tile_t, t, r),
                                lambda: upright_rect(tile_s, t, r),
                            )
                        else:
                            rs = upright_rect(tile_s, t, r)
                        return raw + w_t * rs

                    return jax.lax.cond(w_t != 0.0, live, lambda: raw)

                raw = jax.lax.fori_loop(
                    0, 3, rect_body,
                    jnp.zeros((tile_h, tile_w), jnp.float32),
                )
                val = raw * inv_ref[:]
                return jnp.where(val < pthr[t], pll[t], prr[t])

            def stage_sum(k):
                def tree_body(t, acc):
                    return acc + tree_value(t)

                return jax.lax.fori_loop(
                    stage_start[k],
                    stage_start[k + 1],
                    tree_body,
                    jnp.zeros((tile_h, tile_w), jnp.float32),
                )

            alive = alive_in

            if first_is_stage0:
                passed = (stage_sum(0) >= stage_thr[0]).astype(jnp.int32)
                p0_ref[:] = passed.astype(jnp.int8)
                alive = alive * passed
                k0 = 1
            else:
                p0_ref[:] = jnp.zeros((tile_h, tile_w), jnp.int8)
                k0 = 0

            def stage_body(k, alive):
                def live(al):
                    passed = (stage_sum(k) >= stage_thr[k]).astype(
                        jnp.int32
                    )
                    return al * passed

                return jax.lax.cond(
                    jnp.max(alive) > 0, live, lambda al: al, alive
                )

            alive = jax.lax.fori_loop(k0, n_stages, stage_body, alive)
            out_ref[:] = alive.astype(jnp.int8)

        def tile_dead():
            out_ref[:] = jnp.zeros((tile_h, tile_w), jnp.int8)
            p0_ref[:] = jnp.zeros((tile_h, tile_w), jnp.int8)

        if first_is_stage0:
            tile_body()
        else:
            jax.lax.cond(any_alive, tile_body, tile_dead)

    blk = lambda: pl.BlockSpec(  # noqa: E731
        (tile_h, tile_w),
        # index_map also receives the 11 scalar-prefetch refs
        lambda i, j, *_: (i, j),
        memory_space=pltpu.VMEM,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=11,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            blk(),
            blk(),
        ],
        out_specs=(blk(), blk()),
        scratch_shapes=[
            pltpu.VMEM((tile_h + halo_h, W), jnp.int32),
            pltpu.VMEM(
                (tile_h + halo_h, W) if use_tilted else (8, 128),
                jnp.int32,
            ),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((hp, wp), jnp.int8),
            jax.ShapeDtypeStruct((hp, wp), jnp.int8),
        ),
        interpret=interpret,
    )

    pj = tuple(jnp.asarray(p) for p in params)

    def run(sum_pad, tilt_pad, inv_nf, alive):
        out, p0 = call(*pj, sum_pad, tilt_pad, inv_nf, alive.astype(jnp.int8))
        return out != 0, p0 != 0

    return jax.jit(run), (hp, wp, halo_h, halo_w)
