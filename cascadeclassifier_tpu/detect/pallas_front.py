"""Statically-unrolled Pallas kernel for the dense cascade front.

The XLA dense path (detect/dense.py) materializes ~8 canvas-sized shifted
slices per stump (~700 MB of HBM traffic per tree at 1080p) — measured
~0.6 ms/tree, HBM-bound. The loop-rolled Pallas kernel (pallas_stage.py)
reads each tile once but pays a dynamic 8-way `lax.switch` + `pltpu.roll`
per rectangle because rect offsets live in SMEM.

This kernel exploits that tree geometry is a COMPILE-TIME constant: the
Python tracer unrolls every tree of the chunk into static VMEM slices of
the tile (arbitrary static sublane/lane offsets lower to cheap shifts),
so the whole chunk evaluates at full VPU rate from one tile DMA:

  rect sum at every tile position
    = (T[ry, :] − T[ry+h, :])[rx : rx+tw] − (…)[rx+w : rx+w+tw]
  (2 sublane-shifted row differences + 2 lane-shifted column differences)

Per-tile early exit (the TPU shape of the reference detector's
per-window early exit, SURVEY §3.2): a tile whose survivor mask is empty
skips the canvas DMA and all arithmetic; each stage inside the chunk is
additionally guarded by a live-mask check.

Arithmetic matches dense_stage_haar(exact=False) operation-for-operation
(i32 rect sums → f32 · weight in rect order, val = raw·inv_nf, leaf by
val < thr, f32 stage accumulation), so results are bit-identical to the
XLA front in f32 mode. Exact-f64 mode keeps the XLA front (no f64 on the
TPU VPU).

Replaces the per-window stage loop of the OpenCV runtime (reference
tools/detection/Cpp/main.cpp:42-49 → cv::CascadeClassifier internals).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def front_pad_geometry(canvas_h, canvas_w, win_w, win_h,
                       tile_h, tile_w):
    """Padded canvas/mask geometry for the static front kernel.

    Returns (hp, wp, halo_h, halo_w): masks are (hp, wp); the canvas must
    be at least (hp + halo_h, wp + halo_w)."""
    out_h = canvas_h - win_h
    out_w = canvas_w - win_w
    hp = -(-out_h // tile_h) * tile_h
    wp = -(-out_w // tile_w) * tile_w
    halo_h = -(-win_h // 8) * 8
    halo_w = -(-win_w // 128) * 128
    return hp, wp, halo_h, halo_w


def plane_pad_geometry(split_r, out_w, win_w, win_h, tile_h, tile_w):
    """Padded plane-mask geometry for the parity-plane front kernel.

    split_r: first canvas row past the step-2 levels (plane anchors are
    the even (r, c) with r < split_r). Returns (hp2, wp2, halo_h2,
    halo_w2): plane masks are (hp2, wp2); each of the four canvas parity
    planes must be at least (hp2 + halo_h2, wp2 + halo_w2)."""
    rows2 = (split_r + 1) // 2
    cols2 = (out_w + 1) // 2
    hp2 = -(-rows2 // tile_h) * tile_h
    wp2 = -(-cols2 // tile_w) * tile_w
    halo_h2 = -(-(win_h // 2 + 1) // 8) * 8
    halo_w2 = -(-(win_w // 2 + 1) // 128) * 128
    return hp2, wp2, halo_h2, halo_w2


def make_plane_front_fn(
    stages,
    stage_ids,
    win_w: int,
    win_h: int,
    split_r: int,
    out_w: int,
    tile_h: int = 32,
    tile_w: int = 512,
    interpret: bool = False,
    frames: int | None = None,
):
    """Parity-plane variant of make_static_front_fn for the ystep-2
    levels: grid anchors of those levels sit at EVEN canvas (row, col)
    (pyramid.py aligns block_top), so the kernel evaluates only the
    (even, even) anchor plane — 4x fewer positions than the dense
    canvas at identical per-position arithmetic.

    The canvas is pre-split into its four parity planes
    planes[a, b] = canvas[a::2, b::2]; a rect corner at static offset
    (dy, dx) from an even anchor reads plane (dy & 1, dx & 1) at static
    offset (dy >> 1, dx >> 1) — still a static VMEM slice.

    fn(planes, inv_p, alive_p) → alive_p' with planes (2, 2, H2, W2)
    int32, masks (hp2, wp2) in anchor-plane layout (anchor (2i, 2j) at
    [i, j]).

    frames (F > 0): in-kernel frame batching — arrays gain a leading F
    axis and the grid a leading frame dimension (see
    make_static_front_fn)."""
    hp2, wp2, halo_h2, halo_w2 = plane_pad_geometry(
        split_r, out_w, win_w, win_h, tile_h, tile_w
    )
    F = frames or 1
    grid2 = (hp2 // tile_h, wp2 // tile_w)
    grid = grid2 if frames is None else (F, *grid2)
    th, tw = tile_h, tile_w
    W = tw + halo_w2

    frozen = _freeze_chunk(stages, stage_ids)

    def kernel(planes_hbm, inv_ref, alive_ref, out_ref,
               tiles, acc, sem):
        i = pl.program_id(0 if frames is None else 1)
        j = pl.program_id(1 if frames is None else 2)
        fi = None if frames is None else pl.program_id(0)
        inv_r = inv_ref if frames is None else inv_ref.at[0]
        alive_r = alive_ref if frames is None else alive_ref.at[0]
        out_r = out_ref if frames is None else out_ref.at[0]
        alive_in = alive_r[:].astype(jnp.int32)

        def dead():
            out_r[:] = jnp.zeros((th, tw), jnp.int8)

        def live():
            cps = []
            for a in range(2):
                for b in range(2):
                    if fi is None:
                        src = planes_hbm.at[
                            a, b,
                            pl.ds(i * th, th + halo_h2),
                            pl.ds(j * tw, W),
                        ]
                    else:
                        # batched planes arrive flattened (F*4, H2, W2):
                        # ONE combined dynamic index keeps every sliced
                        # extent tile-aligned — a chained .at[fi] on the
                        # 5-D ref materializes an (1,2,2,H2,W2) slice
                        # whose H2 extent (odd) fails Mosaic's 8-align
                        # tiling check
                        src = planes_hbm.at[
                            fi * 4 + 2 * a + b,
                            pl.ds(i * th, th + halo_h2),
                            pl.ds(j * tw, W),
                        ]
                    cp = pltpu.make_async_copy(
                        src,
                        tiles.at[2 * a + b],
                        sem.at[2 * a + b],
                    )
                    cp.start()
                    cps.append(cp)
            for cp in cps:
                cp.wait()
            inv = inv_r[:]

            def rect_sum(x, y, w, h, cache):
                a1, i1 = y & 1, y >> 1
                a2, i2 = (y + h) & 1, (y + h) >> 1
                b1, j1 = x & 1, x >> 1
                b2, j2 = (x + w) & 1, (x + w) >> 1

                def rd(b):
                    # full-width row difference, cached per (plane pair,
                    # row offsets) and shared across rects/trees of the
                    # group with the same vertical extent
                    k1, k2 = 2 * a1 + b, 2 * a2 + b
                    key = (k1, i1, k2, i2)
                    d = cache.get(key)
                    if d is None:
                        d = (
                            tiles[k1][i1 : i1 + th, :]
                            - tiles[k2][i2 : i2 + th, :]
                        )
                        cache[key] = d
                    return d

                return (
                    rd(b1)[:, j1 : j1 + tw] - rd(b2)[:, j2 : j2 + tw]
                )

            out_r[:] = _run_stages(
                frozen, alive_in, inv, rect_sum, acc, th, tw
            ).astype(jnp.int8)

        jax.lax.cond(jnp.max(alive_in) > 0, live, dead)

    if frames is None:
        blk = lambda: pl.BlockSpec(  # noqa: E731
            (th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((hp2, wp2), jnp.int8)
    else:
        blk = lambda: pl.BlockSpec(  # noqa: E731
            (1, th, tw), lambda f, i, j: (f, i, j),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((F, hp2, wp2), jnp.int8)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), blk(), blk()],
        out_specs=blk(),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((4, th + halo_h2, W), jnp.int32),
            pltpu.VMEM((th, tw), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )

    def run(planes, inv_p, alive_p):
        if frames is not None:
            # collapse (F, 2, 2, H2, W2) → (F*4, H2, W2): contiguous
            # leading-dim merge (no data movement) so the kernel's
            # dynamic frame index is a plain dim-0 scalar
            planes = planes.reshape((-1,) + planes.shape[-2:])
        return call(planes, inv_p, alive_p.astype(jnp.int8))

    return jax.jit(run), (hp2, wp2, halo_h2, halo_w2)


def _freeze_chunk(stages, stage_ids):
    """Chunk parameters as plain Python (traced into the kernels)."""
    frozen = []
    for si in stage_ids:
        st = stages[si]
        trees = []
        for t in range(st.ntrees):
            assert not st.tilted[t], "static front is untilted-only"
            rects = []
            for r in range(3):
                wt = float(st.weights[t, r])
                if wt == 0.0:
                    continue
                x, y, w, h = (int(v) for v in st.feat_rects[t, r])
                rects.append((x, y, w, h, np.float32(wt)))
            trees.append(
                (rects, np.float32(st.thr[t]),
                 np.float32(st.left_leaf[t]), np.float32(st.right_leaf[t]))
            )
        frozen.append((trees, np.float32(st.threshold)))
    return frozen


def _int_acc_exact(rects):
    """True when the int32 tree accumulation is bit-identical to the
    per-rect f32 path: every partial sum of |wt|·255·w·h must stay below
    2^24 so each f32 conversion is exact. Trees violating the bound
    (huge windows / weights) keep the per-rect f32 formulation."""
    bound = 0
    for (x, y, w, h, wt) in rects:
        bound += abs(int(wt)) * 255 * int(w) * int(h)
    return bound < (1 << 24)


def _run_stages(frozen, alive_in, inv, rect_sum, acc, th, tw):
    """Shared chunk body: evaluate the frozen stages over one tile.

    rect_sum(x, y, w, h, cache) returns the (th, tw) i32 rect sums; the
    per-group `cache` dict lets the kernel share row-difference
    intermediates between rects (and trees) with identical vertical
    extent — Haar x2/x3 features re-read the same row pair per rect.

    Trees whose weights are all integers accumulate raw responses in
    int32 with ONE f32 convert per tree instead of one per rect —
    bit-identical (every partial is an exact integer < 2^24, so both
    orders of f32 conversion are exact)."""

    def stage_pass(alive_any, trees, sthr):
        # accumulate through the VMEM scratch ref; evaluate trees in
        # small cond-guarded groups. The cond regions are hard
        # scheduling barriers: without them Mosaic hoists ~one live
        # tile-sized temp per tree across the whole stage and blows
        # the 16MB scoped-VMEM budget on large stages.
        acc[:] = jnp.zeros((th, tw), jnp.float32)
        G = 8
        for g0 in range(0, len(trees), G):
            group = trees[g0 : g0 + G]

            def group_body(group=group):
                s = acc[:]
                cache = {}
                for (rects, thr, ll, rr) in group:
                    int_wts = all(
                        float(wt).is_integer() for (*_r, wt) in rects
                    ) and _int_acc_exact(rects)
                    raw = None
                    for (x, y, w, h, wt) in rects:
                        rs = rect_sum(x, y, w, h, cache)
                        if int_wts:
                            iw = int(wt)
                            term = rs if iw == 1 else rs * jnp.int32(iw)
                        else:
                            term = rs.astype(jnp.float32) * wt
                        raw = term if raw is None else raw + term
                    if int_wts:
                        raw = raw.astype(jnp.float32)
                    val = raw * inv
                    s = s + jnp.where(val < thr, ll, rr)
                acc[:] = s

            jax.lax.cond(alive_any, group_body, lambda: None)
        return (acc[:] >= sthr).astype(jnp.int32)

    a = alive_in
    for (trees, sthr) in frozen:
        alive_any = jnp.max(a) > 0
        a = a * stage_pass(alive_any, trees, sthr)
    return a


BLK_H = 16  # packed-front block rows (multiple of 8; divides tile pads)
BLK_W = 512  # packed-front block lanes


def make_packed_plane_front_fn(
    stages,
    stage_ids,
    win_w: int,
    win_h: int,
    split_r: int,
    out_w: int,
    nb_cap: int,
    tile_h: int = 128,
    tile_w: int = 512,
    interpret: bool = False,
):
    """Survivor-packed variant of make_plane_front_fn: the grid walks a
    block LIST (16×512 anchor-plane blocks holding ≥1 live window after
    prep) instead of the full plane, so dense VPU work scales with the
    live-block fraction (~25-45% at 1080p bench survivor clustering)
    rather than the canvas area. Steps past `nblk` cost one scalar
    compare; the alive mask input is aliased to the output so dead
    blocks keep their zeros and downstream consumers see the ordinary
    full-layout mask.

    tile_h/tile_w: the DENSE kernels' tile geometry — mask/canvas pads
    are computed with it so the packed kernel is a drop-in on the same
    arrays (BLK_H×BLK_W blocks subdivide those pads).

    fn(planes (2,2,H2,W2) i32, inv_p (hp2,wp2) f32, alive_p (hp2,wp2)
    i32, blk (nb_cap,2) i32 block (row,col) indices, nblk) → alive_p'.
    """
    hp2, wp2, halo_h2, halo_w2 = plane_pad_geometry(
        split_r, out_w, win_w, win_h, tile_h, tile_w
    )
    assert hp2 % BLK_H == 0 and wp2 % BLK_W == 0
    th, tw = BLK_H, BLK_W
    W = tw + halo_w2
    frozen = _freeze_chunk(stages, stage_ids)

    def kernel(blk_ref, nblk_ref, planes_hbm, inv_hbm, alive_hbm,
               out_hbm, tiles, msk, inv_t, acc, sems, sem_out):
        i = pl.program_id(0)

        def live():
            bi = blk_ref[i, 0]
            bj = blk_ref[i, 1]
            r0 = bi * th
            c0 = bj * tw
            cps = []
            for a in range(2):
                for b in range(2):
                    cp = pltpu.make_async_copy(
                        planes_hbm.at[
                            a, b,
                            pl.ds(r0, th + halo_h2),
                            pl.ds(c0, W),
                        ],
                        tiles.at[2 * a + b],
                        sems.at[2 * a + b],
                    )
                    cp.start()
                    cps.append(cp)
            cp_m = pltpu.make_async_copy(
                alive_hbm.at[pl.ds(r0, th), pl.ds(c0, tw)],
                msk, sems.at[4],
            )
            cp_m.start()
            cp_i = pltpu.make_async_copy(
                inv_hbm.at[pl.ds(r0, th), pl.ds(c0, tw)],
                inv_t, sems.at[5],
            )
            cp_i.start()
            for cp in cps:
                cp.wait()
            cp_m.wait()
            cp_i.wait()
            inv = inv_t[:]
            alive_in = msk[:]

            def rect_sum(x, y, w, h, cache):
                a1, i1 = y & 1, y >> 1
                a2, i2 = (y + h) & 1, (y + h) >> 1
                b1, j1 = x & 1, x >> 1
                b2, j2 = (x + w) & 1, (x + w) >> 1

                def rd(b):
                    k1, k2 = 2 * a1 + b, 2 * a2 + b
                    key = (k1, i1, k2, i2)
                    d = cache.get(key)
                    if d is None:
                        d = (
                            tiles[k1][i1 : i1 + th, :]
                            - tiles[k2][i2 : i2 + th, :]
                        )
                        cache[key] = d
                    return d

                return (
                    rd(b1)[:, j1 : j1 + tw] - rd(b2)[:, j2 : j2 + tw]
                )

            msk[:] = _run_stages(
                frozen, alive_in, inv, rect_sum, acc, th, tw
            )
            cp_o = pltpu.make_async_copy(
                msk, out_hbm.at[pl.ds(r0, th), pl.ds(c0, tw)], sem_out
            )
            cp_o.start()
            cp_o.wait()

        jax.lax.cond(i < nblk_ref[0], live, lambda: None)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb_cap,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((4, BLK_H + halo_h2, W), jnp.int32),
            pltpu.VMEM((BLK_H, BLK_W), jnp.int32),
            pltpu.VMEM((BLK_H, BLK_W), jnp.float32),
            pltpu.VMEM((BLK_H, BLK_W), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hp2, wp2), jnp.int32),
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )

    def run(planes, inv_p, alive_p, blk, nblk):
        return call(blk, nblk, planes, inv_p, alive_p)

    return jax.jit(run), (hp2, wp2, halo_h2, halo_w2)


def make_packed_band_front_fn(
    stages,
    stage_ids,
    win_w: int,
    win_h: int,
    canvas_h: int,
    canvas_w: int,
    nb_cap: int,
    tile_h: int = 128,
    tile_w: int = 512,
    interpret: bool = False,
    row_lo: int = 0,
):
    """Survivor-packed variant of make_static_front_fn for the ystep-1
    band (full density): grid walks live 16×512 blocks of the band mask;
    see make_packed_plane_front_fn.

    fn(sum_pad i32, inv_b (hp-row_lo,wp) f32, alive_b (hp-row_lo,wp)
    i32, blk (nb_cap,2) i32, nblk) → alive_b'."""
    hp, wp, halo_h, halo_w = front_pad_geometry(
        canvas_h, canvas_w, win_w, win_h, tile_h, tile_w
    )
    assert row_lo % BLK_H == 0 and row_lo < hp
    assert (hp - row_lo) % BLK_H == 0 and wp % BLK_W == 0
    th, tw = BLK_H, BLK_W
    W = tw + halo_w
    frozen = _freeze_chunk(stages, stage_ids)

    def kernel(blk_ref, nblk_ref, sum_hbm, inv_hbm, alive_hbm,
               out_hbm, tile, msk, inv_t, acc, sems, sem_out):
        i = pl.program_id(0)

        def live():
            bi = blk_ref[i, 0]
            bj = blk_ref[i, 1]
            r0 = bi * th  # row within the band mask
            c0 = bj * tw
            cp = pltpu.make_async_copy(
                sum_hbm.at[
                    pl.ds(row_lo + r0, th + halo_h), pl.ds(c0, W)
                ],
                tile, sems.at[0],
            )
            cp.start()
            cp_m = pltpu.make_async_copy(
                alive_hbm.at[pl.ds(r0, th), pl.ds(c0, tw)],
                msk, sems.at[1],
            )
            cp_m.start()
            cp_i = pltpu.make_async_copy(
                inv_hbm.at[pl.ds(r0, th), pl.ds(c0, tw)],
                inv_t, sems.at[2],
            )
            cp_i.start()
            cp.wait()
            cp_m.wait()
            cp_i.wait()
            inv = inv_t[:]
            alive_in = msk[:]

            def rect_sum(x, y, w, h, cache):
                key = (y, y + h)
                d = cache.get(key)
                if d is None:
                    d = tile[y : y + th, :] - tile[y + h : y + h + th, :]
                    cache[key] = d
                return d[:, x : x + tw] - d[:, x + w : x + w + tw]

            msk[:] = _run_stages(
                frozen, alive_in, inv, rect_sum, acc, th, tw
            )
            cp_o = pltpu.make_async_copy(
                msk, out_hbm.at[pl.ds(r0, th), pl.ds(c0, tw)], sem_out
            )
            cp_o.start()
            cp_o.wait()

        jax.lax.cond(i < nblk_ref[0], live, lambda: None)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb_cap,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((BLK_H + halo_h, W), jnp.int32),
            pltpu.VMEM((BLK_H, BLK_W), jnp.int32),
            pltpu.VMEM((BLK_H, BLK_W), jnp.float32),
            pltpu.VMEM((BLK_H, BLK_W), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hp - row_lo, wp), jnp.int32),
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )

    def run(sum_pad, inv_b, alive_b, blk, nblk):
        return call(blk, nblk, sum_pad, inv_b, alive_b)

    return jax.jit(run), (hp, wp, halo_h, halo_w)


def live_block_list(mask, nb_cap):
    """(rows, cols) i32/bool mask → ((nb_cap, 2) i32 block (row, col)
    indices of 16×512 blocks containing any set position, nblk int32).

    Runs as plain XLA inside the prep programs; order is row-major (any
    order works — the packed kernels treat blocks independently)."""
    H, W = mask.shape
    assert H % BLK_H == 0 and W % BLK_W == 0
    nbr, nbc = H // BLK_H, W // BLK_W
    bm = (
        (mask != 0)
        .reshape(nbr, BLK_H, nbc, BLK_W)
        .any(axis=(1, 3))
        .reshape(-1)
    )
    nblk = jnp.sum(bm, dtype=jnp.int32)
    # stable left-pack of the set block ids (few thousand entries)
    key = jnp.where(bm, 0, 1).astype(jnp.int32) * (nbr * nbc + 1)
    ids = key + jnp.arange(nbr * nbc, dtype=jnp.int32)
    ids = jax.lax.sort(ids)[:nb_cap] % (nbr * nbc + 1)
    blk = jnp.stack(
        [ids // nbc, ids % nbc], axis=1
    ).astype(jnp.int32)
    return blk, nblk


def make_static_front_fn(
    stages,
    stage_ids,
    win_w: int,
    win_h: int,
    canvas_h: int,
    canvas_w: int,
    tile_h: int = 256,
    tile_w: int = 512,
    interpret: bool = False,
    row_lo: int = 0,
    frames: int | None = None,
):
    """Build fn(sum_pad, inv_pad, alive_pad) → alive' for untilted stump
    Haar stages.

    sum_pad  : (≥hp+halo_h, ≥wp+halo_w) int32 padded integral canvas
    inv_pad  : (hp - row_lo, wp) float32 1/normfactor
    alive_pad: (hp - row_lo, wp) int8/bool survivor mask
    returns  : (hp - row_lo, wp) int8 mask — alive ∧ chunk stages passed.

    row_lo (a multiple of tile_h): the kernel's grid covers only canvas
    rows [row_lo, hp) — used to restrict the full-density kernel to the
    ystep-1 levels at the bottom of the canvas while the parity-plane
    kernel handles the (4x larger) ystep-2 region above.

    frames (F > 0): in-kernel frame batching — arrays gain a leading F
    axis and the grid a leading frame dimension, so ONE dispatch walks
    all F frames' tiles (per-tile dead-skip still per frame). The tile
    geometry is shared; only dispatch overheads amortize."""
    hp, wp, halo_h, halo_w = front_pad_geometry(
        canvas_h, canvas_w, win_w, win_h, tile_h, tile_w
    )
    assert row_lo % tile_h == 0 and row_lo < hp
    r0 = row_lo // tile_h
    F = frames or 1
    grid2 = ((hp - row_lo) // tile_h, wp // tile_w)
    grid = grid2 if frames is None else (F, *grid2)
    th, tw = tile_h, tile_w
    W = tw + halo_w

    frozen = _freeze_chunk(stages, stage_ids)

    def kernel(sum_hbm, inv_ref, alive_ref, out_ref, tile, acc, sem):
        i = pl.program_id(0 if frames is None else 1)
        j = pl.program_id(1 if frames is None else 2)
        fi = None if frames is None else pl.program_id(0)
        # with a frame axis the mask blocks are (1, th, tw); [0] views
        # the tile so the shared body stays 2-D
        inv_r = inv_ref if frames is None else inv_ref.at[0]
        alive_r = alive_ref if frames is None else alive_ref.at[0]
        out_r = out_ref if frames is None else out_ref.at[0]
        # int masks + max-reductions throughout: Mosaic cannot relayout
        # 2D i1 vectors for scalar reductions
        alive_in = alive_r[:].astype(jnp.int32)

        def dead():
            out_r[:] = jnp.zeros((th, tw), jnp.int8)

        def live():
            src = sum_hbm
            if fi is not None:
                src = src.at[fi]
            cp = pltpu.make_async_copy(
                src.at[
                    pl.ds((r0 + i) * th, th + halo_h), pl.ds(j * tw, W)
                ],
                tile,
                sem,
            )
            cp.start()
            cp.wait()
            inv = inv_r[:]

            def rect_sum(x, y, w, h, cache):
                key = (y, y + h)
                d = cache.get(key)
                if d is None:
                    d = tile[y : y + th, :] - tile[y + h : y + h + th, :]
                    cache[key] = d
                return d[:, x : x + tw] - d[:, x + w : x + w + tw]

            out_r[:] = _run_stages(
                frozen, alive_in, inv, rect_sum, acc, th, tw
            ).astype(jnp.int8)

        jax.lax.cond(jnp.max(alive_in) > 0, live, dead)

    if frames is None:
        blk = lambda: pl.BlockSpec(  # noqa: E731
            (th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((hp - row_lo, wp), jnp.int8)
    else:
        blk = lambda: pl.BlockSpec(  # noqa: E731
            (1, th, tw), lambda f, i, j: (f, i, j),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((F, hp - row_lo, wp), jnp.int8)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), blk(), blk()],
        out_specs=blk(),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((th + halo_h, W), jnp.int32),
            pltpu.VMEM((th, tw), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        # the unrolled body's live slice temps exceed the 16MB scoped
        # default; v5e VMEM is far larger — raise the cap
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )

    def run(sum_pad, inv_pad, alive_pad):
        return call(sum_pad, inv_pad, alive_pad.astype(jnp.int8))

    return jax.jit(run), (hp, wp, halo_h, halo_w)
