"""Survivor-compaction tail for the detector.

The dense engines evaluate every stage at every window position; on content
where the cascade rejects slowly that costs ~1.4 ms per weak tree at 1080p
regardless of how few windows remain alive. This module implements the
compaction strategy: once the dense front has thinned the survivor set,
the remaining windows are gathered into a compact batch and every remaining
stage is evaluated on just those windows.

Replaces the reference's per-window early-exit loop
(lib/src/cascadeclassifier.cpp predictOrderedStump / CascadeClassifierInvoker)
with TPU-shaped phases:

  1. dense stages 0..K-1 (detect/dense.py) with a host-side survivor count
     after each stage; K is chosen adaptively (first stage whose survivor
     count fits the compaction budget)
  2. patch extraction: each survivor's (win_h+1, win_w+1) integral patch is
     gathered into a (N, P) batch (vmap'd dynamic_slice)
  3. an MXU tail: per-rect corner-incidence matrices evaluate all remaining
     trees as matmuls. Raw int32 canvas values exceed float32's exact-int
     range, so patches are split into four 8-bit limbs — each limb matmul
     runs at full bf16 MXU speed with float32 accumulation (products are
     ±1 × [0,255], sums of ≤12 corners: all exact) and the limb results
     recombine into exact int32 rect sums with wrap-safe shifts, matching
     the dense engines' integer arithmetic bit-for-bit. Tilted rects use a
     second patch tensor from the tilted canvas.

Stage semantics match dense_stage_haar exactly: raw = Σ w_r·f32(rect_r) in
rect order, val = raw·inv_nf in f32, leaf by val < f32(node_thr), stage sum
accumulated in f64 (exact mode) or f32, passed = sum ≥ effective threshold.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _pack_tail(stages, stage_ids, win_w, win_h, stride=None):
    """Corner-incidence matrices + per-tree params for the MXU tail.

    stride: patch row stride in the flattened patch vector (defaults to
    win_w+1 = tightly packed; the pallas extractor emits stride 32)."""
    if stride is None:
        stride = win_w + 1
    P = (win_h + 1) * stride
    trees = []
    any_tilt = False
    for si in stage_ids:
        st = stages[si]
        for t in range(st.ntrees):
            trees.append((st, t))
            any_tilt |= bool(st.tilted[t])
    T = len(trees)
    a_sum = np.zeros((3 * T, P), np.float32)
    a_tilt = np.zeros((3 * T, P), np.float32) if any_tilt else None
    wts = np.zeros((T, 3), np.float32)
    thr = np.zeros(T, np.float32)
    ll = np.zeros(T, np.float32)
    rr = np.zeros(T, np.float32)
    for i, (st, t) in enumerate(trees):
        thr[i] = float(st.thr[t])
        ll[i] = float(st.left_leaf[t])
        rr[i] = float(st.right_leaf[t])
        tilted = bool(st.tilted[t])
        for r in range(3):
            w_t = float(st.weights[t, r])
            if w_t == 0.0:
                continue
            wts[i, r] = w_t
            x, y, w, h = (int(v) for v in st.feat_rects[t, r])
            row = 3 * i + r
            if tilted:
                # lib/src/haarfeatures.cpp tilted corner layout
                for (cy, cx, s) in (
                    (y, x, 1),
                    (y + h, x - h, -1),
                    (y + w, x + w, -1),
                    (y + w + h, x + w - h, 1),
                ):
                    a_tilt[row, cy * stride + cx] += s
            else:
                for (cy, cx, s) in (
                    (y, x, 1),
                    (y, x + w, -1),
                    (y + h, x, -1),
                    (y + h, x + w, 1),
                ):
                    a_sum[row, cy * stride + cx] += s
    bounds = [0]
    sthr = []
    for si in stage_ids:
        bounds.append(bounds[-1] + stages[si].ntrees)
        sthr.append(float(stages[si].threshold))
    return a_sum, a_tilt, wts, (thr, ll, rr), bounds, sthr


def _exact_int_matmul(a_bf16, patches):
    """Exact int32 (R, N) = a @ patches.T for ±1 a and int32 patches.

    Four 8-bit limb matmuls in bf16 (f32 accumulate): every product and
    partial sum is exact; the wrap-safe int32 recombination equals the
    true rect sum (which always fits int32)."""
    acc = None
    for l in range(4):
        limb = ((patches >> (8 * l)) & 0xFF).astype(jnp.bfloat16)  # (N, P)
        part = jax.lax.dot_general(
            a_bf16,
            limb,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        part = jax.lax.shift_left(part, jnp.int32(8 * l))
        acc = part if acc is None else acc + part
    return acc


def make_tail_fn(packed, start_stage, exact):
    """fn(patch_sum (N,P) i32, patch_tilt, inv (N,) f32) -> alive (N,) bool

    Evaluates stages start_stage.. on compacted windows. N is whatever
    batch size the caller jits with (keep it fixed to avoid recompiles).
    """
    stage_ids = list(range(start_stage, len(packed.stages)))
    per_stage = []
    for si in stage_ids:
        a_sum, a_tilt, wts, (thr, ll, rr), _, sthr = _pack_tail(
            packed.stages, [si], packed.win_w, packed.win_h
        )
        per_stage.append((
            jnp.asarray(a_sum, jnp.bfloat16),
            None if a_tilt is None else jnp.asarray(a_tilt, jnp.bfloat16),
            jnp.asarray(wts),
            jnp.asarray(thr),
            jnp.asarray(ll),
            jnp.asarray(rr),
            sthr[0],
        ))

    def tail(patch_sum, patch_tilt, inv):
        acc_dt = jnp.float64 if exact else jnp.float32
        # stage-by-stage so the live set stays ~(3·t_k, N) instead of the
        # whole cascade's (3T, N); dead windows keep being evaluated (they
        # are already masked out by `alive`) — survivors are so few past
        # the dense front that the matmuls, not the windows, dominate
        alive = jnp.ones(patch_sum.shape[0], bool)
        for (a_j, at_j, w_j, thr_j, ll_j, rr_j, sthr_k) in per_stage:
            rs = _exact_int_matmul(a_j, patch_sum)  # (3·t_k, N)
            if at_j is not None:
                rs = rs + _exact_int_matmul(at_j, patch_tilt)
            t_k = w_j.shape[0]
            rs = rs.reshape(t_k, 3, -1).astype(jnp.float32)
            # rect-ordered f32 accumulation, matching dense_stage_haar
            raw = rs[:, 0] * w_j[:, 0:1]
            raw = raw + rs[:, 1] * w_j[:, 1:2]
            raw = raw + rs[:, 2] * w_j[:, 2:3]
            val = raw * inv[None, :]
            leaf = jnp.where(
                val < thr_j[:, None], ll_j[:, None].astype(acc_dt),
                rr_j[:, None].astype(acc_dt),
            )
            ssum = jnp.sum(leaf, axis=0)
            alive = alive & (ssum >= acc_dt(sthr_k))
        return alive

    if exact:
        def tail_x64(patch_sum, patch_tilt, inv):
            with jax.enable_x64(True):
                return tail(patch_sum, patch_tilt, inv)

        return jax.jit(tail_x64)
    return jax.jit(tail)


def make_nonzero_fn(out_h, out_w, n_max):
    """fn(mask (H,W) bool) -> idx (n_max,) i32 — ascending flat indices of
    set positions, zero-padded.

    jnp.nonzero's cumsum-over-22M lowering costs ~230 ms at 1080p; ranking
    survivors with an upper-triangular ones matmul (row counts ≤ out_w are
    exact in f32) plus a small 1D cumsum of row totals runs on the MXU."""
    U = jnp.asarray(
        np.triu(np.ones((out_w, out_w), np.float32)), jnp.bfloat16
    )

    def fn(mask):
        m32 = mask.astype(jnp.int32)
        row = (
            jax.lax.dot_general(
                mask.astype(jnp.bfloat16), U, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        ).astype(jnp.int32)  # inclusive within-row rank
        rtot = row[:, -1]
        off = jnp.cumsum(rtot) - rtot
        rank = (row - m32 + off[:, None]).reshape(-1)  # exclusive, sorted
        # rank is monotone in row-major order, so the k-th survivor sits at
        # the last position whose exclusive rank equals k: a vectorized
        # binary search (~25 rounds) instead of a 22M-update scatter
        # (~10 ns/update on TPU)
        q = jnp.arange(n_max, dtype=jnp.int32)
        idx = jnp.searchsorted(rank, q, side="right") - 1
        total = rank[-1] + m32.reshape(-1)[-1]
        return jnp.where(q < total, idx, 0).astype(jnp.int32)

    return jax.jit(fn)


def make_patchify_fn(win_w, win_h, need_tilt):
    """fn(sum2d, tilt2d, r (N,), c (N,)) -> ((N,P) i32, (N,P) i32|None)

    XLA fallback (vmap'd dynamic_slice). ~4 ns/element — use
    make_pallas_patchify on TPU."""
    ph, pw = win_h + 1, win_w + 1

    def patchify(canvas, r, c):
        def one(ri, ci):
            return jax.lax.dynamic_slice(canvas, (ri, ci), (ph, pw))

        return jax.vmap(one)(r, c).reshape(-1, ph * pw)

    def run(sum2d, tilt2d, r, c):
        ps = patchify(sum2d, r, c)
        pt = patchify(tilt2d, r, c) if need_tilt else ps[:, :1]
        return ps, pt

    return jax.jit(run)


def make_pallas_patchify(win_w, win_h, canvas_h, canvas_w, n,
                         interpret=False):
    """Pallas patch extractor: fn(canvas_pad, r, c) -> (n, (win_h+1)*(win_w+1)).

    Each window's (ph, pw) integral patch is DMA'd from HBM (double-
    buffered; aligned base + row-switch/lane-roll because Mosaic supports
    only 8-aligned sublane offsets and no dynamic lane offsets, see
    pallas_stage.py). Window coordinates stay in HBM and are DMA'd into
    SMEM per grid step — scalar-prefetching all n of them overflows SMEM
    (the compile helper crashes beyond a few tens of KB). Four windows
    share each 128-lane output group (one 32-lane slot each, combined with
    masked static rolls), so the kernel emits (n/4 * PH8, 128); plain XLA
    ops then transpose/slice that to the tight (n, ph*pw) layout the MXU
    tail expects. canvas_pad must come from pad_canvas_for_patchify."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ph, pw = win_h + 1, win_w + 1
    assert pw <= 32 and ph <= 32, "pallas patchify supports windows <= 31"
    PH8 = -(-ph // 8) * 8
    rows = PH8 + 8  # aligned base + phase headroom
    G = 32  # windows per grid step
    D = 4   # in-flight canvas DMAs (hides per-DMA latency)

    def kernel(rc_hbm, canvas_hbm, out_hbm, rcbuf, bufs, pbuf,
               sem_rc, sems, sem_out):
        g = pl.program_id(0)

        cp_rc = pltpu.make_async_copy(
            rc_hbm.at[pl.ds(g, 1), :], rcbuf, sem_rc
        )
        cp_rc.start()
        cp_rc.wait()

        def start(i):
            rq = pl.multiple_of((rcbuf[0, i] // 8) * 8, 8)
            cq = pl.multiple_of((rcbuf[0, G + i] // 128) * 128, 128)
            cp = pltpu.make_async_copy(
                canvas_hbm.at[pl.ds(rq, rows), pl.ds(cq, 256)],
                bufs.at[i % D],
                sems.at[i % D],
            )
            cp.start()
            return cp

        row_i = jax.lax.broadcasted_iota(jnp.int32, (PH8, 128), 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (PH8, 128), 1)
        in_patch = (row_i < ph) & (col_i < pw)

        cps = {i: start(i) for i in range(D - 1)}
        quad = None
        for i in range(G):
            if i + D - 1 < G:
                cps[i + D - 1] = start(i + D - 1)
            cps[i].wait()
            r = rcbuf[0, i]
            c = rcbuf[0, G + i]
            rq = (r // 8) * 8
            cq = (c // 128) * 128
            buf = bufs.at[i % D]
            v = jax.lax.switch(
                r - rq,
                [lambda j=j, b=buf: b[j : j + PH8, :] for j in range(8)],
            )
            # roll on the full 256-lane buffer: the patch may straddle the
            # first 128-lane group when the column phase exceeds 128-pw
            v = pltpu.roll(v, (256 - (c - cq)) % 256, 1)[:, :128]
            v = jnp.where(in_patch, v, 0)
            slot = i % 4
            v = pltpu.roll(v, 32 * slot, 1) if slot else v
            quad = v if slot == 0 else quad + v
            if slot == 3:
                q = i // 4
                pbuf[q * PH8 : (q + 1) * PH8, :] = quad

        cp_out = pltpu.make_async_copy(
            pbuf, out_hbm.at[pl.ds(g * (G // 4) * PH8, (G // 4) * PH8), :],
            sem_out,
        )
        cp_out.start()
        cp_out.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            # coord rows are 128 lanes wide: narrower HBM->SMEM DMAs
            # crash the Mosaic compile helper
            pltpu.SMEM((1, 128), jnp.int32),
            pltpu.VMEM((D, rows, 256), jnp.int32),
            pltpu.VMEM(((G // 4) * PH8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((D,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n // 4 * PH8, 128), jnp.int32),
        interpret=interpret,
    )

    def run(canvas_pad, r, c):
        # (n//G, 128) rows: [r_0..r_7, c_0..c_7, 0...] per grid step
        # (128 lanes: narrower HBM->SMEM DMAs crash the compile helper)
        rc = jnp.concatenate(
            [
                r.reshape(-1, G),
                c.reshape(-1, G),
                jnp.zeros((n // G, 128 - 2 * G), jnp.int32),
            ],
            axis=1,
        ).astype(jnp.int32)
        raw = call(rc, canvas_pad)                   # (n/4*PH8, 128)
        raw = raw.reshape(n // 4, PH8, 4, 32)
        raw = jnp.transpose(raw, (0, 2, 1, 3))       # (n/4, 4, PH8, 32)
        raw = raw.reshape(n, PH8, 32)[:, :ph, :pw]
        return raw.reshape(n, ph * pw)

    return jax.jit(run), (rows, ph * pw)


def pad_canvas_for_patchify(canvas, win_h):
    """Zero-pad a canvas so per-window aligned DMAs stay in bounds."""
    ph = win_h + 1
    rows = -(-(ph + 8) // 8) * 8
    H, W = canvas.shape
    HP = -(-(H + rows) // 8) * 8
    WP = -(-(W + 256) // 128) * 128
    return jnp.pad(canvas, ((0, HP - H), (0, WP - W)))
