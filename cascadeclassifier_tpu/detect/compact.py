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


def _pack_tail(stages, stage_ids, win_w, win_h):
    """Corner-incidence matrices + per-tree params for the MXU tail."""
    P = (win_h + 1) * (win_w + 1)
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
    stride = win_w + 1
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
    a_sum, a_tilt, wts, (thr, ll, rr), bounds, sthr = _pack_tail(
        packed.stages, stage_ids, packed.win_w, packed.win_h
    )
    a_sum_j = jnp.asarray(a_sum, jnp.bfloat16)
    a_tilt_j = None if a_tilt is None else jnp.asarray(a_tilt, jnp.bfloat16)
    w_j = jnp.asarray(wts)
    thr_j = jnp.asarray(thr)
    ll_j = jnp.asarray(ll)
    rr_j = jnp.asarray(rr)
    T = len(thr)

    def tail(patch_sum, patch_tilt, inv):
        rs = _exact_int_matmul(a_sum_j, patch_sum)  # (3T, N)
        if a_tilt_j is not None:
            rs = rs + _exact_int_matmul(a_tilt_j, patch_tilt)
        rs = rs.reshape(T, 3, -1).astype(jnp.float32)
        # rect-ordered f32 accumulation, matching dense_stage_haar
        raw = rs[:, 0] * w_j[:, 0:1]
        raw = raw + rs[:, 1] * w_j[:, 1:2]
        raw = raw + rs[:, 2] * w_j[:, 2:3]
        val = raw * inv[None, :]
        acc_dt = jnp.float64 if exact else jnp.float32
        leaf = jnp.where(
            val < thr_j[:, None], ll_j[:, None].astype(acc_dt),
            rr_j[:, None].astype(acc_dt),
        )
        alive = jnp.ones(patch_sum.shape[0], bool)
        for k, si in enumerate(stage_ids):
            ssum = jnp.sum(leaf[bounds[k] : bounds[k + 1]], axis=0)
            alive = alive & (ssum >= acc_dt(sthr[k]))
        return alive

    if exact:
        def tail_x64(patch_sum, patch_tilt, inv):
            with jax.enable_x64(True):
                return tail(patch_sum, patch_tilt, inv)

        return jax.jit(tail_x64)
    return jax.jit(tail)


def make_patchify_fn(win_w, win_h, need_tilt):
    """fn(sum2d, tilt2d, r (N,), c (N,)) -> ((N,P) i32, (N,P) i32|None)"""
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
