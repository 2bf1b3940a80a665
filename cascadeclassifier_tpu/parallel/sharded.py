"""Multi-chip sharding for training and detection.

The reference is strictly single-process (SURVEY §2.6); scaling is a new,
first-class subsystem here, built on `jax.sharding` + `shard_map`:

  - **feature-axis sharding** (tensor-parallel analogue): each device owns a
    shard of the feature catalog; the weighted split search runs on local
    shards and the global best split is an all-gather of per-shard
    (quality, var, payload) triples + replicated argmin-by-(−q, var) — the
    moral equivalent of the reference's serial loop over features
    (o_cvdtree.cpp:345) at ICI bandwidth
  - **sample/batch sharding** (data-parallel analogue): evaluator matmuls
    and weight statistics shard over samples with `psum` reductions
  - multi-host runs reuse the same mesh via jax.distributed (DCN)

Collectives ride the mesh; no point-to-point code. Works on any backend,
including the N-virtual-device CPU mesh used in tests.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cascadeclassifier_tpu.train.boost import FLT_EPSILON, as_f64  # noqa: F401


def make_mesh(n_devices: int | None = None, axis: str = "feat") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_features(mesh: Mesh, values, sort_idx=None, axis: str = "feat"):
    """Place (F, N) feature arrays with F sharded across the mesh."""
    sh = NamedSharding(mesh, P(axis, None))
    v = jax.device_put(values, sh)
    si = jax.device_put(sort_idx, sh) if sort_idx is not None else None
    return v, si


def _local_ordered_best(values, sort_idx, w, resp, mask):
    """Per-shard best ordered split: (quality, local_idx, threshold).

    Same math as train/boost._ordered_split_block, but returning the
    shard-local argmax for the collective combine."""
    with jax.enable_x64(True):
        wm = jnp.where(mask, w, 0.0)
        rm = wm * resp
        vs = jnp.take_along_axis(values, sort_idx, axis=1)
        ws = wm[sort_idx]
        rs = rm[sort_idx]
        kept = mask[sort_idx]
        total_w = jnp.sum(wm)
        total_r = jnp.sum(rm)
        lw = jnp.cumsum(ws, axis=1)
        lr = jnp.cumsum(rs, axis=1)
        rw = total_w - lw
        rr = total_r - lr
        vk = jnp.where(kept, vs, jnp.inf)
        nxt = jnp.flip(jax.lax.cummin(jnp.flip(vk, axis=1), axis=1), axis=1)
        nxt = jnp.concatenate(
            [nxt[:, 1:], jnp.full((vs.shape[0], 1), jnp.inf)], axis=1
        )
        valid = kept & (vs + 2 * FLT_EPSILON < nxt) & jnp.isfinite(nxt)
        qual = (lr * lr * rw + rr * rr * lw) / (lw * rw)
        qual = jnp.where(valid & (lw > 0) & (rw > 0), qual, -jnp.inf)

        bq_row = jnp.max(qual, axis=1)
        posn = jax.lax.broadcasted_iota(jnp.int32, qual.shape, 1)
        brow = jnp.min(
            jnp.where(qual == bq_row[:, None], posn, qual.shape[1]), axis=1
        )
        brow = jnp.minimum(brow, qual.shape[1] - 1)

        bq = jnp.max(bq_row)
        fpos = jax.lax.broadcasted_iota(jnp.int32, bq_row.shape, 0)
        bf = jnp.min(jnp.where(bq_row == bq, fpos, bq_row.shape[0]))
        bf = jnp.minimum(bf, bq_row.shape[0] - 1)

        bi = brow[bf]
        bv = vs[bf, bi].astype(jnp.float32)
        bn = nxt[bf, bi].astype(jnp.float32)
        thr = (bv + bn) * np.float32(0.5)
    return bq, bf, thr


def sharded_ordered_best_split(mesh: Mesh, axis: str = "feat"):
    """Returns a jitted fn(values, sort_idx, w, resp, mask) →
    (quality f64, global_var i32, threshold f32) with values/sort_idx
    feature-sharded over `mesh`. The combine all-gathers one triple per
    device and picks max quality (ties → lowest global feature index, the
    reference's ascending-var scan order)."""

    def inner(values, sort_idx, w, resp, mask):
        nshards = jax.lax.axis_size(axis)
        shard = jax.lax.axis_index(axis)
        f_local = values.shape[0]
        bq, bf, thr = _local_ordered_best(values, sort_idx, w, resp, mask)
        gvar = shard * f_local + bf
        qs = jax.lax.all_gather(bq, axis)  # (S,)
        vs_ = jax.lax.all_gather(gvar, axis)
        ts = jax.lax.all_gather(thr, axis)
        qmax = jnp.max(qs)
        cand = jnp.where(qs == qmax, vs_, jnp.iinfo(jnp.int32).max)
        gbest = jnp.min(cand)
        sel = jnp.argmin(jnp.where(vs_ == gbest, 0, 1))
        return qmax, gbest, ts[sel]

    fn = jax.jit(
        shard_map(
            inner,
            mesh=mesh,
            in_specs=(P(axis, None), P(axis, None), P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_rep=False,
        )
    )

    def call(values, sort_idx, w, resp, mask):
        # keep float64 w/resp across the jit boundary (canonicalization
        # would truncate them under the global 32-bit default)
        with jax.enable_x64(True):
            return fn(values, sort_idx, w, resp, mask)

    return call


def sharded_batch_eval(mesh: Mesh, axis: str = "data"):
    """Data-parallel evaluator matmul: corner matrix replicated, integral
    rows sharded over samples; also returns a psum'd per-feature weighted
    response accumulation as the histogram-allreduce pattern."""

    def inner(corner_m, sum_rows, w):
        vals = jnp.dot(
            corner_m, sum_rows.T, precision=jax.lax.Precision.HIGHEST
        )  # (F, N_local)
        wsum = jax.lax.psum(jnp.dot(vals, w), axis)  # (F,) over all samples
        return vals, wsum

    fn = shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis)),
        out_specs=(P(None, axis), P()),
        check_rep=False,
    )
    return jax.jit(fn)
