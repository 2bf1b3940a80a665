"""Sharded training step on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cascadeclassifier_tpu.parallel.sharded import (
    make_mesh,
    shard_features,
    sharded_batch_eval,
    sharded_ordered_best_split,
)
from cascadeclassifier_tpu.train.boost import _ordered_split_block, as_f64

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_8
def test_sharded_split_matches_single_device():
    rng = np.random.default_rng(0)
    f, n = 64, 96
    values = rng.normal(size=(f, n)).astype(np.float32)
    sort_idx = np.argsort(values, axis=1).astype(np.int32)
    w = rng.uniform(0.1, 1, n)
    w /= w.sum()
    resp = rng.choice([-1.0, 1.0], n)
    mask = np.ones(n, bool)

    q, thr = _ordered_split_block(
        jnp.asarray(values), jnp.asarray(sort_idx), as_f64(w), as_f64(resp),
        jnp.asarray(mask),
    )
    q, thr = np.asarray(q), np.asarray(thr)
    ref_var = int(np.argmax(q))

    mesh = make_mesh(8)
    vs, si = shard_features(mesh, values, sort_idx)
    fn = sharded_ordered_best_split(mesh)
    gq, gvar, gthr = jax.device_get(
        fn(vs, si, as_f64(w), as_f64(resp), jnp.asarray(mask))
    )
    assert int(gvar) == ref_var
    assert float(gq) == pytest.approx(float(q[ref_var]), rel=1e-12)
    assert float(gthr) == pytest.approx(float(thr[ref_var]), abs=1e-6)


@needs_8
def test_sharded_batch_eval_psum():
    rng = np.random.default_rng(1)
    p_len, b = 128, 64
    corner_m = rng.normal(size=(32, p_len)).astype(np.float32)
    sum_rows = rng.normal(size=(b, p_len)).astype(np.float32)
    wts = np.full(b, 1.0 / b, np.float32)
    mesh = make_mesh(8, axis="data")
    from jax.sharding import NamedSharding, PartitionSpec as P

    sr = jax.device_put(sum_rows, NamedSharding(mesh, P("data", None)))
    wv = jax.device_put(wts, NamedSharding(mesh, P("data")))
    vals, wsum = jax.device_get(
        sharded_batch_eval(mesh)(jnp.asarray(corner_m), sr, wv)
    )
    ref = corner_m @ sum_rows.T @ wts
    np.testing.assert_allclose(wsum, ref, rtol=1e-4)
    np.testing.assert_allclose(vals, corner_m @ sum_rows.T, rtol=1e-4)


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    if len(jax.devices()) >= 8:
        g.dryrun_multichip(8)
    fn, args = g.entry()
    r = jax.jit(fn)(*args)
    assert int(r) >= 0
