"""Feature catalogs + evaluators vs reference goldens and invariants.

Golden files under tests/golden/ were produced by oracle/dump_features.cpp,
which links the *reference* library and dumps its generated catalogs and
evaluator responses (see oracle/Makefile)."""

import gzip
import os

import numpy as np
import pytest

import jax.numpy as jnp

from cascadeclassifier_tpu.ops.features import (
    eval_haar,
    eval_hog,
    eval_lbp,
    haar_catalog,
    hog_catalog,
    hog_integral_histogram,
    lbp_catalog,
)
from cascadeclassifier_tpu.ops.integral import (
    integral_image,
    integral_sq,
    integral_tilted,
    window_norm_factor,
)


def _read_golden(golden_dir, name):
    with gzip.open(os.path.join(golden_dir, name), "rt") as f:
        return f.read().split("\n")


def _load_geom(golden_dir, name):
    lines = _read_golden(golden_dir, name)
    count = int(lines[0].split()[1])
    rows = [l.split() for l in lines[1:] if l]
    return count, rows


def _load_imgs(golden_dir, name, h, w):
    v = np.array(
        [int(x) for l in _read_golden(golden_dir, name) for x in l.split()],
        np.int32,
    )
    return v.reshape(4, h, w).astype(np.uint8)


def _load_resp(golden_dir, name, var_count):
    lines = [l for l in _read_golden(golden_dir, name) if l]
    vals = np.array(lines[1:], np.float64)
    return vals.reshape(4, var_count)


# ---------------------------------------------------------------- catalogs


@pytest.mark.parametrize("mode", ["BASIC", "CORE", "ALL"])
def test_haar_catalog_matches_reference(golden_dir, mode):
    count, rows = _load_geom(golden_dir, f"geom_haar_12x10_{mode}.txt.gz")
    cat = haar_catalog(12, 10, mode)
    assert len(cat) == count
    ref = np.array([[float(v) for v in r[2:]] for r in rows]).reshape(-1, 3, 5)
    ref_tilt = np.array([int(r[1]) for r in rows], bool)
    np.testing.assert_array_equal(cat.tilted, ref_tilt)
    np.testing.assert_array_equal(cat.rects, ref[:, :, :4].astype(np.int32))
    np.testing.assert_array_equal(cat.weights, ref[:, :, 4].astype(np.float32))


def test_lbp_catalog_matches_reference(golden_dir):
    for name, (w, h) in [("geom_lbp_12x10.txt.gz", (12, 10)),
                         ("geom_lbp_9x7.txt.gz", (9, 7))]:
        count, rows = _load_geom(golden_dir, name)
        cat = lbp_catalog(w, h)
        assert len(cat) == count
        ref = np.array([[int(v) for v in r[1:]] for r in rows], np.int32)
        np.testing.assert_array_equal(cat.rects, ref)


def test_hog_catalog_matches_reference(golden_dir):
    count, rows = _load_geom(golden_dir, "geom_hog_20x16.txt.gz")
    cat = hog_catalog(20, 16)
    assert len(cat) == count
    ref = np.array([[int(v) for v in r[1:]] for r in rows], np.int32)
    np.testing.assert_array_equal(cat.rects, ref)


def test_catalog_counts_75x32():
    """Deterministic counts from the reference res/README.md transcripts."""
    assert len(lbp_catalog(75, 32)) == 152_625
    assert len(haar_catalog(75, 32, "BASIC")) == 2_790_554


def test_catalog_count_24x24_basic():
    assert len(haar_catalog(24, 24, "BASIC")) == 162_336
    assert len(lbp_catalog(24, 24)) == 8_464


# ---------------------------------------------------------------- responses


@pytest.mark.parametrize("mode", ["BASIC", "ALL"])
def test_haar_responses_match_reference(golden_dir, mode):
    w, h = 12, 10
    cat = haar_catalog(w, h, mode)
    imgs = _load_imgs(golden_dir, f"img_haar_12x10_{mode}.txt.gz", h, w)
    ref = _load_resp(golden_dir, f"resp_haar_12x10_{mode}.txt.gz", len(cat))
    s = integral_image(jnp.asarray(imgs))
    sq = integral_sq(jnp.asarray(imgs), dtype=jnp.int32)
    nf = window_norm_factor(s, sq)
    tilt = integral_tilted(jnp.asarray(imgs)) if mode == "ALL" else None
    resp = eval_haar(
        s.reshape(4, -1),
        tilt.reshape(4, -1) if tilt is not None else None,
        nf,
        jnp.asarray(cat.corner_offsets()),
        jnp.asarray(cat.weights),
        jnp.asarray(cat.tilted) if mode == "ALL" else None,
    )
    np.testing.assert_allclose(np.asarray(resp), ref, rtol=2e-5, atol=1e-6)


def test_lbp_responses_match_reference(golden_dir):
    w, h = 12, 10
    cat = lbp_catalog(w, h)
    imgs = _load_imgs(golden_dir, "img_lbp_12x10.txt.gz", h, w)
    ref = _load_resp(golden_dir, "resp_lbp_12x10.txt.gz", len(cat))
    s = integral_image(jnp.asarray(imgs))
    codes = np.asarray(eval_lbp(s.reshape(4, -1), jnp.asarray(cat.cell_offsets())))
    np.testing.assert_array_equal(codes.astype(np.float64), ref)


def test_hog_responses_match_reference(golden_dir):
    w, h = 20, 16
    cat = hog_catalog(w, h)
    imgs = _load_imgs(golden_dir, "img_hog_20x16.txt.gz", h, w)
    ref = _load_resp(golden_dir, "resp_hog_20x16.txt.gz", cat.var_count)
    hist, norm = hog_integral_histogram(jnp.asarray(imgs))
    resp = np.asarray(
        eval_hog(
            hist.reshape(4, 9, -1),
            norm.reshape(4, -1),
            jnp.asarray(cat.cell_corner_offsets()),
        )
    )
    np.testing.assert_allclose(resp, ref, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- invariants


def test_haar_zero_on_constant_image():
    """Reference semantic: Haar responses are 0 on a constant image
    (normfactor==0 short-circuit and exact rect cancellation)."""
    cat = haar_catalog(12, 10, "BASIC")
    img = np.full((1, 10, 12), 153, np.uint8)
    s = integral_image(jnp.asarray(img))
    sq = integral_sq(jnp.asarray(img), dtype=jnp.int32)
    nf = window_norm_factor(s, sq)
    resp = np.asarray(
        eval_haar(
            s.reshape(1, -1), None, nf,
            jnp.asarray(cat.corner_offsets()), jnp.asarray(cat.weights), None,
        )
    )
    assert np.all(resp == 0.0)


def test_lbp_255_on_constant_image():
    """Reference semantic: all neighbour sums equal the center → code 255."""
    cat = lbp_catalog(12, 10)
    img = np.full((1, 10, 12), 7, np.uint8)
    s = integral_image(jnp.asarray(img))
    codes = np.asarray(eval_lbp(s.reshape(1, -1), jnp.asarray(cat.cell_offsets())))
    assert np.all(codes == 255)


def test_hog_empty_for_small_window():
    """HOG features require cell size ≥ 8, block 16×16 (HOGfeatures.cpp:73)."""
    assert len(hog_catalog(15, 15)) == 0
    assert len(hog_catalog(16, 16)) == 1
    assert len(hog_catalog(32, 32)) == 36
