"""Bit-exact INTER_LINEAR_EXACT resize replication."""

import numpy as np
import pytest

import jax.numpy as jnp

from cascadeclassifier_tpu.ops.resize import (
    resize_linear_exact,
    resize_linear_exact_np,
)

cv2 = pytest.importorskip("cv2")

CASES = [
    (640, 480, 581, 436),
    (640, 480, 320, 240),
    (24, 24, 17, 17),
    (33, 17, 20, 11),
    (7, 7, 13, 19),
    (1, 1, 5, 5),
    (100, 80, 640, 480),
]


@pytest.mark.parametrize("sw,sh,dw,dh", CASES)
def test_resize_bit_exact_vs_cv2(sw, sh, dw, dh):
    rng = np.random.default_rng(sw * 7 + dh)
    src = rng.integers(0, 256, (sh, sw)).astype(np.uint8)
    ref = cv2.resize(src, (dw, dh), interpolation=cv2.INTER_LINEAR_EXACT)
    out_np = resize_linear_exact_np(src, dw, dh)
    np.testing.assert_array_equal(out_np, ref)
    out_jax = np.asarray(resize_linear_exact(jnp.asarray(src), dw, dh))
    np.testing.assert_array_equal(out_jax, ref)


def test_resize_batched():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, (3, 40, 30)).astype(np.uint8)
    out = np.asarray(resize_linear_exact(jnp.asarray(src), 17, 21))
    for i in range(3):
        ref = cv2.resize(src[i], (17, 21), interpolation=cv2.INTER_LINEAR_EXACT)
        np.testing.assert_array_equal(out[i], ref)


def test_resize_identity():
    src = np.arange(12, dtype=np.uint8).reshape(3, 4)
    np.testing.assert_array_equal(resize_linear_exact_np(src, 4, 3), src)
