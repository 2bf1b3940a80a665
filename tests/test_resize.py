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


def test_axis_tab_dev_matches_host_tables():
    """The device table math (integer round-half-even) must reproduce
    ops.resize._axis_tab's Fraction arithmetic value-for-value."""
    import numpy as np

    from cascadeclassifier_tpu.ops.resize import _axis_tab, _axis_tab_dev

    for ssz in (1, 2, 3, 24, 97, 480, 1080, 1920):
        for dsz in (1, 2, 17, 24, 333, 479, 1081):
            sx_h, c_h = _axis_tab(ssz, dsz)
            sx_d, sx1_d, c_d = (
                np.asarray(t) for t in _axis_tab_dev(ssz, ssz, dsz, 0, dsz)
            )
            np.testing.assert_array_equal(sx_d, sx_h)
            np.testing.assert_array_equal(c_d, c_h)
            np.testing.assert_array_equal(
                sx1_d, np.minimum(sx_h + 1, ssz - 1)
            )


def test_build_level_stack_matches_host_resize():
    """build_level_stack (device mining-level builder) must emit the
    origin-shifted resize_linear_exact_np result byte-for-byte, zeros
    past the level bounds, for padded sources and cropped slots."""
    import numpy as np

    from cascadeclassifier_tpu.ops.resize import (
        build_level_stack,
        resize_linear_exact_np,
    )

    rng = np.random.default_rng(11)
    hp, wp = 96, 192
    cases = [
        # (sh, sw, dh, dw, oy, ox)
        (100, 140, 71, 99, 5, 3),     # downscale, off origin
        (60, 80, 120, 160, 0, 0),     # upscale fills + crops the slot
        (97, 131, 97, 131, 13, 7),    # identity-size with shift
        (40, 60, 30, 45, 2, 40),      # narrow level, wide zero margin
    ]
    L = len(cases)
    hs_pad, ws_pad = 128, 160
    src = np.zeros((L, hs_pad, ws_pad), np.uint8)
    params = np.zeros((6, L), np.int32)
    for i, (sh, sw, dh, dw, oy, ox) in enumerate(cases):
        src[i, :sh, :sw] = rng.integers(0, 256, (sh, sw), np.uint8)
        params[:, i] = (sh, sw, dh, dw, oy, ox)
    out = np.asarray(build_level_stack(src, params, hp=hp, wp=wp))
    for i, (sh, sw, dh, dw, oy, ox) in enumerate(cases):
        ref_full = resize_linear_exact_np(src[i, :sh, :sw], dw, dh)
        ref = np.zeros((hp, wp), np.uint8)
        ch = min(dh - oy, hp)
        cw = min(dw - ox, wp)
        ref[:ch, :cw] = ref_full[oy : oy + ch, ox : ox + cw]
        np.testing.assert_array_equal(out[i], ref)
