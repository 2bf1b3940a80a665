"""TPU detector vs the independent OpenCV C++ runtime (parity oracle).

The reference's detection path is OpenCV's detectMultiScale
(tools/detection/Cpp/main.cpp:42-49); these tests assert raw-window and
grouped-detection parity of our fused TPU pipeline against it."""

import os
import subprocess

import numpy as np
import pytest

from cascadeclassifier_tpu.detect.detector import TPUDetector
from cascadeclassifier_tpu.detect.grouping import group_rectangles
from cascadeclassifier_tpu.models.xml_io import read_cascade_xml

from .utils_synth import face_blob_image

HAAR_ALT = "/usr/share/opencv4/haarcascades/haarcascade_frontalface_alt.xml"
LBP_FRONTAL = "/usr/share/opencv4/lbpcascades/lbpcascade_frontalface.xml"

cv2 = pytest.importorskip("cv2")


def _oracle(oracle_bin, xml, img, tmp_path, sf="1.1", mn="0"):
    p = str(tmp_path / "oracle_img.png")
    cv2.imwrite(p, img)
    r = subprocess.run(
        [oracle_bin, xml, p, sf, mn], capture_output=True, text=True
    )
    assert "LOADED" in r.stdout
    return sorted(
        tuple(map(int, l.split())) for l in r.stdout.splitlines()[1:]
    )


@pytest.fixture(scope="module")
def face_img():
    return face_blob_image(320, 240, n=8, seed=3)


@pytest.mark.slow
def test_haar_raw_window_parity(oracle_bin, tmp_path, face_img):
    m = read_cascade_xml(HAAR_ALT)
    det = TPUDetector(m)
    ours = sorted(map(tuple, det.detect_multi_scale(face_img, 1.1, 0)))
    ref = _oracle(oracle_bin, HAAR_ALT, face_img, tmp_path)
    assert ours == ref


@pytest.mark.slow
def test_haar_grouped_parity(oracle_bin, tmp_path, face_img):
    m = read_cascade_xml(HAAR_ALT)
    det = TPUDetector(m)
    ours = sorted(map(tuple, det.detect_multi_scale(face_img, 1.1, 2)))
    ref = _oracle(oracle_bin, HAAR_ALT, face_img, tmp_path, mn="2")
    assert ours == ref


@pytest.mark.slow
def test_haar_parity_random_textures(oracle_bin, tmp_path):
    """Random blurred textures exercise knife-edge windows."""
    m = read_cascade_xml(HAAR_ALT)
    det = TPUDetector(m)
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (200, 260)).astype(np.uint8)
    img = cv2.GaussianBlur(img, (7, 7), 2.0)
    ours = sorted(map(tuple, det.detect_multi_scale(img, 1.2, 0)))
    ref = _oracle(oracle_bin, HAAR_ALT, img, tmp_path, sf="1.2")
    assert ours == ref


@pytest.mark.slow
def test_lbp_raw_window_parity(oracle_bin, tmp_path, face_img):
    m = read_cascade_xml(LBP_FRONTAL)
    det = TPUDetector(m)
    ours = sorted(map(tuple, det.detect_multi_scale(face_img, 1.1, 0)))
    ref = _oracle(oracle_bin, LBP_FRONTAL, face_img, tmp_path)
    assert ours == ref


def test_static_front_matches_dense(tmp_path):
    """The statically-unrolled Pallas front (interpret mode) is
    bit-identical to the XLA dense f32 path over stages 1..3."""
    import jax.numpy as jnp

    from cascadeclassifier_tpu.detect.compact import pad_canvas_for_patchify
    from cascadeclassifier_tpu.detect.dense import (
        dense_stage_haar,
        dense_variance_gate,
    )
    from cascadeclassifier_tpu.detect.detector import (
        PackedCascade,
        _build_canvas,
        _resize_matrices,
        plan_tables,
    )
    from cascadeclassifier_tpu.detect.pallas_front import (
        make_static_front_fn,
    )
    from cascadeclassifier_tpu.detect.pyramid import build_plan

    m = read_cascade_xml(HAAR_ALT)
    packed = PackedCascade.from_model(m)
    rng = np.random.default_rng(5)
    w, h = 160, 120
    img = rng.integers(0, 256, (h, w)).astype(np.uint8)
    plan = build_plan(w, h, packed.win_w, packed.win_h, 1.1, None, None)
    tab = plan_tables(plan)
    sum2d, sq2d, _ = _build_canvas(
        jnp.asarray(img), tab, w, h, need_sq=True,
        resize_mats=_resize_matrices(plan),
    )
    out_h = plan.canvas_h - packed.win_h
    out_w = plan.canvas_w - packed.win_w
    gate, inv_nf = dense_variance_gate(
        sum2d, sq2d, packed.win_w, packed.win_h, out_h, out_w
    )
    ref = gate
    for si in (1, 2, 3):
        st = packed.stages[si]
        ref = ref & (
            dense_stage_haar(
                sum2d, sum2d, st, out_h, out_w, inv_nf, exact=False
            )
            >= jnp.float32(st.threshold)
        )
    fn, (hp, wp, hh, hw) = make_static_front_fn(
        packed.stages, [1, 2, 3], packed.win_w, packed.win_h,
        plan.canvas_h, plan.canvas_w, 64, 128, interpret=True,
    )
    sum_pad = pad_canvas_for_patchify(
        sum2d, packed.win_h, hp + hh, wp + hw
    )
    inv_pad = jnp.ones((hp, wp), jnp.float32).at[:out_h, :out_w].set(inv_nf)
    alive = (
        jnp.zeros((hp, wp), jnp.int8)
        .at[:out_h, :out_w]
        .set(gate.astype(jnp.int8))
    )
    got = np.asarray(fn(sum_pad, inv_pad, alive))[:out_h, :out_w] != 0
    refn = np.asarray(ref)
    assert refn.sum() > 1000  # non-vacuous
    np.testing.assert_array_equal(got, refn)


def test_visit_set_matches_oracle_exactly(oracle_bin, tmp_path):
    """Pin the exact window visit-set + output mapping of the OpenCV 4.x
    invoker (pure numpy vs an always-pass cascade run through the C++
    oracle — no detector compile):

      - nstripes = cvCeil(szw0.width/32.); y < min(nstripes·stripeSize,
        prH) with stripeSize = max(ceil((prH//ystep)/nstripes),1)·ystep —
        stripe OVERSHOOT visits the last odd grid row iff nstripes does
        not divide prH//ystep (cascadedetect.cpp invoker geometry)
      - x < prW stepped by ystep
      - output rect = cvRound(x·scale) with FLOAT32 multiplies (ScaleData
        ::scale is float; 50·1.21f == 60.5f rounds to even 60), box =
        cvRound(origWin·scale_f32), clipped per-axis to image bounds
    """
    import dataclasses
    from collections import Counter

    from cascadeclassifier_tpu.detect.pyramid import build_plan
    from cascadeclassifier_tpu.models.xml_io import write_cascade_xml

    m = read_cascade_xml(HAAR_ALT)
    st0 = dataclasses.replace(m.stages[0], threshold=-1e6)
    mp = dataclasses.replace(m, stages=[st0])
    tpath = str(tmp_path / "pass.xml")
    write_cascade_xml(mp, tpath)
    rng = np.random.default_rng(7)
    for (w, h) in [(137, 101), (64, 55), (200, 173)]:
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        ref = Counter(map(tuple, _oracle(oracle_bin, tpath, img, tmp_path)))
        plan = build_plan(w, h, 20, 20, 1.1, None, None)
        mine = Counter()
        for s in range(len(plan.scales)):
            sc = np.float32(plan.scales[s])
            step = int(plan.ystep[s])
            t = int(plan.block_top[s])
            h_s, w_s = int(plan.scaled_h[s]), int(plan.scaled_w[s])
            if w_s < 20 or h_s < 20:
                continue
            bw, bh = int(plan.box_w[s]), int(plan.box_h[s])
            for yc in np.nonzero(plan.row_is_grid[t : t + h_s + 1])[0]:
                for xc in range(0, w_s + 1 - 20, step):
                    xi = int(np.rint(np.float32(xc) * sc))
                    yi = int(np.rint(np.float32(yc) * sc))
                    mine[(xi, yi, min(bw, w - xi), min(bh, h - yi))] += 1
        assert mine == ref, (w, h)


@pytest.mark.slow
def test_variance_gate_rejects_flat_regions():
    m = read_cascade_xml(HAAR_ALT)
    det = TPUDetector(m)
    flat = np.full((100, 120), 90, np.uint8)
    assert len(det.detect_multi_scale(flat, 1.1, 0)) == 0


@pytest.mark.slow
def test_min_size_filter(oracle_bin, tmp_path, face_img):
    m = read_cascade_xml(HAAR_ALT)
    det = TPUDetector(m)
    ours = sorted(
        map(tuple, det.detect_multi_scale(face_img, 1.1, 0, min_size=(40, 40)))
    )
    p = str(tmp_path / "oracle_img.png")
    cv2.imwrite(p, face_img)
    r = subprocess.run(
        [oracle_bin, HAAR_ALT, p, "1.1", "0", "40", "40"],
        capture_output=True,
        text=True,
    )
    ref = sorted(tuple(map(int, l.split())) for l in r.stdout.splitlines()[1:])
    assert ours == ref


def test_group_rectangles_semantics():
    # three nearly identical rects + one outlier; threshold 2 keeps the
    # averaged cluster only
    rects = [(10, 10, 50, 50), (12, 11, 50, 50), (9, 10, 51, 50), (200, 200, 40, 40)]
    out = group_rectangles(rects, 2)
    assert out.shape == (1, 4)
    assert abs(out[0][0] - 10) <= 1 and abs(out[0][2] - 50) <= 1
    # threshold 0 → unchanged
    out0 = group_rectangles(rects, 0)
    assert len(out0) == 4


@pytest.mark.slow
def test_deep_tree_parity(oracle_bin, tmp_path, face_img):
    """Depth-2 weak trees (predictOrdered path in the OpenCV runtime)."""
    from cascadeclassifier_tpu.models.model import (
        CascadeModel,
        HaarFeature,
        Stage,
        WeakTree,
    )
    from cascadeclassifier_tpu.models.xml_io import write_cascade_xml

    # two depth-2 trees over simple edge features
    t1 = WeakTree(
        left=np.array([1, 0, -1], np.int32),
        right=np.array([2, -2, -3], np.int32),
        feature_idx=np.array([0, 1, 2], np.int32),
        threshold=np.array([0.01, -0.05, 0.03], np.float32),
        leaf_values=np.array([0.9, -0.8, 0.7, -0.6], np.float32),
    )
    t2 = WeakTree(
        left=np.array([0, ], np.int32),
        right=np.array([-1, ], np.int32),
        feature_idx=np.array([1], np.int32),
        threshold=np.array([0.0], np.float32),
        leaf_values=np.array([0.5, -0.5], np.float32),
    )
    m = CascadeModel(
        feature_type=0,
        width=20,
        height=20,
        stages=[Stage(threshold=0.2, trees=[t1, t2])],
        features=[
            HaarFeature(rects=[(2, 2, 8, 8, -1.0), (2, 2, 4, 8, 2.0)]),
            HaarFeature(rects=[(4, 4, 12, 6, -1.0), (4, 7, 12, 3, 2.0)]),
            HaarFeature(rects=[(0, 0, 20, 20, -1.0), (5, 5, 10, 10, 4.0)]),
        ],
        max_depth=2,
    )
    xml = str(tmp_path / "deep.xml")
    write_cascade_xml(m, xml)
    det = TPUDetector(m)
    ours = sorted(map(tuple, det.detect_multi_scale(face_img, 1.2, 0)))
    ref = _oracle(oracle_bin, xml, face_img, tmp_path, sf="1.2")
    assert len(ref) > 0  # non-vacuous
    assert ours == ref


@pytest.mark.slow
def test_tilted_cascade_parity(oracle_bin, tmp_path, face_img):
    """ALL-mode Haar cascade with tilted features + deep trees
    (haarcascade_eye_tree_eyeglasses ships both)."""
    xml = "/usr/share/opencv4/haarcascades/haarcascade_eye_tree_eyeglasses.xml"
    if not os.path.exists(xml):
        pytest.skip("pretrained tilted cascade missing")
    m = read_cascade_xml(xml)
    assert m.uses_tilted()
    rng = np.random.default_rng(4)
    img = cv2.GaussianBlur(
        rng.integers(0, 256, (240, 320)).astype(np.uint8), (9, 9), 3
    )
    det = TPUDetector(m)
    ours = sorted(map(tuple, det.detect_multi_scale(img, 1.05, 0)))
    ref = _oracle(oracle_bin, xml, img, tmp_path, sf="1.05")
    assert len(ref) > 0
    assert ours == ref


@pytest.mark.slow
def test_pallas_engine_matches_xla(face_img):
    """The Pallas tiled kernel (interpret mode on CPU) must reproduce the
    XLA dense path exactly."""
    m = read_cascade_xml(HAAR_ALT)
    xla = TPUDetector(m, exact=False, engine="xla")
    pal = TPUDetector(m, exact=False, engine="pallas", pallas_interpret=True)
    a = sorted(map(tuple, xla.detect_multi_scale(face_img, 1.2, 0)))
    b = sorted(map(tuple, pal.detect_multi_scale(face_img, 1.2, 0)))
    assert a == b and len(a) > 0


@pytest.mark.slow
def test_compact_engine_matches_xla(face_img):
    """The survivor-compaction engine (dense front + MXU limb-matmul tail)
    must reproduce the XLA dense path exactly, in both precision modes."""
    m = read_cascade_xml(HAAR_ALT)
    for exact in (True, False):
        xla = TPUDetector(m, exact=exact, engine="xla")
        cmp_ = TPUDetector(m, exact=exact, engine="compact")
        # small trigger forces the tail path even on a small test image
        cmp_.trigger_n = 1 << 12
        cmp_.compact_batch = 1 << 10
        a = sorted(map(tuple, xla.detect_multi_scale(face_img, 1.2, 0)))
        b = sorted(map(tuple, cmp_.detect_multi_scale(face_img, 1.2, 0)))
        assert a == b and len(a) > 0


def test_pallas_patchify_interpret():
    """The pallas patch extractor must reproduce vmap'd dynamic_slice."""
    import jax.numpy as jnp
    from cascadeclassifier_tpu.detect.compact import (
        make_pallas_patchify, pad_canvas_for_patchify,
    )

    rng = np.random.default_rng(1)
    H, W, win = 400, 300, 20
    canvas = rng.integers(-(2**31), 2**31 - 1, (H, W), dtype=np.int64)
    canvas = jnp.asarray(canvas.astype(np.int32))
    N = 64
    r = rng.integers(0, H - win - 1, N).astype(np.int32)
    c = rng.integers(0, W - win - 1, N).astype(np.int32)
    fn, (_, PF) = make_pallas_patchify(win, win, H, W, N, interpret=True)
    got = np.asarray(fn(pad_canvas_for_patchify(canvas, win),
                        jnp.asarray(r), jnp.asarray(c)))
    P = (win + 1) * (win + 1)
    cn = np.asarray(canvas)
    for w in range(N):
        want = cn[r[w]:r[w] + win + 1, c[w]:c[w] + win + 1].reshape(-1)
        assert np.array_equal(got[w, :P], want), f"window {w}"


@pytest.mark.slow
def test_fused_engine_matches_xla(face_img):
    """The single-dispatch fused engine (canvas + walk + dense front +
    fixed-capacity MXU tail in chained programs with no host syncs) must
    reproduce the XLA dense path exactly, in both precision modes."""
    m = read_cascade_xml(HAAR_ALT)
    ref = None
    for exact in (False, True):
        fus = TPUDetector(m, exact=exact, engine="fused")
        fus._fused.tail_n = 8192  # CPU-sized tail capacity
        got = sorted(map(tuple, fus.detect_multi_scale(face_img, 1.2, 0)))
        if ref is None:
            xla = TPUDetector(m, exact=exact, engine="xla")
            ref = sorted(map(tuple, xla.detect_multi_scale(face_img, 1.2, 0)))
        assert got == ref and len(got) > 0


def test_fused_static_engine_parity():
    """End-to-end fused engine on the statically-unrolled Pallas front
    (interpret mode): the WHOLE cascade runs in fine-tiled kernels and
    detections come from the sparse row-compressed extraction — must
    match the XLA engine exactly."""
    import dataclasses

    m = read_cascade_xml(HAAR_ALT)
    m6 = dataclasses.replace(m, stages=list(m.stages[:6]))
    img = face_blob_image(240, 180, n=4, seed=7)
    fus = TPUDetector(m6, exact=False, engine="fused",
                      pallas_interpret=True)
    assert fus._fused is not None
    got = sorted(map(tuple, fus.detect_multi_scale(img, 1.2, 0)))
    ref = TPUDetector(m6, exact=False, engine="xla")
    want = sorted(map(tuple, ref.detect_multi_scale(img, 1.2, 0)))
    assert got == want and len(got) > 0


def test_fused_lbp_engine_parity():
    """The fused LBP path (LBP prep without variance gate + LBP compact
    tail) must match the XLA engine exactly."""
    import dataclasses

    m = read_cascade_xml(LBP_FRONTAL)
    m4 = dataclasses.replace(m, stages=list(m.stages[:4]))
    img = face_blob_image(240, 180, n=4, seed=9)
    fus = TPUDetector(m4, exact=False, engine="fused")
    assert fus._fused is not None
    fus._fused.tail_n = 4096
    got = sorted(map(tuple, fus.detect_multi_scale(img, 1.2, 0)))
    ref = TPUDetector(m4, exact=False, engine="xla")
    want = sorted(map(tuple, ref.detect_multi_scale(img, 1.2, 0)))
    assert got == want and len(got) > 0


def test_parity_visited_matches_walk_scan():
    """Closed-form visited mask == the serial lax.scan walk."""
    import jax.numpy as jnp
    from cascadeclassifier_tpu.detect.dense import dense_walk_visited
    from cascadeclassifier_tpu.detect.engine import (
        parity_visited, static_visit_grid,
    )
    from cascadeclassifier_tpu.detect.pyramid import build_plan

    rng = np.random.default_rng(2)
    plan = build_plan(160, 120, 20, 20, 1.2)
    out_h = plan.canvas_h - 20
    out_w = plan.canvas_w - 20
    m0 = jnp.asarray(rng.random((out_h, out_w)) < 0.35)
    ref = dense_walk_visited(
        m0,
        jnp.asarray(plan.row_is_grid[:out_h]),
        jnp.asarray(plan.row_step2[:out_h]),
        jnp.asarray(plan.row_maxc[:out_h]),
    )
    got = parity_visited(m0, jnp.asarray(static_visit_grid(plan)))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_patchify_cnt_guard():
    """Slots past `cnt` are skipped (zero output), real slots unchanged."""
    import jax.numpy as jnp
    from cascadeclassifier_tpu.detect.compact import (
        make_pallas_patchify, pad_canvas_for_patchify,
    )

    rng = np.random.default_rng(5)
    H, W, win = 200, 240, 20
    canvas = jnp.asarray(
        rng.integers(-(2**31), 2**31 - 1, (H, W), dtype=np.int64).astype(
            np.int32
        )
    )
    N, CNT = 64, 37
    r = rng.integers(0, H - win - 1, N).astype(np.int32)
    c = rng.integers(0, W - win - 1, N).astype(np.int32)
    fn, _ = make_pallas_patchify(win, win, H, W, N, interpret=True)
    pad = pad_canvas_for_patchify(canvas, win)
    got = np.asarray(
        fn(pad, jnp.asarray(r), jnp.asarray(c), jnp.int32(CNT))
    )
    P = (win + 1) * (win + 1)
    cn = np.asarray(canvas)
    for w in range(CNT):
        want = cn[r[w]:r[w] + win + 1, c[w]:c[w] + win + 1].reshape(-1)
        assert np.array_equal(got[w, :P], want), f"window {w}"
    assert not got[CNT:].any()
