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
    return face_blob_image(240, 180, n=6, seed=3)


# ---- shared truncated-cascade fixtures: the oracle-parity tests are
# compile-bound on cold CPU (dozens of per-stage-chunk programs per
# (plan, engine, precision)); parity over the first 8 stages at one
# shared geometry is equally conclusive for the engine mechanics, so
# all but the full-cascade keystone test run on these -------------------


@pytest.fixture(scope="module")
def haar8(tmp_path_factory):
    """(model, xml_path): haarcascade_frontalface_alt truncated to 8
    stages, re-serialized so the C++ oracle loads the same truncation."""
    import dataclasses

    from cascadeclassifier_tpu.models.xml_io import write_cascade_xml

    m = read_cascade_xml(HAAR_ALT)
    m8 = dataclasses.replace(m, stages=list(m.stages[:8]))
    p = str(tmp_path_factory.mktemp("trunc") / "haar8.xml")
    write_cascade_xml(m8, p)
    return m8, p


@pytest.fixture(scope="module")
def det8(haar8):
    """Shared exact-mode XLA detector over the truncated cascade — its
    per-plan compiled programs are reused across the whole module."""
    return TPUDetector(haar8[0], exact=True, engine="xla")


@pytest.fixture(scope="module")
def det_full():
    """Shared exact-mode detector over the FULL cascade (keystone)."""
    return TPUDetector(read_cascade_xml(HAAR_ALT))


@pytest.mark.slow
def test_bench_config_f32_grouped_parity(oracle_bin, tmp_path):
    """The precision mode bench.py actually measures (exact=False, f32
    fused engine) matches the C++ runtime's grouped detections on the
    FULL cascade at the bench parameters (sf=1.1, minNeighbors=3) —
    including a bench-style adversarial synthetic frame (the same
    generator bench.py times, at a CPU-tractable geometry). Closes the
    gap between the headline fps and the parity proof: on CPU this
    drives the f32 XLA front, which test_fused_static_engine_parity /
    test_static_front_matches_dense pin bit-identical to the static
    Pallas front the TPU bench runs. Reference oracle:
    tools/detection/Cpp/main.cpp:42-49."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from bench import synth_frame

    m = read_cascade_xml(HAAR_ALT)
    det = TPUDetector(m, exact=False, engine="fused")
    imgs = [
        synth_frame(0, 480, 640),
        face_blob_image(640, 480, n=8, seed=11),
        face_blob_image(320, 240, n=4, seed=5),
    ]
    for img in imgs:
        ours = sorted(map(tuple, det.detect_multi_scale(img, 1.1, 3)))
        ref = _oracle(oracle_bin, HAAR_ALT, img, tmp_path, "1.1", "3")
        assert ours == ref


@pytest.mark.slow
def test_haar_raw_window_parity(oracle_bin, tmp_path, det_full, face_img):
    """Keystone: FULL 22-stage cascade, OpenCV-default scaleFactor."""
    ours = sorted(map(tuple, det_full.detect_multi_scale(face_img, 1.1, 0)))
    ref = _oracle(oracle_bin, HAAR_ALT, face_img, tmp_path)
    assert ours == ref


@pytest.mark.slow
def test_haar_grouped_parity(oracle_bin, tmp_path, det_full, face_img):
    # same plan as the raw test → reuses det_full's compiled programs
    ours = sorted(map(tuple, det_full.detect_multi_scale(face_img, 1.1, 2)))
    ref = _oracle(oracle_bin, HAAR_ALT, face_img, tmp_path, mn="2")
    assert ours == ref


@pytest.mark.slow
def test_haar_parity_random_textures(oracle_bin, tmp_path, haar8, det8):
    """Random blurred textures exercise knife-edge windows."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (160, 200)).astype(np.uint8)
    img = cv2.GaussianBlur(img, (7, 7), 2.0)
    ours = sorted(map(tuple, det8.detect_multi_scale(img, 1.2, 0)))
    ref = _oracle(oracle_bin, haar8[1], img, tmp_path, sf="1.2")
    assert len(ref) > 0
    assert ours == ref


@pytest.mark.slow
def test_lbp_raw_window_parity(oracle_bin, tmp_path, face_img):
    m = read_cascade_xml(LBP_FRONTAL)
    det = TPUDetector(m)
    ours = sorted(map(tuple, det.detect_multi_scale(face_img, 1.2, 0)))
    ref = _oracle(oracle_bin, LBP_FRONTAL, face_img, tmp_path, sf="1.2")
    assert len(ref) > 0
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

    # in-kernel frame batching (frames=F grid axis): identical per-frame
    # results to the unbatched kernel on a stacked pair of frames
    fnb, _ = make_static_front_fn(
        packed.stages, [1, 2, 3], packed.win_w, packed.win_h,
        plan.canvas_h, plan.canvas_w, 64, 128, interpret=True,
        frames=2,
    )
    alive2 = (
        jnp.zeros((hp, wp), jnp.int8)
        .at[:out_h, :out_w]
        .set((~np.asarray(gate)).astype(jnp.int8))
    )
    sum_b = jnp.stack([sum_pad, sum_pad])
    inv_b = jnp.stack([inv_pad, inv_pad])
    al_b = jnp.stack([alive, alive2])
    got_b = np.asarray(fnb(sum_b, inv_b, al_b))
    np.testing.assert_array_equal(
        got_b[0], np.asarray(fn(sum_pad, inv_pad, alive))
    )
    np.testing.assert_array_equal(
        got_b[1], np.asarray(fn(sum_pad, inv_pad, alive2))
    )


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
def test_variance_gate_rejects_flat_regions(det8, face_img):
    # face_img geometry + scale → plan cache hit on the shared detector
    flat = np.full(face_img.shape, 90, np.uint8)
    assert len(det8.detect_multi_scale(flat, 1.2, 0)) == 0


@pytest.mark.slow
def test_min_size_filter(oracle_bin, tmp_path, haar8, det8, face_img):
    ours = sorted(
        map(tuple, det8.detect_multi_scale(face_img, 1.2, 0, min_size=(40, 40)))
    )
    p = str(tmp_path / "oracle_img.png")
    cv2.imwrite(p, face_img)
    r = subprocess.run(
        [oracle_bin, haar8[1], p, "1.2", "0", "40", "40"],
        capture_output=True,
        text=True,
    )
    ref = sorted(tuple(map(int, l.split())) for l in r.stdout.splitlines()[1:])
    assert len(ref) > 0
    assert ours == ref


def test_grouping_clips_after_average():
    """detectMultiScale clips to the image AFTER groupRectangles
    (cascadedetect.cpp clipObjects runs on the grouped output): a
    coarsest-level candidate overhanging the bottom edge contributes its
    UNCLIPPED height to the cluster average. Captured from a real
    640x480 frontalface_alt divergence: grouping the pre-clipped list
    gives h=132, the oracle (group-then-clip) gives h=133."""
    from cascadeclassifier_tpu.detect.grouping import clip_rects

    members = np.array(
        [
            (22, 333, 148, 148),   # y+h=481 > 480: unclipped height
            (30, 333, 148, 148),   # ditto
            (34, 343, 135, 135),
            (51, 359, 101, 101),
        ],
        np.int64,
    )
    # unclipped heights sum 532 -> avg 133.0; pre-clipped sum 530 ->
    # avg 132.5 -> round-half-even 132 (the old wrong answer)
    grouped = clip_rects(group_rectangles(members, 2), 640, 480)
    assert grouped.shape == (1, 4)
    assert tuple(map(int, grouped[0])) == (34, 342, 133, 133)
    pre = members.copy()
    pre[:, 3] = np.minimum(pre[:, 3], 480 - pre[:, 1])
    assert int(group_rectangles(pre, 2)[0][3]) == 132


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
def test_tilted_cascade_parity(oracle_bin, tmp_path):
    """ALL-mode Haar cascade with tilted features + deep trees
    (haarcascade_eye_tree_eyeglasses ships both; truncated to 6 stages —
    tilted-integral + deep-walk semantics are fully exercised)."""
    import dataclasses

    from cascadeclassifier_tpu.models.xml_io import write_cascade_xml

    xml = "/usr/share/opencv4/haarcascades/haarcascade_eye_tree_eyeglasses.xml"
    if not os.path.exists(xml):
        pytest.skip("pretrained tilted cascade missing")
    m = read_cascade_xml(xml)
    assert m.uses_tilted()
    m6 = dataclasses.replace(m, stages=list(m.stages[:6]))
    x6 = str(tmp_path / "eye6.xml")
    write_cascade_xml(m6, x6)
    rng = np.random.default_rng(4)
    img = cv2.GaussianBlur(
        rng.integers(0, 256, (160, 200)).astype(np.uint8), (9, 9), 3
    )
    det = TPUDetector(m6)
    ours = sorted(map(tuple, det.detect_multi_scale(img, 1.2, 0)))
    ref = _oracle(oracle_bin, x6, img, tmp_path, sf="1.2")
    assert len(ref) > 0
    assert ours == ref


@pytest.fixture(scope="module")
def ref8f(haar8, face_img):
    """f32 XLA detections over the truncated cascade — the shared
    reference for the engine-parity tests."""
    xla = TPUDetector(haar8[0], exact=False, engine="xla")
    out = sorted(map(tuple, xla.detect_multi_scale(face_img, 1.2, 0)))
    assert len(out) > 0
    return out


@pytest.mark.slow
def test_pallas_engine_matches_xla(haar8, face_img, ref8f):
    """The Pallas tiled kernel (interpret mode on CPU) must reproduce the
    XLA dense path exactly."""
    pal = TPUDetector(haar8[0], exact=False, engine="pallas",
                      pallas_interpret=True)
    b = sorted(map(tuple, pal.detect_multi_scale(face_img, 1.2, 0)))
    assert b == ref8f


@pytest.mark.slow
def test_compact_engine_matches_xla(haar8, det8, face_img, ref8f):
    """The survivor-compaction engine (dense front + MXU limb-matmul tail)
    must reproduce the XLA dense path exactly, in both precision modes."""
    refs = {
        True: sorted(
            map(tuple, det8.detect_multi_scale(face_img, 1.2, 0))
        ),
        False: ref8f,
    }
    for exact in (True, False):
        cmp_ = TPUDetector(haar8[0], exact=exact, engine="compact")
        # small trigger forces the tail path even on a small test image
        cmp_.trigger_n = 1 << 12
        cmp_.compact_batch = 1 << 10
        b = sorted(map(tuple, cmp_.detect_multi_scale(face_img, 1.2, 0)))
        assert b == refs[exact] and len(b) > 0


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
def test_fused_engine_matches_xla(haar8, det8, face_img, ref8f):
    """The single-dispatch fused engine (canvas + walk + dense front +
    fixed-capacity MXU tail in chained programs with no host syncs) must
    reproduce the XLA dense path exactly, in both precision modes."""
    refs = {
        True: sorted(
            map(tuple, det8.detect_multi_scale(face_img, 1.2, 0))
        ),
        False: ref8f,
    }
    for exact in (False, True):
        fus = TPUDetector(haar8[0], exact=exact, engine="fused")
        fus._fused.tail_n = 8192  # CPU-sized tail capacity
        got = sorted(map(tuple, fus.detect_multi_scale(face_img, 1.2, 0)))
        assert got == refs[exact] and len(got) > 0


def test_packed_plan_layout_and_walk():
    """Shelf-packed band layout (build_plan pack_band=True): level blocks
    are disjoint and in-bounds, the 2D anchor grid holds exactly the
    unpacked plan's anchors per level, and the packed band walk (2D grid
    + gap-column resets, engine.parity_visited) reproduces the serial
    per-level OpenCV walk for every band level."""
    import jax.numpy as jnp

    from cascadeclassifier_tpu.detect.dense import dense_walk_visited
    from cascadeclassifier_tpu.detect.engine import parity_visited
    from cascadeclassifier_tpu.detect.pyramid import build_plan

    w, h, win = 240, 180, 20
    p0 = build_plan(w, h, win, win, 1.2)
    p1 = build_plan(w, h, win, win, 1.2, pack_band=True)
    S = len(p1.scales)
    occ = np.zeros((p1.canvas_h, p1.canvas_w), np.int8)
    for s in range(S):
        t, le = int(p1.block_top[s]), int(p1.block_left[s])
        hb, wb = int(p1.scaled_h[s]) + 1, int(p1.scaled_w[s]) + 1
        assert t + hb <= p1.canvas_h and le + wb <= p1.canvas_w
        occ[t : t + hb, le : le + wb] += 1
    assert occ.max() == 1  # disjoint level blocks
    assert p1.canvas_h < p0.canvas_h  # packing actually shrank the canvas
    assert int((p1.block_left > 0).sum()) > 0  # some level shares a shelf

    # per-level anchor sets identical to the unpacked plan
    out_w0 = p0.canvas_w - win
    g0 = np.zeros((p0.canvas_h - win, out_w0), bool)
    cols = np.arange(out_w0)
    g0[:] = (
        p0.row_is_grid[: p0.canvas_h - win, None]
        & (cols[None, :] <= p0.row_maxc[: p0.canvas_h - win, None])
        & (~p0.row_step2[: p0.canvas_h - win, None]
           | ((cols[None, :] & 1) == 0))
    )
    for s in range(S):
        r0, c0 = int(p0.block_top[s]), 0
        r1, c1 = int(p1.block_top[s]), int(p1.block_left[s])
        hs, ws = int(p1.scaled_h[s]) + 1 - win, int(p1.scaled_w[s]) + 1 - win
        if hs <= 0 or ws <= 0:
            continue
        a0 = g0[r0 : r0 + hs, c0 : c0 + ws]
        a1 = p1.grid2d[r1 : r1 + hs, c1 : c1 + ws]
        assert np.array_equal(a0, a1), f"level {s} anchors differ"

    # packed band walk == serial per-level walk under a random skip mask
    band = np.nonzero(p1.ystep == 1)[0]
    assert len(band) >= 2
    out_h1, out_w1 = p1.canvas_h - win, p1.canvas_w - win
    rng = np.random.default_rng(5)
    m0 = rng.random((out_h1, out_w1)) < 0.6
    grid = p1.grid2d & ~p1.row_is_plane[:out_h1, None]
    got = np.asarray(
        parity_visited(
            jnp.asarray(m0), jnp.asarray(grid), None, jnp.asarray(~grid)
        )
    )
    assert not np.any(got & ~grid)
    for s in band:
        r1, c1 = int(p1.block_top[s]), int(p1.block_left[s])
        hs, ws = int(p1.scaled_h[s]) + 1 - win, int(p1.scaled_w[s]) + 1 - win
        if hs <= 0 or ws <= 0:
            continue
        lvl_grid = grid[r1 : r1 + hs, c1 : c1 + ws]
        want = np.asarray(
            dense_walk_visited(
                jnp.asarray(m0[r1 : r1 + hs, c1 : c1 + ws]),
                jnp.asarray(lvl_grid.any(axis=1)),
                jnp.zeros(hs, bool),
                jnp.asarray(
                    np.where(lvl_grid.any(axis=1),
                             lvl_grid.shape[1] - 1, -1).astype(np.int32)
                ),
            )
        )
        # dense_walk_visited's per-row maxc bound: emulate via the grid
        want = want & lvl_grid
        assert np.array_equal(
            got[r1 : r1 + hs, c1 : c1 + ws] & lvl_grid, want
        ), f"level {s} walk differs"


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


@pytest.mark.parametrize("variant", ["default", "packed_slot"])
def test_fused_hybrid_slot_tail_parity(variant, monkeypatch):
    """Hybrid static front + MXU tail (interpret mode): the production
    TPU path — Pallas front chunks, split-tail extraction, limb-emitting
    patchify kernel — must match the XLA engine exactly. The
    "packed_slot" variant covers the flagged alternatives (survivor-
    packed front blocks + slot-major stride-32 limb planes)."""
    import dataclasses

    if variant == "packed_slot":
        monkeypatch.setenv("CCTPU_PACKED_FRONT", "1")
        monkeypatch.setenv("CCTPU_SLOT_LIMBS", "1")
    m = read_cascade_xml(HAAR_ALT)
    m10 = dataclasses.replace(m, stages=list(m.stages[:10]))
    img = face_blob_image(240, 180, n=4, seed=7)
    fus = TPUDetector(m10, exact=False, engine="fused",
                      pallas_interpret=True)
    fus._fused.STATIC_FRONT_TREES = 50  # cutover after ~3 stages
    fus._fused.tail_n = 4096
    got = sorted(map(tuple, fus.detect_multi_scale(img, 1.2, 0)))
    assert fus._fused.n_dense < len(m10.stages)  # tail actually ran
    ref = TPUDetector(m10, exact=False, engine="xla")
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


def test_pallas_patchify_limb_emit():
    """emit='limbs_rel'/'limbs_abs' equal the reference limb extraction
    applied to the int32 patches (the fused transpose+limb path the TPU
    tail consumes)."""
    import jax.numpy as jnp
    from cascadeclassifier_tpu.detect.compact import (
        _limbs_abs, _limbs_rel, make_pallas_patchify,
        pad_canvas_for_patchify,
    )

    rng = np.random.default_rng(7)
    H, W, win = 160, 200, 20
    canvas = jnp.asarray(
        rng.integers(-(2**31), 2**31 - 1, (H, W), dtype=np.int64).astype(
            np.int32
        )
    )
    N, CNT = 64, 50
    r = np.where(np.arange(N) < CNT,
                 rng.integers(0, H - win - 1, N), 0).astype(np.int32)
    c = np.where(np.arange(N) < CNT,
                 rng.integers(0, W - win - 1, N), 0).astype(np.int32)
    pad = pad_canvas_for_patchify(canvas, win)
    f32, _ = make_pallas_patchify(win, win, H, W, N, interpret=True)
    ps = f32(pad, jnp.asarray(r), jnp.asarray(c), jnp.int32(CNT))
    for emit, ref_fn in (("limbs_rel", _limbs_rel), ("limbs_abs", _limbs_abs)):
        fn, _ = make_pallas_patchify(
            win, win, H, W, N, interpret=True, emit=emit
        )
        got = fn(pad, jnp.asarray(r), jnp.asarray(c), jnp.int32(CNT))
        want = ref_fn(ps)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g.dtype == jnp.bfloat16
            assert np.array_equal(np.asarray(g), np.asarray(w)), emit


def test_pallas_patchify_slot_limb_emit():
    """emit='limbs_rel_slot' (no octet transpose; slot-major window
    order, stride-32 patch grid) must hold exactly the reference rel
    limbs: slot[l][s*n8+q, i*32+j] == ref[l][q*8+s, i*pw+j]."""
    import jax.numpy as jnp
    from cascadeclassifier_tpu.detect.compact import (
        _limbs_rel, make_pallas_patchify, pad_canvas_for_patchify,
    )

    rng = np.random.default_rng(11)
    H, W, win = 160, 200, 24
    canvas = jnp.asarray(
        rng.integers(0, 2**30, (H, W), dtype=np.int64).astype(np.int32)
    )
    N, CNT = 128, 101
    r = np.where(np.arange(N) < CNT,
                 rng.integers(0, H - win - 1, N), 0).astype(np.int32)
    c = np.where(np.arange(N) < CNT,
                 rng.integers(0, W - win - 1, N), 0).astype(np.int32)
    pad = pad_canvas_for_patchify(canvas, win)
    f32, _ = make_pallas_patchify(win, win, H, W, N, interpret=True)
    ps = f32(pad, jnp.asarray(r), jnp.asarray(c), jnp.int32(CNT))
    want = [np.asarray(x) for x in _limbs_rel(ps)]
    fn, (_, PF) = make_pallas_patchify(
        win, win, H, W, N, interpret=True, emit="limbs_rel_slot"
    )
    got = fn(pad, jnp.asarray(r), jnp.asarray(c), jnp.int32(CNT))
    ph = pw = win + 1
    n8 = N // 8
    assert PF == ph * 32
    for lg, lw in zip(got, want):
        assert lg.dtype == jnp.bfloat16 and lg.shape == (N, ph * 32)
        g = np.asarray(lg).reshape(8, n8, ph, 32)[..., :pw]
        w = lw.reshape(n8, 8, ph, pw).transpose(1, 0, 2, 3)
        assert np.array_equal(g, w)


def test_tail_compact_slot_major_matches():
    """make_tail_compact_fn(slot_major=True) over the slot-major limb
    planes returns the same survivor set (original window ids) as the
    plain tail over tight patches."""
    import jax.numpy as jnp
    from cascadeclassifier_tpu.detect.compact import (
        make_pallas_patchify, make_tail_compact_fn,
        pad_canvas_for_patchify,
    )
    from cascadeclassifier_tpu.detect.detector import PackedCascade

    m = read_cascade_xml(HAAR_ALT)
    packed = PackedCascade.from_model(m)
    win = m.width
    rng = np.random.default_rng(3)
    H, W = 160, 200
    img = rng.integers(0, 256, (H, W)).astype(np.int64)
    canvas = jnp.asarray(
        np.pad(img, ((1, 0), (1, 0))).cumsum(0).cumsum(1).astype(np.int32)
    )
    N, CNT = 64, 49
    r = np.where(np.arange(N) < CNT,
                 rng.integers(0, H - win - 1, N), 0).astype(np.int32)
    c = np.where(np.arange(N) < CNT,
                 rng.integers(0, W - win - 1, N), 0).astype(np.int32)
    inv = (1.0 / rng.uniform(1.0, 80.0, N)).astype(np.float32)
    pad = pad_canvas_for_patchify(canvas, win)
    start = 3
    f32, _ = make_pallas_patchify(win, win, H, W, N, interpret=True)
    ps = f32(pad, jnp.asarray(r), jnp.asarray(c), jnp.int32(CNT))

    # random windows never survive the real cascade; recalibrate each
    # stage's threshold to the median stage sum of the live windows so
    # ~half survive per stage (exercising the shrink gathers with a
    # non-trivial survivor pattern)
    import dataclasses

    pn = np.asarray(ps)
    cw = win + 1
    alive_np = np.arange(N) < CNT
    new_stages = list(packed.stages)
    for si in range(start, len(packed.stages)):
        st = packed.stages[si]
        ssum = np.zeros(N, np.float32)
        for t in range(st.ntrees):
            raw = np.zeros(N, np.float32)
            for ri in range(3):
                wt = np.float32(st.weights[t, ri])
                if wt == 0.0:
                    continue
                x, y, w_, h_ = (int(v) for v in st.feat_rects[t, ri])
                rs = (
                    pn[:, y * cw + x]
                    - pn[:, y * cw + x + w_]
                    - pn[:, (y + h_) * cw + x]
                    + pn[:, (y + h_) * cw + x + w_]
                ).astype(np.float32)
                raw = raw + rs * wt
            val = raw * inv
            leaf = np.where(val < st.thr[t], st.left_leaf[t],
                            st.right_leaf[t]).astype(np.float32)
            ssum = ssum + leaf
        # 0.01 below the live median: far beyond any f32 rounding, so
        # both tails make identical pass/fail decisions
        sthr = (
            float(np.median(ssum[alive_np])) - 0.01
            if alive_np.any() else 0.0
        )
        new_stages[si] = dataclasses.replace(
            st, threshold=np.float32(sthr)
        )
        alive_np &= ssum >= np.float32(sthr)
    packed = dataclasses.replace(packed, stages=new_stages)
    assert 0 < int(alive_np.sum()) < CNT

    ref_tail = make_tail_compact_fn(packed, start, False, N, n_floor=16)
    rw, ra, rof = ref_tail(ps, ps, jnp.asarray(inv), jnp.int32(CNT))
    ref = sorted(np.asarray(rw)[np.asarray(ra)].tolist())

    fn, _ = make_pallas_patchify(
        win, win, H, W, N, interpret=True, emit="limbs_rel_slot"
    )
    limbs = fn(pad, jnp.asarray(r), jnp.asarray(c), jnp.int32(CNT))
    slot_tail = make_tail_compact_fn(
        packed, start, False, N, n_floor=16, slot_major=True
    )
    sw, sa, sof = slot_tail(limbs, limbs, jnp.asarray(inv), jnp.int32(CNT))
    got = sorted(np.asarray(sw)[np.asarray(sa)].tolist())
    assert bool(rof) == bool(sof) is False
    assert got == ref and len(ref) > 0


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


def test_fused_engine_tilted_deep_parity():
    """Tilted + depth-2 cascades (eye_tree_eyeglasses) run on the fused
    single-dispatch engine (all-dense XLA front, tilted canvas) and must
    match the XLA engine exactly — previously they fell back to the
    host-synced dense path."""
    import dataclasses

    xml = "/usr/share/opencv4/haarcascades/haarcascade_eye_tree_eyeglasses.xml"
    if not os.path.exists(xml):
        pytest.skip("pretrained tilted cascade missing")
    m = read_cascade_xml(xml)
    m4 = dataclasses.replace(m, stages=list(m.stages[:4]))
    rng = np.random.default_rng(6)
    img = cv2.GaussianBlur(
        rng.integers(0, 256, (120, 160)).astype(np.uint8), (9, 9), 3
    )
    ref = TPUDetector(m4, exact=False, engine="xla")
    want = sorted(map(tuple, ref.detect_multi_scale(img, 1.2, 0)))
    fus = TPUDetector(m4, exact=False, engine="fused")
    assert fus._fused is not None
    got = sorted(map(tuple, fus.detect_multi_scale(img, 1.2, 0)))
    assert got == want and len(got) > 0


def test_fused_engine_tilted_stump_tail_parity(tmp_path):
    """A tilted all-stump cascade exercises the fused MXU tail's tilted
    patch path (patchify over the tilted canvas)."""
    import dataclasses

    xml = "/usr/share/opencv4/haarcascades/haarcascade_eye_tree_eyeglasses.xml"
    if not os.path.exists(xml):
        pytest.skip("pretrained tilted cascade missing")
    m = read_cascade_xml(xml)
    # stump-ify: keep only the root split of every tree so the cascade
    # stays tilted but all-stump (tail-packable)
    def stumpify(t):
        from cascadeclassifier_tpu.models.model import WeakTree

        return WeakTree(
            left=np.array([0], np.int32),
            right=np.array([-1], np.int32),
            feature_idx=t.feature_idx[:1].copy(),
            threshold=t.threshold[:1].copy(),
            leaf_values=np.array(
                [t.leaf_values[0], t.leaf_values[-1]], np.float32
            ),
        )

    from cascadeclassifier_tpu.models.model import Stage

    stages = [
        Stage(threshold=st.threshold - 2.0,
              trees=[stumpify(t) for t in st.trees])
        for st in m.stages[:8]
    ]
    ms = dataclasses.replace(m, stages=stages, max_depth=1)
    rng = np.random.default_rng(8)
    img = cv2.GaussianBlur(
        rng.integers(0, 256, (120, 160)).astype(np.uint8), (7, 7), 2
    )
    ref = TPUDetector(ms, exact=False, engine="xla")
    want = sorted(map(tuple, ref.detect_multi_scale(img, 1.2, 0)))
    fus = TPUDetector(ms, exact=False, engine="fused")
    fus._fused.tail_n = 4096
    got = sorted(map(tuple, fus.detect_multi_scale(img, 1.2, 0)))
    assert fus._fused.n_dense < len(ms.stages)  # tail actually ran
    assert got == want and len(got) > 0


def test_fused_batched_head_programs_identical(face_img):
    """The vmapped F-frame head programs (detect_async_batch) must produce
    exactly the per-frame results, on both the XLA front and the
    static-Pallas (interpret) front."""
    import dataclasses

    m = read_cascade_xml(HAAR_ALT)
    m6 = dataclasses.replace(m, stages=list(m.stages[:6]))
    frames = [face_blob_image(240, 180, n=4, seed=s) for s in range(6)]

    det1 = TPUDetector(m6, exact=False, engine="fused")
    det1._fused.tail_n = 4096
    det1._fused.BATCH_F = 1  # per-frame reference
    ref = det1.detect_multi_scale_batch(frames, 1.2, 0)
    assert sum(len(r) for r in ref) > 0

    det2 = TPUDetector(m6, exact=False, engine="fused")
    det2._fused.tail_n = 4096
    det2._fused.BATCH_F = 4  # 4-frame groups + 2 per-frame remainder
    got = det2.detect_multi_scale_batch(frames, 1.2, 0)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)

    det3 = TPUDetector(m6, exact=False, engine="fused",
                       pallas_interpret=True)
    det3._fused.BATCH_F = 4
    got3 = det3.detect_multi_scale_batch(frames, 1.2, 0)
    for a, b in zip(ref, got3):
        # the static-front engine uses the shelf-packed canvas, whose
        # raw-window enumeration order differs from the row-table
        # layout's scan order — set equality is the contract (as for the
        # split tail's plane-then-band order)
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    # in-kernel frame batching (CCTPU_KBATCH): the F-framed chunk
    # kernels replace the per-frame front dispatches — identical results
    import os

    os.environ["CCTPU_KBATCH"] = "1"
    try:
        det4 = TPUDetector(m6, exact=False, engine="fused",
                           pallas_interpret=True)
        det4._fused.BATCH_F = 4
        got4 = det4.detect_multi_scale_batch(frames, 1.2, 0)
        assert getattr(det4._fused, "_mk_batched_fronts", None) is not None
        for a, b in zip(ref, got4):
            assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    finally:
        del os.environ["CCTPU_KBATCH"]


def test_windowed_batch_submission_matches_per_frame(face_img):
    """The single-chip batch path packs PACK=16-frame result chunks and
    fetches the oldest once more than IN_FLIGHT are outstanding
    (allocator backpressure fix). 21 frames exercise a full chunk plus
    a partial 5-frame final chunk (its own pack program size), and
    result-order preservation across the windowed fetches."""
    import dataclasses

    m = read_cascade_xml(HAAR_ALT)
    m6 = dataclasses.replace(m, stages=list(m.stages[:6]))
    frames = [face_blob_image(160, 140, n=3, seed=s) for s in range(21)]

    det = TPUDetector(m6, exact=False, engine="fused")
    det._fused.tail_n = 4096
    ref = [det.detect_multi_scale(f, 1.2, 0) for f in frames]
    assert sum(len(r) for r in ref) > 0
    got = det.detect_multi_scale_batch(frames, 1.2, 0)
    assert len(got) == len(frames)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("wh", [(1920, 1080), (1280, 720), (640, 480),
                                (333, 257)])
def test_fused_engine_builds_at_geometry(wh):
    """Program construction (plan → chained program set) must succeed at
    production geometries — catches static-front/plane pad and row_lo
    arithmetic bugs without executing any kernel."""
    from cascadeclassifier_tpu.detect.engine import FusedEngine
    from cascadeclassifier_tpu.detect.detector import PackedCascade
    from cascadeclassifier_tpu.detect.pyramid import build_plan

    w, h = wh
    m = read_cascade_xml(HAAR_ALT)
    packed = PackedCascade.from_model(m)
    eng = FusedEngine(packed, exact=False, interpret=True)
    plan = build_plan(w, h, packed.win_w, packed.win_h, 1.1, None, None)
    (canvas, prep, psplit, prep_plane, prep_band, stitch), fronts, tail, \
        consts = eng.program(plan, 1 << 14)
    assert len(fronts) >= 1 and eng.n_dense >= 2
    # interpret=True → static front: split-layout head (prep is None,
    # plane and/or band prep exist); the hybrid (n_dense < stages) uses
    # the split tail (no stitch program), the all-static path keeps
    # stitch for its sparse extraction
    assert prep is None
    assert prep_plane is not None or prep_band is not None
    n_stages = len(packed.stages)
    assert (stitch is None) == (eng.n_dense < n_stages)


def test_block_nonzero_matches_full():
    """make_block_nonzero_fn (OR-reduced 128-lane blocks + one small 1-D
    sort) returns exactly make_nonzero_fn's ascending zero-padded index
    list at every sparsity, and flags live-block overflow."""
    from cascadeclassifier_tpu.detect.compact import (
        make_block_nonzero_fn,
        make_nonzero_fn,
    )

    rng = np.random.default_rng(11)
    for (rows, cols, dens) in [
        (64, 200, 0.002), (37, 333, 0.05), (128, 128, 0.0),
        (90, 500, 0.3),
    ]:
        mask = rng.random((rows, cols)) < dens
        n_max = 1 << 12
        want = np.asarray(make_nonzero_fn(rows, cols, n_max)(mask))
        got, oflow = make_block_nonzero_fn(rows, cols, n_max, kb=1 << 10)(
            mask
        )
        assert not bool(oflow)
        np.testing.assert_array_equal(np.asarray(got), want)
    # overflow: more live blocks than kb
    mask = np.ones((64, 256), bool)
    _, oflow = make_block_nonzero_fn(64, 256, 1 << 8, kb=16)(mask)
    assert bool(oflow)
    # small canvas: kb*128 < n_max (shelf-packed plan geometry — the
    # round-4 regression: flat[:n_max] used to under-slice and crash)
    mask = rng.random((12, 130)) < 0.2
    n_max = 1 << 16
    want = np.asarray(make_nonzero_fn(12, 130, n_max)(mask))
    got, oflow = make_block_nonzero_fn(12, 130, n_max)(mask)
    assert not bool(oflow)
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize(
    "nz_merged",
    [
        "0",
        pytest.param("1", marks=pytest.mark.slow),  # non-default: the
        # merged (plane ⊕ band) extraction faults real TPUs at 1080p
        # (engine.py), kept behind CCTPU_NZ_MERGED for newer toolchains
    ],
)
def test_fused_split_tail_parity(nz_merged, monkeypatch):
    """Hybrid static-front + split-tail path (survivors extracted
    straight from the plane/band masks via the block nonzero) matches
    the XLA engine exactly. STATIC_FRONT_TREES is lowered so the 6-stage
    cascade cuts over to the MXU tail after ~2 stages."""
    import dataclasses

    from cascadeclassifier_tpu.detect.engine import FusedEngine

    monkeypatch.setenv("CCTPU_NZ_MERGED", nz_merged)
    m = read_cascade_xml(HAAR_ALT)
    m6 = dataclasses.replace(m, stages=list(m.stages[:6]))
    img = face_blob_image(240, 180, n=4, seed=7)
    fus = TPUDetector(m6, exact=False, engine="fused",
                      pallas_interpret=True)
    old = FusedEngine.STATIC_FRONT_TREES
    FusedEngine.STATIC_FRONT_TREES = 30
    try:
        got = sorted(map(tuple, fus.detect_multi_scale(img, 1.2, 0)))
    finally:
        FusedEngine.STATIC_FRONT_TREES = old
    assert fus._fused.n_dense < len(m6.stages)  # split tail engaged
    ref = TPUDetector(m6, exact=False, engine="xla")
    want = sorted(map(tuple, ref.detect_multi_scale(img, 1.2, 0)))
    assert got == want and len(got) > 0


def test_fused_overflow_falls_back_to_adaptive(haar8):
    """Forcing the static tail capacity to overflow on a dense-detection
    frame must transparently re-run the frame through the host-adaptive
    engine with IDENTICAL results (the OpenCV runtime has no capacity
    cliffs — reference tools/detection/Cpp/main.cpp:42-49)."""
    import dataclasses

    frames = [face_blob_image(200, 160, n=4, seed=s) for s in (1, 2)]

    fus = TPUDetector(haar8[0], exact=False, engine="fused")
    fus._fused.tail_n = 32  # guaranteed overflow on these frames
    got = fus.detect_multi_scale_batch(frames, 1.2, 0)
    assert fus._fallback is not None and fus._fallback.engine == "compact"

    ref = TPUDetector(haar8[0], exact=False, engine="xla")
    want = [ref.detect_multi_scale(f, 1.2, 0) for f in frames]
    assert sum(len(w) for w in want) > 32  # the overflow was real
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)

    # LBP cascades have no compact engine: fallback must route to xla
    m = read_cascade_xml(LBP_FRONTAL)
    m4 = dataclasses.replace(m, stages=list(m.stages[:4]))
    fusl = TPUDetector(m4, exact=False, engine="fused")
    fusl._fused.tail_n = 32
    gotl = fusl.detect_multi_scale_batch(frames[:1], 1.2, 0)
    assert fusl._fallback is not None and fusl._fallback.engine == "xla"
    refl = TPUDetector(m4, exact=False, engine="xla")
    np.testing.assert_array_equal(
        gotl[0], refl.detect_multi_scale(frames[0], 1.2, 0)
    )


def test_nonfused_batch_path_pipelines(haar8, face_img):
    """detect_multi_scale_batch on the xla engine (windowed submit/fetch)
    must reproduce the serial per-frame results in order."""
    det = TPUDetector(haar8[0], exact=False, engine="xla")
    frames = [face_blob_image(160, 140, n=3, seed=s) for s in range(7)]
    want = [det.detect_multi_scale(f, 1.2, 0) for f in frames]
    got = det.detect_multi_scale_batch(frames, 1.2, 0)
    assert len(got) == len(want) and sum(len(w) for w in want) > 0
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)
