"""Trainer: split-search golden checks, stage training, full cascade loop."""

import os
import subprocess

import numpy as np
import pytest

import jax.numpy as jnp

from cascadeclassifier_tpu.models.model import (
    BOOST_DAB,
    BOOST_GAB,
    BOOST_LB,
    BOOST_RAB,
    FEATURE_HAAR,
    FEATURE_LBP,
)
from cascadeclassifier_tpu.ops.features import haar_catalog, lbp_catalog
from cascadeclassifier_tpu.train.boost import (
    BoostParams,
    StageTrainer,
    _categorical_split_block,
    _ordered_split_block,
    as_f64,
)
from cascadeclassifier_tpu.train.evaluators import (
    HaarTrainEvaluator,
    LBPTrainEvaluator,
)
from cascadeclassifier_tpu.train.trainer import CascadeTrainer


def _ref_ordered_split(values, w, resp):
    """Literal transcription of find_split_ord_reg
    (o_cvboostree.cpp:361-426) for one feature, as the numpy oracle."""
    order = np.argsort(values, kind="stable")
    v = values[order]
    ww = w[order]
    rr = resp[order] * ww
    L = 0.0
    R = ww.sum()
    lsum = 0.0
    rsum = rr.sum()
    best_val, best_i = -np.inf, -1
    eps = np.float32(1.1920929e-07) * 2
    n = len(v)
    for i in range(n - 1):
        L += ww[i]
        R -= ww[i]
        lsum += rr[i]
        rsum -= rr[i]
        if v[i] + eps < v[i + 1]:
            val = (lsum * lsum * R + rsum * rsum * L) / (L * R)
            if best_val < val:
                best_val, best_i = val, i
    thr = np.float32(v[best_i] + v[best_i + 1]) * np.float32(0.5)
    return best_val, np.float32(thr)


def test_ordered_split_matches_reference_scan():
    rng = np.random.default_rng(0)
    n, b = 200, 17
    values = rng.normal(size=(b, n)).astype(np.float32)
    sort_idx = np.argsort(values, axis=1).astype(np.int32)
    w = rng.uniform(0.1, 1.0, n)
    w /= w.sum()
    resp = rng.choice([-1.0, 1.0], n)
    mask = np.ones(n, bool)
    q, thr = _ordered_split_block(
        jnp.asarray(values), jnp.asarray(sort_idx), as_f64(w),
        as_f64(resp), jnp.asarray(mask),
    )
    q, thr = np.asarray(q), np.asarray(thr)
    for i in range(b):
        rq, rthr = _ref_ordered_split(values[i], w, resp)
        assert q[i] == pytest.approx(rq, rel=1e-12), i
        assert thr[i] == pytest.approx(rthr, abs=1e-6), i


def test_ordered_split_respects_subsample_mask():
    rng = np.random.default_rng(1)
    n = 100
    values = rng.normal(size=(1, n)).astype(np.float32)
    sort_idx = np.argsort(values, axis=1).astype(np.int32)
    w = rng.uniform(0.1, 1.0, n)
    resp = rng.choice([-1.0, 1.0], n)
    mask = rng.uniform(size=n) < 0.6
    q, thr = _ordered_split_block(
        jnp.asarray(values), jnp.asarray(sort_idx), as_f64(w),
        as_f64(resp), jnp.asarray(mask),
    )
    rq, rthr = _ref_ordered_split(values[0][mask], w[mask], resp[mask])
    assert float(q[0]) == pytest.approx(rq, rel=1e-12)
    assert float(thr[0]) == pytest.approx(rthr, abs=1e-6)


def _ref_categorical_split(codes, w, resp):
    """Literal transcription of find_split_cat_reg
    (o_cvboostree.cpp:428-516) for one feature."""
    mi = 256
    cnt = np.zeros(mi)
    sm = np.zeros(mi)
    for c, wi, ri in zip(codes, w, resp):
        cnt[c] += wi
        sm[c] += wi * ri
    means = np.where(np.abs(cnt) > 2.3e-16, sm / np.where(cnt == 0, 1, cnt), 0)
    order = np.argsort(means, kind="stable")
    s_sorted = (means * cnt)[order]
    c_sorted = cnt[order]
    L = R = lsum = rsum = 0.0
    R = cnt.sum()
    rsum = sm.sum()
    best_val, best_subset = -np.inf, -1
    flt = np.float32(1.1920929e-07)
    for si in range(mi - 1):
        ni = c_sorted[si]
        if ni > flt:
            lsum += s_sorted[si]
            L += ni
            rsum -= s_sorted[si]
            R -= ni
            if L > flt and R > flt:
                val = (lsum * lsum * R + rsum * rsum * L) / (L * R)
                if best_val < val:
                    best_val, best_subset = val, si
    subset = np.zeros(8, np.uint32)
    for i in range(best_subset + 1):
        idx = order[i]
        subset[idx >> 5] |= np.uint32(1 << (idx & 31))
    return best_val, subset.astype(np.int32)


def test_categorical_split_matches_reference_scan():
    rng = np.random.default_rng(2)
    n, b = 300, 5
    codes = rng.integers(0, 256, (b, n)).astype(np.int32)
    w = rng.uniform(0.1, 1.0, n)
    w /= w.sum()
    resp = rng.choice([-1.0, 1.0], n)
    mask = np.ones(n, bool)
    q, subs = _categorical_split_block(
        jnp.asarray(codes), as_f64(w), as_f64(resp), jnp.asarray(mask)
    )
    q, subs = np.asarray(q), np.asarray(subs)
    for i in range(b):
        rq, rsub = _ref_categorical_split(codes[i], w, resp)
        assert q[i] == pytest.approx(rq, rel=1e-9), i
        np.testing.assert_array_equal(subs[i], rsub, err_msg=str(i))


def _toy_samples(n_pos=40, n_neg=40, w=12, h=12, seed=0):
    """Separable toy set: positives have a bright center square."""
    rng = np.random.default_rng(seed)
    neg = rng.integers(0, 256, (n_neg, h, w)).astype(np.uint8)
    pos = rng.integers(0, 100, (n_pos, h, w)).astype(np.uint8)
    pos[:, 3:9, 3:9] = rng.integers(200, 256, (n_pos, 6, 6))
    samples = np.concatenate([pos, neg])
    labels = np.concatenate([np.ones(n_pos, np.int32), np.zeros(n_neg, np.int32)])
    return samples, labels


@pytest.mark.parametrize("bt", [BOOST_GAB, BOOST_RAB, BOOST_DAB, BOOST_LB])
@pytest.mark.slow
def test_stage_trainer_separates_toy_data(bt):
    samples, labels = _toy_samples()
    ev = HaarTrainEvaluator(haar_catalog(12, 12, "BASIC"), block_size=4096)
    ev.set_samples(samples)
    st = StageTrainer(ev, BoostParams(boost_type=bt, weak_count=10))
    stage, sums = st.train(labels, verbose=False)
    assert stage is not None
    pos_sums = sums[labels == 1]
    # minHitRate=0.995 with 40 pos → threshold index 0 → HR must be 1
    assert (pos_sums >= stage.threshold - 1e-5).mean() >= 0.97
    neg_sums = sums[labels == 0]
    assert (neg_sums >= stage.threshold - 1e-5).mean() <= 0.5


@pytest.mark.slow
def test_stage_trainer_lbp_categorical():
    samples, labels = _toy_samples()
    ev = LBPTrainEvaluator(lbp_catalog(12, 12), block_size=4096)
    ev.set_samples(samples)
    stage, sums = StageTrainer(ev, BoostParams(weak_count=10)).train(
        labels, verbose=False
    )
    assert stage is not None
    assert stage.trees[0].subsets is not None


def test_stage_trainer_depth2():
    samples, labels = _toy_samples()
    ev = HaarTrainEvaluator(haar_catalog(12, 12, "BASIC"), block_size=4096)
    ev.set_samples(samples)
    stage, _ = StageTrainer(
        ev, BoostParams(max_depth=2, weak_count=5)
    ).train(labels, verbose=False)
    assert stage is not None
    assert max(t.num_nodes for t in stage.trees) >= 1


@pytest.fixture(scope="module")
def toy_train_dir(tmp_path_factory):
    """Train a small end-to-end HAAR cascade from synthesized data."""
    import cv2

    from cascadeclassifier_tpu.data.vec import write_vec

    d = tmp_path_factory.mktemp("toytrain")
    rng = np.random.default_rng(5)
    pos = rng.integers(0, 90, (120, 12, 12)).astype(np.uint8)
    pos[:, 3:9, 3:9] = rng.integers(190, 256, (120, 6, 6))
    write_vec(str(d / "pos.vec"), pos)
    bg = rng.integers(0, 256, (96, 128)).astype(np.uint8)
    cv2.imwrite(str(d / "bg.png"), bg)
    with open(d / "bg.txt", "w") as f:
        f.write(str(d / "bg.png") + "\n")
    return d


@pytest.mark.slow
def test_cascade_trainer_end_to_end(toy_train_dir, oracle_bin, tmp_path):
    d = toy_train_dir
    tr = CascadeTrainer(feature_type=FEATURE_HAAR, win_w=12, win_h=12)
    model = tr.train(
        str(d / "data"),
        str(d / "pos.vec"),
        str(d / "bg.txt"),
        num_pos=100,
        num_neg=80,
        num_stages=2,
        verbose=False,
    )
    assert model is not None and model.num_stages >= 1
    # artifacts exist (checkpointing contract, cascadeclassifier.cpp:248-275)
    assert os.path.exists(d / "data" / "params.xml")
    assert os.path.exists(d / "data" / "stage0.xml")
    assert os.path.exists(d / "data" / "cascade.xml")
    # the strongest oracle: output loads in the independent OpenCV runtime
    img = str(tmp_path / "x.png")
    import cv2

    cv2.imwrite(img, np.random.default_rng(0).integers(0, 255, (40, 40)).astype(np.uint8))
    r = subprocess.run(
        [oracle_bin, str(d / "data" / "cascade.xml"), img],
        capture_output=True,
        text=True,
    )
    assert "LOADED" in r.stdout

    # resume: a new trainer picks up the checkpoints
    tr2 = CascadeTrainer(feature_type=FEATURE_HAAR, win_w=12, win_h=12)
    assert tr2.load(str(d / "data"))
    assert len(tr2.stages) == model.num_stages


def _ref_ordered_class_split(values, w, cls, use_gini):
    """Literal transcription of find_split_ord_class
    (o_cvboostree.cpp:151-247) for one feature."""
    order = np.argsort(values, kind="stable")
    v = values[order]
    ww = w[order]
    cc = cls[order]
    eps = np.float32(1.1920929e-07) * 2
    lcw = [0.0, 0.0]
    rcw = [float(ww[cls[order] == 0].sum()), float(ww[cls[order] == 1].sum())]
    n = len(v)
    best_val, best_i = -np.inf, -1
    if use_gini:
        L, R = 0.0, rcw[0] + rcw[1]
        lsum2 = 0.0
        rsum2 = rcw[0] ** 2 + rcw[1] ** 2
        for i in range(n - 1):
            wi, k = ww[i], cc[i]
            L += wi
            R -= wi
            lsum2 += 2 * lcw[k] * wi + wi * wi
            rsum2 -= 2 * rcw[k] * wi - wi * wi
            lcw[k] += wi
            rcw[k] -= wi
            if v[i] + eps < v[i + 1]:
                val = (lsum2 * R + rsum2 * L) / (L * R)
                if best_val < val:
                    best_val, best_i = val, i
    else:
        for i in range(n - 1):
            wi, k = ww[i], cc[i]
            lcw[k] += wi
            rcw[k] -= wi
            if v[i] + eps < v[i + 1]:
                val = max(lcw[0] + rcw[1], lcw[1] + rcw[0])
                if best_val < val:
                    best_val, best_i = val, i
    thr = np.float32(v[best_i] + v[best_i + 1]) * np.float32(0.5)
    return best_val, thr


@pytest.mark.parametrize("use_gini", [True, False])
def test_ordered_class_split_matches_reference_scan(use_gini):
    from cascadeclassifier_tpu.train.boost import _ordered_class_split_block

    rng = np.random.default_rng(3)
    n, b = 150, 9
    values = rng.normal(size=(b, n)).astype(np.float32)
    sort_idx = np.argsort(values, axis=1).astype(np.int32)
    w = rng.uniform(0.1, 1.0, n)
    w /= w.sum()
    cls = rng.integers(0, 2, n).astype(np.int32)
    mask = np.ones(n, bool)
    q, thr = _ordered_class_split_block(
        jnp.asarray(values), jnp.asarray(sort_idx), as_f64(w),
        jnp.asarray(cls), jnp.asarray(mask), use_gini,
    )
    q, thr = np.asarray(q), np.asarray(thr)
    for i in range(b):
        rq, rthr = _ref_ordered_class_split(values[i], w, cls, use_gini)
        assert q[i] == pytest.approx(rq, rel=1e-9), i
        assert thr[i] == pytest.approx(rthr, abs=1e-6), i


def test_dab_leaves_are_plus_minus_c():
    """DAB weak trees output ±C after per-iteration scaling."""
    samples, labels = _toy_samples()
    ev = HaarTrainEvaluator(haar_catalog(12, 12, "BASIC"), block_size=4096)
    ev.set_samples(samples)
    stage, _ = StageTrainer(
        ev, BoostParams(boost_type=BOOST_DAB, weak_count=4)
    ).train(labels, verbose=False)
    for t in stage.trees:
        lv = np.abs(t.leaf_values)
        assert np.allclose(lv, lv[0], rtol=1e-5)  # |leaf| = C per tree


@pytest.mark.slow
def test_hog_train_and_detect_round_trip(tmp_path):
    """HOG cascade: train on toy data, save/load XML, detect with the
    crop-consistent HOG detector (the reference can train HOG but not
    detect; this round trip is our own oracle)."""
    import cv2

    from cascadeclassifier_tpu.data.vec import write_vec
    from cascadeclassifier_tpu.detect.hog_detector import HOGDetector
    from cascadeclassifier_tpu.models.model import FEATURE_HOG
    from cascadeclassifier_tpu.models.xml_io import read_cascade_xml

    rng = np.random.default_rng(9)
    # positives: strong vertical bar (distinct gradient signature)
    pos = rng.integers(90, 110, (150, 32, 32)).astype(np.uint8)
    pos[:, :, 12:20] = rng.integers(230, 255, (150, 32, 8))
    d = tmp_path
    write_vec(str(d / "pos.vec"), pos)
    bg = rng.integers(0, 256, (96, 128)).astype(np.uint8)
    cv2.imwrite(str(d / "bg.png"), bg)
    with open(d / "bg.txt", "w") as f:
        f.write(str(d / "bg.png") + "\n")

    tr = CascadeTrainer(feature_type=FEATURE_HOG, win_w=32, win_h=32)
    model = tr.train(
        str(d / "data"), str(d / "pos.vec"), str(d / "bg.txt"),
        num_pos=120, num_neg=100, num_stages=2, verbose=False,
    )
    assert model is not None and model.num_stages >= 1
    m2 = read_cascade_xml(str(d / "data" / "cascade.xml"))
    assert m2.feat_size == 36 and m2.feature_type == FEATURE_HOG

    # scene: noise background with one pasted positive
    scene = rng.integers(0, 256, (80, 100)).astype(np.uint8)
    scene[20:52, 30:62] = pos[0]
    det = HOGDetector(m2)
    rects = det.detect_multi_scale(scene, 1.2, 1)
    assert len(rects) >= 1
    # at least one detection overlaps the pasted object
    hit = any(
        x < 62 and x + w > 30 and y < 52 and y + h > 20
        for (x, y, w, h) in map(tuple, rects)
    )
    assert hit


@pytest.mark.slow
def test_resume_from_reference_checkpoint():
    """Interop: load a checkpoint directory written by the *reference*
    trainer binary (golden files under tests/golden/ref_checkpoint were
    produced by running it on the barcode fixtures)."""
    d = os.path.join(os.path.dirname(__file__), "golden", "ref_checkpoint")
    tr = CascadeTrainer()
    assert tr.load(d)
    assert tr.feature_type == FEATURE_LBP
    assert (tr.win_w, tr.win_h) == (75, 32)
    assert len(tr.stages) == 2
    assert tr.stages[0].trees[0].feature_idx[0] == 1109
    assert tr.stages[0].threshold == pytest.approx(1.0)


def test_read_reference_trained_cascade():
    """Our reader consumes the reference binary's cascade.xml output."""
    from cascadeclassifier_tpu.models.xml_io import read_cascade_xml

    p = os.path.join(
        os.path.dirname(__file__), "golden", "ref_checkpoint", "cascade.xml"
    )
    m = read_cascade_xml(p)
    assert m.feature_type == FEATURE_LBP
    assert m.num_stages == 2
    assert len(m.features) == 2  # compacted


def test_fast_split_path_matches_legacy():
    """The single-gather sorted split path must reproduce the legacy
    (mask-gathering) wrapper bit-for-bit for trim-threshold masks."""
    import jax.numpy as jnp
    from cascadeclassifier_tpu.train.boost import (
        _block_split_fast, _ordered_split_block, _ordered_class_split_block,
        _best_of_block, as_f64,
    )

    rng = np.random.default_rng(5)
    B, N = 64, 200
    values = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
    sort_idx = jnp.asarray(np.argsort(np.asarray(values), axis=1).astype(np.int32))
    vs = jnp.take_along_axis(values, sort_idx, axis=1)
    w = rng.random(N)
    resp = rng.choice([-1.0, 1.0], N)
    cls = (resp > 0).astype(np.int32)
    valid = rng.random(N) < 0.9
    wthr = float(np.quantile(w, 0.3))
    mask = valid & (w >= wthr)

    wj = as_f64(w)
    rj = as_f64(resp)
    vj = jnp.asarray(valid)
    cj = jnp.asarray(cls)
    valid_s = vj[sort_idx]

    def _sorted64(a, si):
        import jax
        with jax.enable_x64(True):
            return a[si]

    import jax

    # regression (GAB)
    q_ref, thr_ref = _ordered_split_block(
        values, sort_idx, wj, rj, jnp.asarray(mask))
    with jax.enable_x64(True):
        qm_ref, i_ref = _best_of_block(q_ref)
    qm, i, thr_i = _block_split_fast(
        values, vs, valid_s, _sorted64(rj, sort_idx), wj, rj, cj, vj,
        as_f64(wthr), False, False, True)
    assert float(qm) == float(qm_ref) and int(i) == int(i_ref)
    assert float(thr_i) == float(np.asarray(thr_ref)[int(i_ref)])

    # classification (RAB / gini)
    q_ref, thr_ref = _ordered_class_split_block(
        values, sort_idx, wj, cj, jnp.asarray(mask), True)
    with jax.enable_x64(True):
        qm_ref, i_ref = _best_of_block(q_ref)
    qm, i, thr_i = _block_split_fast(
        values, vs, valid_s, cj[sort_idx], wj, rj, cj, vj,
        as_f64(wthr), True, True, True)
    assert float(qm) == float(qm_ref) and int(i) == int(i_ref)
    assert float(thr_i) == float(np.asarray(thr_ref)[int(i_ref)])


def test_predictor_device_stump_path_matches_host_walk():
    """The device all-stump predictor (mining hot path) must reproduce
    the host tree walk exactly; deep trees force the host fallback."""
    import copy

    from cascadeclassifier_tpu.models.model import Stage, WeakTree
    from cascadeclassifier_tpu.train.predictor import CascadePredictor
    from cascadeclassifier_tpu.train.trainer import make_evaluator

    rng = np.random.default_rng(9)
    samples = rng.integers(0, 256, (300, 24, 24)).astype(np.uint8)
    ev = make_evaluator(0, 24, 24)
    ev.set_samples(samples)
    med = {
        v: float(np.median(np.asarray(ev.values_for_vars([v]))[0]))
        for v in (11, 503, 77)
    }

    def stump(var, ll, rr):
        return WeakTree(
            left=np.array([0], np.int32), right=np.array([-1], np.int32),
            feature_idx=np.array([var], np.int32),
            threshold=np.array([med[var]], np.float32),
            leaf_values=np.array([ll, rr], np.float32),
        )

    stages = [
        Stage(threshold=-0.3, trees=[stump(11, -0.8, 0.9),
                                     stump(503, 0.7, -0.6)]),
        Stage(threshold=-0.1, trees=[stump(77, -0.5, 0.5)]),
    ]
    pred = CascadePredictor(lambda: ev, stages)
    ok_dev = pred.predict_batch(samples)

    # force the host walk by including a depth-2 tree in a copy
    deep = WeakTree(
        left=np.array([1, 0, -1], np.int32),
        right=np.array([2, -2, -3], np.int32),
        feature_idx=np.array([11, 503, 77], np.int32),
        threshold=np.array([med[11], med[503], med[77]], np.float32),
        leaf_values=np.array([0.0, -0.8, 0.9, 0.0], np.float32),
    )
    host_stages = copy.deepcopy(stages)
    host_stages.append(Stage(threshold=-10.0, trees=[deep]))  # accepts all
    pred_host = CascadePredictor(lambda: ev, host_stages)
    ok_host = pred_host.predict_batch(samples)
    assert ok_dev.sum() > 0 and ok_dev.sum() < len(samples)  # non-vacuous
    np.testing.assert_array_equal(ok_dev, ok_host)


def test_fill_negatives_dense_matches_window_loop(tmp_path):
    """The level-granular device mining in CascadeTrainer._fill_negatives
    must select the same negatives, consume the same window count, and
    leave the reader at the same schedule position as the reference's
    window-at-a-time fillPassedSamples loop (cascadeclassifier.cpp:334)."""
    import cv2

    from cascadeclassifier_tpu.data.negreader import NegReader
    from cascadeclassifier_tpu.models.model import Stage, WeakTree
    from cascadeclassifier_tpu.train.trainer import CascadeTrainer

    rng = np.random.default_rng(3)
    names = []
    for i, (h, w) in enumerate(((80, 100), (64, 72))):
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        p = str(tmp_path / f"bg{i}.png")
        cv2.imwrite(p, img)
        names.append(p)
    bg = str(tmp_path / "bg.txt")
    with open(bg, "w") as f:
        f.write("\n".join(names) + "\n")

    tr = CascadeTrainer(mining_batch=500)

    def stump(var, thr, ll, rr):
        return WeakTree(
            left=np.array([0], np.int32), right=np.array([-1], np.int32),
            feature_idx=np.array([var], np.int32),
            threshold=np.array([thr], np.float32),
            leaf_values=np.array([ll, rr], np.float32),
        )

    # a stage that accepts roughly half of random windows: threshold 0 on
    # a zero-median Haar feature
    tr.stages = [Stage(threshold=0.0, trees=[stump(11, 0.0, -1.0, 1.0)])]

    neg = NegReader(bg, 24, 24)
    cc = [0]
    kept = tr._fill_negatives(neg, 40, 0.0, cc)
    after = neg.take_batch(5)  # reader position after the fill

    # reference-loop twin: one window at a time through the same predictor
    neg2 = NegReader(bg, 24, 24)
    pred = tr._predictor()
    kept2, cc2 = [], 0
    while len(kept2) < 40:
        w = neg2.get()
        assert w is not None
        cc2 += 1
        if pred.predict_batch(w[None])[0]:
            kept2.append(w)
    after2 = neg2.take_batch(5)

    assert cc[0] == cc2
    np.testing.assert_array_equal(kept, np.stack(kept2))
    np.testing.assert_array_equal(after, after2)


def test_predict_levels_cache_evict_midbatch():
    """predict_levels must survive an image-cache eviction between
    superbatches AND never evict its own current superbatch's entries
    (regression: a mid-populate clear dropped freshly added levels)."""
    import numpy as np

    from cascadeclassifier_tpu.train.predictor import CascadePredictor
    from cascadeclassifier_tpu.train.trainer import make_evaluator

    pred = CascadePredictor(lambda: make_evaluator(0, 8, 8), [])
    pred.IMG_CACHE_CAP = 3  # force eviction every call
    rng = np.random.default_rng(0)
    for rep in range(3):
        levels = []
        for i in range(6):  # more uniques than the cap
            img = rng.integers(0, 256, (32, 40), np.uint8)
            pos = np.array([[0, 0], [8, 4], [16, 8]], np.int32)
            levels.append((img, pos, (rep, i)))
        oks = pred.predict_levels(levels, 8, 8)
        assert len(oks) == 6 and all(len(o) == 3 for o in oks)
        assert all(o.all() for o in oks)  # no stages -> all accepted


def test_predict_levels_power_of_two_uniques():
    """A superbatch whose UNIQUE image count is an exact power of two
    needs no zero pad image — the stack build must not touch the absent
    ('zero', Hp, Wp) cache entry (regression: eager `[cache[zk]] * 0`
    KeyError that killed a 20-stage training run at stage 5)."""
    import numpy as np

    from cascadeclassifier_tpu.train.predictor import CascadePredictor
    from cascadeclassifier_tpu.train.trainer import make_evaluator

    pred = CascadePredictor(lambda: make_evaluator(0, 8, 8), [])
    rng = np.random.default_rng(1)
    for n_uniq in (1, 2, 4):
        levels = []
        for i in range(n_uniq):
            img = rng.integers(0, 256, (384, 512), np.uint8)
            pos = np.array([[0, 0], [8, 4]], np.int32)
            levels.append((img, pos, ("p2", n_uniq, i)))
        oks = pred.predict_levels(levels, 8, 8)
        assert len(oks) == n_uniq and all(o.all() for o in oks)


def test_dense_grid_windows_byte_identical_to_crops():
    """_grid_windows (the dense-mining reshape extraction) must emit
    byte-identical windows to the host schedule crops for every grid
    position — selection equivalence of dense mining reduces to this
    (the predict chain itself is shared with the per-window path)."""
    import numpy as np

    from cascadeclassifier_tpu.train.predictor import _grid_windows

    rng = np.random.default_rng(7)
    for wh, ww, h, w, oy, ox in (
        (12, 12, 80, 104, 5, 3),    # even window, off-lattice origin
        (24, 24, 130, 97, 0, 0),    # slot crops the image tail
        (32, 75, 200, 260, 7, 11),  # odd stride (sx=37, kx=3)
    ):
        sy, sx = wh // 2, ww // 2
        ky, kx = -(-wh // sy), -(-ww // sx)
        bh, bw = 8 * sy, 8 * sx
        img = rng.integers(0, 256, (h, w), np.uint8)
        eh, ew = h - oy, w - ox
        if eh < wh or ew < ww:
            continue
        need_h = sy * ((eh - wh) // sy) + ky * sy
        need_w = sx * ((ew - ww) // sx) + kx * sx
        hp = -(-need_h // bh) * bh
        wp = -(-need_w // bw) * bw
        pad = np.zeros((1, hp, wp), np.uint8)
        ch, cw = min(eh, hp), min(ew, wp)
        pad[0, :ch, :cw] = img[oy : oy + ch, ox : ox + cw]
        ny = hp // sy - ky + 1
        nx = wp // sx - kx + 1
        win = np.asarray(
            _grid_windows(np.asarray(pad), sy, sx, wh, ww, ny, nx)
        ).reshape(ny, nx, wh, ww)
        for j in range((eh - wh) // sy + 1):
            for i in range((ew - ww) // sx + 1):
                y, x = oy + j * sy, ox + i * sx
                np.testing.assert_array_equal(
                    win[j, i], img[y : y + wh, x : x + ww]
                )


def test_fill_negatives_lazy_reader_identical(tmp_path):
    """NegReader(lazy=True) (the trainer default: levels resize
    ON-DEVICE during dense mining, on-host only for accepted crops)
    must select byte-identical negatives with identical consumption and
    schedule position to the eager host-resize reader."""
    import cv2

    from cascadeclassifier_tpu.data.negreader import NegReader
    from cascadeclassifier_tpu.models.model import Stage, WeakTree
    from cascadeclassifier_tpu.train.trainer import CascadeTrainer

    rng = np.random.default_rng(5)
    names = []
    for i, (h, w) in enumerate(((90, 120), (75, 64))):
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        p = str(tmp_path / f"bg{i}.png")
        cv2.imwrite(p, img)
        names.append(p)
    bg = str(tmp_path / "bg.txt")
    with open(bg, "w") as f:
        f.write("\n".join(names) + "\n")

    def stump(var, thr, ll, rr):
        return WeakTree(
            left=np.array([0], np.int32), right=np.array([-1], np.int32),
            feature_idx=np.array([var], np.int32),
            threshold=np.array([thr], np.float32),
            leaf_values=np.array([ll, rr], np.float32),
        )

    tr = CascadeTrainer(mining_batch=700)
    tr.stages = [Stage(threshold=0.0, trees=[stump(11, 0.0, -1.0, 1.0)])]

    outs = []
    for lazy in (False, True):
        neg = NegReader(bg, 24, 24, lazy=lazy)
        cc = [0]
        kept = tr._fill_negatives(neg, 30, 0.0, cc)
        outs.append((kept, cc[0], neg.take_batch(4)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    assert outs[0][1] == outs[1][1]
    np.testing.assert_array_equal(outs[0][2], outs[1][2])
