"""Cascade XML I/O: pretrained-file parsing, round-trips, OpenCV cross-load."""

import os
import subprocess

import numpy as np
import pytest

from cascadeclassifier_tpu.models.model import (
    FEATURE_HAAR,
    FEATURE_LBP,
    CascadeModel,
    HaarFeature,
    Stage,
    WeakTree,
)
from cascadeclassifier_tpu.models.xml_io import (
    read_cascade_xml,
    read_params_xml,
    read_stage_xml,
    write_cascade_xml,
    write_legacy_haar_xml,
    write_params_xml,
    write_stage_xml,
)

HAAR_ALT = "/usr/share/opencv4/haarcascades/haarcascade_frontalface_alt.xml"
LBP_FRONTAL = "/usr/share/opencv4/lbpcascades/lbpcascade_frontalface.xml"

pretrained = pytest.mark.skipif(
    not os.path.exists(HAAR_ALT), reason="system OpenCV cascades not installed"
)


def _models_equal(m1, m2):
    assert m1.num_stages == m2.num_stages
    assert len(m1.features) == len(m2.features)
    assert (m1.width, m1.height) == (m2.width, m2.height)
    for s1, s2 in zip(m1.stages, m2.stages):
        assert s1.threshold == pytest.approx(s2.threshold, abs=1e-12)
        assert s1.weak_count == s2.weak_count
        for t1, t2 in zip(s1.trees, s2.trees):
            np.testing.assert_array_equal(t1.left, t2.left)
            np.testing.assert_array_equal(t1.right, t2.right)
            np.testing.assert_array_equal(t1.feature_idx, t2.feature_idx)
            if t1.threshold is not None:
                np.testing.assert_array_equal(t1.threshold, t2.threshold)
            if t1.subsets is not None:
                np.testing.assert_array_equal(t1.subsets, t2.subsets)
            np.testing.assert_array_equal(t1.leaf_values, t2.leaf_values)
    assert repr(m1.features) == repr(m2.features)


@pretrained
def test_read_pretrained_haar():
    m = read_cascade_xml(HAAR_ALT)
    assert m.feature_type == FEATURE_HAAR
    assert m.num_stages == 22
    assert (m.width, m.height) == (20, 20)
    assert m.max_cat_count == 0
    assert all(t.is_stump() for s in m.stages for t in s.trees)


@pretrained
def test_read_pretrained_lbp():
    m = read_cascade_xml(LBP_FRONTAL)
    assert m.feature_type == FEATURE_LBP
    assert m.max_cat_count == 256
    assert m.stages[0].trees[0].subsets.shape == (1, 8)


@pretrained
@pytest.mark.parametrize("path", [HAAR_ALT, LBP_FRONTAL])
def test_roundtrip_pretrained(tmp_path, path):
    m = read_cascade_xml(path)
    out = str(tmp_path / "cascade.xml")
    write_cascade_xml(m, out)
    _models_equal(m, read_cascade_xml(out))


@pretrained
@pytest.mark.parametrize("path", [HAAR_ALT, LBP_FRONTAL])
def test_written_xml_loads_in_opencv(tmp_path, path, oracle_bin):
    """The reference's strongest oracle (test_integration.cpp:126): the file
    we write must load in the independent cv::CascadeClassifier."""
    m = read_cascade_xml(path)
    out = str(tmp_path / "cascade.xml")
    write_cascade_xml(m, out)
    img = str(tmp_path / "img.png")
    import cv2

    cv2.imwrite(img, np.random.default_rng(0).integers(0, 255, (64, 64)).astype(np.uint8))
    r = subprocess.run([oracle_bin, out, img], capture_output=True, text=True)
    assert "LOADED" in r.stdout


def _tiny_model(categorical=False):
    if categorical:
        trees = [
            WeakTree(
                left=np.array([0], np.int32),
                right=np.array([-1], np.int32),
                feature_idx=np.array([0], np.int32),
                subsets=np.array([[0x0F0F, -1, 3, 0, 0, 0, 0, 0]], np.int32),
                leaf_values=np.array([-0.5, 0.75], np.float32),
            )
        ]
        from cascadeclassifier_tpu.models.model import LBPFeature

        return CascadeModel(
            feature_type=FEATURE_LBP,
            width=24,
            height=24,
            stages=[Stage(threshold=-0.3, trees=trees)],
            features=[LBPFeature(rect=(1, 2, 3, 4))],
            max_cat_count=256,
        )
    trees = [
        WeakTree(
            left=np.array([1, 0, -1], np.int32),
            right=np.array([2, -2, -3], np.int32),
            feature_idx=np.array([0, 1, 0], np.int32),
            threshold=np.array([0.5, -1.25, 3.0], np.float32),
            leaf_values=np.array([0.1, -0.2, 0.3, -0.4], np.float32),
        )
    ]
    return CascadeModel(
        feature_type=FEATURE_HAAR,
        width=24,
        height=24,
        stages=[Stage(threshold=0.82, trees=trees)],
        features=[
            HaarFeature(rects=[(0, 0, 4, 4, -1.0), (2, 0, 2, 4, 2.0)]),
            HaarFeature(rects=[(1, 1, 6, 3, -1.0), (1, 2, 6, 1, 3.0)], tilted=True),
        ],
        max_depth=2,
    )


def test_roundtrip_synthetic_deep_tree(tmp_path):
    m = _tiny_model()
    out = str(tmp_path / "c.xml")
    write_cascade_xml(m, out)
    _models_equal(m, read_cascade_xml(out))


def test_roundtrip_synthetic_categorical(tmp_path):
    m = _tiny_model(categorical=True)
    out = str(tmp_path / "c.xml")
    write_cascade_xml(m, out)
    m2 = read_cascade_xml(out)
    _models_equal(m, m2)


def test_params_and_stage_checkpoints(tmp_path):
    m = _tiny_model()
    p = str(tmp_path / "params.xml")
    write_params_xml(m, p)
    m2 = read_params_xml(p)
    assert (m2.width, m2.height) == (24, 24)
    assert m2.min_hit_rate == pytest.approx(0.995)
    assert m2.max_depth == 2

    sp = str(tmp_path / "stage0.xml")
    write_stage_xml(m.stages[0], False, sp, "stage0")
    s = read_stage_xml(sp, 0)
    assert s.threshold == pytest.approx(m.stages[0].threshold, abs=1e-9)
    np.testing.assert_array_equal(s.trees[0].left, m.stages[0].trees[0].left)


def test_legacy_haar_roundtrip(tmp_path):
    m = _tiny_model()
    out = str(tmp_path / "legacy.xml")
    write_legacy_haar_xml(m, out)
    m2 = read_cascade_xml(out)
    assert m2.num_stages == 1
    t1, t2 = m.stages[0].trees[0], m2.stages[0].trees[0]
    # legacy stores features inline per node; geometry must survive
    np.testing.assert_array_equal(t1.threshold, t2.threshold)
    assert m2.features[t2.feature_idx[0]].rects == m.features[t1.feature_idx[0]].rects


@pretrained
def test_legacy_haar_loads_in_opencv(tmp_path, oracle_bin):
    m = read_cascade_xml(HAAR_ALT)
    out = str(tmp_path / "legacy.xml")
    write_legacy_haar_xml(m, out)
    import cv2

    img = str(tmp_path / "img.png")
    cv2.imwrite(img, np.random.default_rng(0).integers(0, 255, (64, 64)).astype(np.uint8))
    r = subprocess.run([oracle_bin, out, img], capture_output=True, text=True)
    assert "LOADED" in r.stdout


def test_resume_with_corrupt_stage_xml_errors(tmp_path):
    """Fault injection: a truncated/corrupt stage checkpoint must raise a
    clean parse error on resume, not load garbage stages (the reference
    throws from FileStorage on malformed checkpoints)."""
    import pytest

    from cascadeclassifier_tpu.train.trainer import CascadeTrainer

    tr = CascadeTrainer(win_w=12, win_h=12)
    from cascadeclassifier_tpu.models.xml_io import write_params_xml

    write_params_xml(tr._to_model(compact=False), str(tmp_path / "params.xml"))
    (tmp_path / "stage0.xml").write_text(
        "<?xml version=\"1.0\"?>\n<opencv_storage><stage0><maxWeakCount>"
    )  # truncated mid-document
    tr2 = CascadeTrainer(win_w=12, win_h=12)
    with pytest.raises(Exception) as ei:
        tr2.load(str(tmp_path))
    assert not isinstance(ei.value, (SystemExit, KeyboardInterrupt))


def test_vec_truncated_mid_stream_errors(tmp_path):
    """Fault injection: a vec file whose payload is shorter than its
    header claims must raise VecError when the reader runs past the end
    (imagestorage.cpp:166-174 CV_Error semantics)."""
    import pytest

    from cascadeclassifier_tpu.data.vec import PosReader, VecError, write_vec

    s = np.random.default_rng(0).integers(0, 256, (6, 12, 12)).astype(np.uint8)
    p = str(tmp_path / "t.vec")
    write_vec(p, s)
    # chop the last record in half
    data = open(p, "rb").read()
    open(p, "wb").write(data[: len(data) - 100])
    with pytest.raises((VecError, ValueError)):
        r = PosReader(p, 12, 12)
        for _ in range(6):
            r.take(1)
