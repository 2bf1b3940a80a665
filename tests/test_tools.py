"""Tools: createsamples golden parity, info→vec, CLI smoke, visualisation."""

import os
import subprocess
import sys

import numpy as np
import pytest

from cascadeclassifier_tpu.data.vec import read_vec, write_vec
from cascadeclassifier_tpu.tools.annotation import (
    normalize_rect,
    read_annotations,
    write_annotations,
)
from cascadeclassifier_tpu.tools.createsamples import (
    CvRNG,
    create_samples_from_info,
    create_training_samples,
)

cv2 = pytest.importorskip("cv2")

REF_IMG = "/root/reference/tools/createsamples/res/ean13_5012345678900.png"
REF_VEC = "/root/reference/tools/createsamples/res/expected_barcode.vec"
golden = pytest.mark.skipif(
    not os.path.exists(REF_VEC), reason="reference golden vec not mounted"
)


def test_cvrng_known_sequence():
    """cv::RNG MWC generator: state transition sanity."""
    r = CvRNG(12345)
    vals = [r.next() for _ in range(3)]
    assert all(0 <= v < 2**32 for v in vals)
    r2 = CvRNG(12345)
    assert [r2.next() for _ in range(3)] == vals


@golden
def test_createsamples_bit_parity_with_reference_golden(tmp_path):
    """The reference ships expected_barcode.vec for
    `createsamples -img ean13.png -num 100 -maxxangle 0 -maxyangle 0
     -maxzangle 1.6 -w 75 -h 32` (tools/createsamples/res/README.md).
    Our synthesis must be bit-identical."""
    out = str(tmp_path / "b.vec")
    create_training_samples(
        out, REF_IMG, 100, maxxangle=0, maxyangle=0, maxzangle=1.6,
        win_w=75, win_h=32, rngseed=12345,
    )
    np.testing.assert_array_equal(
        read_vec(out, 75, 32), read_vec(REF_VEC, 75, 32)
    )


def test_info_to_vec(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (60, 80)).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "img.png"), img)
    with open(tmp_path / "ann.dat", "w") as f:
        f.write("img.png 2 5 5 40 30 40 10 16 16\n")
    out = str(tmp_path / "o.vec")
    n = create_samples_from_info(str(tmp_path / "ann.dat"), out, 10, 24, 24)
    assert n == 2
    v = read_vec(out, 24, 24)
    # first rect downsizes with INTER_AREA — compare against cv2 directly
    ref0 = cv2.resize(img[5:35, 5:45], (24, 24), interpolation=cv2.INTER_AREA)
    np.testing.assert_array_equal(v[0], ref0)


def test_annotation_roundtrip(tmp_path):
    assert normalize_rect(10, 20, 4, 6) == (4, 6, 6, 14)
    ann = {"a.png": [(1, 2, 3, 4), (5, 6, 7, 8)], "b.png": []}
    p = str(tmp_path / "ann.txt")
    write_annotations(p, ann)
    assert read_annotations(p) == ann


def test_traincascade_cli_help():
    from cascadeclassifier_tpu.tools.traincascade_cli import build_parser

    p = build_parser()
    a = p.parse_args(
        ["-data", "d", "-vec", "v", "-bg", "b", "-numPos", "5",
         "-featureType", "LBP", "-w", "16", "-h", "12", "-bt", "RAB"]
    )
    assert a.numPos == 5 and a.featureType == "LBP" and a.win_w == 16


def test_traincascade_cli_feature_count_line(capsys):
    """The CLI parameter echo prints the reference transcript's unique
    feature count (res/README.md: 152,625 LBP features at 75x32)."""
    from cascadeclassifier_tpu.tools.traincascade_cli import (
        build_parser,
        make_trainer,
        print_parameters,
    )

    args = build_parser().parse_args(
        ["-data", "d", "-vec", "v", "-bg", "b", "-featureType", "LBP",
         "-w", "75", "-h", "32"]
    )
    print_parameters(args, make_trainer(args))
    out = capsys.readouterr().out
    assert "given windowSize [75,32] : 152625" in out


def test_visualisation(tmp_path):
    from cascadeclassifier_tpu.models.xml_io import read_cascade_xml
    from cascadeclassifier_tpu.tools.visualisation_cli import main

    xml = "/usr/share/opencv4/haarcascades/haarcascade_frontalface_alt.xml"
    if not os.path.exists(xml):
        pytest.skip("pretrained cascade missing")
    out = str(tmp_path / "vis")
    assert main(["--model", xml, "--data", out, "--scale", "4"]) == 0
    assert len(os.listdir(out)) == 22


def test_visualisation_video(tmp_path):
    """--video writes the per-feature animation (one frame per weak
    feature — reference opencv_visualisation.cpp:182-192, 235-276)."""
    import cv2

    from cascadeclassifier_tpu.models.xml_io import read_cascade_xml
    from cascadeclassifier_tpu.tools.visualisation_cli import main

    xml = "/usr/share/opencv4/haarcascades/haarcascade_frontalface_alt.xml"
    if not os.path.exists(xml):
        pytest.skip("pretrained cascade missing")
    out = str(tmp_path / "vis")
    assert main(
        ["--model", xml, "--data", out, "--scale", "4", "--video"]
    ) == 0
    vids = [f for f in os.listdir(out)
            if f.startswith("model_visualization")]
    assert len(vids) == 1
    cap = cv2.VideoCapture(os.path.join(out, vids[0]))
    assert cap.isOpened()
    n_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    model = read_cascade_xml(xml)
    n_feat = sum(
        t.num_nodes for s in model.stages for t in s.trees
    )
    assert n_frames == n_feat


def test_detect_cli_routes_hog_cascade(tmp_path, capsys):
    """tpu-detect serves HOG cascades via HOGDetector (the OpenCV runtime
    cannot serve HOG at all — reference detection samples are Haar/LBP
    only, tools/detection/Cpp/main.cpp:42-49)."""
    import cv2

    from cascadeclassifier_tpu.models.model import (
        FEATURE_HOG,
        CascadeModel,
        HOGFeature,
        Stage,
        WeakTree,
    )
    from cascadeclassifier_tpu.models.xml_io import write_cascade_xml
    from cascadeclassifier_tpu.ops.features import hog_catalog
    from cascadeclassifier_tpu.tools.detect_cli import main

    cat = hog_catalog(32, 32)
    tree = WeakTree(
        left=np.array([-1], np.int32),
        right=np.array([-2], np.int32),
        feature_idx=np.array([0], np.int32),
        threshold=np.array([0.5], np.float32),
        leaf_values=np.array([0.0, -1.0, 1.0], np.float32),
    )
    # accept-everything stage: routing is what is under test
    model = CascadeModel(
        feature_type=FEATURE_HOG, width=32, height=32,
        stages=[Stage(threshold=-10.0, trees=[tree])],
        features=[HOGFeature(rect=tuple(int(v) for v in cat.rects[0]),
                             component=0)],
        feat_size=36,
    ).validate()
    xml = str(tmp_path / "hog.xml")
    write_cascade_xml(model, xml)
    img = np.random.default_rng(0).integers(
        0, 256, (40, 44)
    ).astype(np.uint8)
    png = str(tmp_path / "scene.png")
    cv2.imwrite(png, img)
    rc = main([xml, png, "--scale-factor", "1.2", "--min-neighbors", "1"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    # the accept-all cascade must fire on the grid
    assert len(out) >= 1 and all(len(l.split()) == 4 for l in out)
