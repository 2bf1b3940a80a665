"""Transcript parity with the reference's golden training runs.

The reference documents expected stdout for two runs on its bundled
fixtures (/root/reference/traincascade/res/README.md): 1-stage LBP and
HAAR BASIC at 75x32 from barcode.vec with numPos=100, numNeg=1,
numStages=10. These tests replay them through CascadeTrainer and assert
the transcript lines: the feature count, POS/NEG fill counts, the
| N | HR | FA | table (HR=1, FA=0 after one weak learner), and the
stage-1 stop reason ("Required leaf false alarm rate achieved").

One deliberate divergence: the reference "mines" its single negative
from the 32x32 bg.png via an out-of-bounds read (imagestorage.cpp:70-75
computes offset.x = -43 for a 75x32 window and nextImg's qualifying
check is skipped when no image qualifies, so NegReader::get copies from
img.ptr(0) - 43). We do not replicate undefined behavior; the tests use
a synthesized 256x128 textured negative, exactly like the reference's
own integration tests (test_integration.cpp stageResources).
"""

import contextlib
import io
import os

import numpy as np
import pytest

from cascadeclassifier_tpu.models.model import FEATURE_HAAR, FEATURE_LBP
from cascadeclassifier_tpu.train.trainer import CascadeTrainer

RES = "/root/reference/traincascade/res"

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.slow


def _fixture_paths(tmp_path):
    # a CONSTANT background: stage 0 (trained barcode-vs-flat) rejects
    # every candidate window, so stage 1's miner exhausts its acceptance
    # budget and the run stops with "Required leaf false alarm rate
    # achieved" exactly like the reference transcript. (The reference
    # reaches that state via an out-of-bounds read of its 32x32 bg.png —
    # see the module docstring — so the *content* of its one negative is
    # unreproducible; a constant image reproduces the *behavior*.)
    neg = np.full((128, 256), 128, np.uint8)
    neg_path = str(tmp_path / "neg.png")
    cv2.imwrite(neg_path, neg)
    bg = str(tmp_path / "bg.txt")
    with open(bg, "w") as f:
        f.write(neg_path + "\n")
    return os.path.join(RES, "barcode.vec"), bg


def _run(tmp_path, feature_type):
    vec, bg = _fixture_paths(tmp_path)
    tr = CascadeTrainer(feature_type=feature_type, win_w=75, win_h=32)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        model = tr.train(
            str(tmp_path / "data"), vec, bg, num_pos=100, num_neg=1,
            num_stages=10,
        )
    return model, buf.getvalue(), tr


def _assert_transcript(out, n_features):
    # the feature-count line is printed by the CLI parameter echo, not by
    # CascadeTrainer — asserted via the CLI in
    # tests/test_tools.py::test_traincascade_cli_feature_count_line
    # stage 0: all 100 positives consumed 1:1, single negative accepted
    assert "===== TRAINING 0-stage =====" in out
    assert "POS count : consumed   100 : 100" in out
    assert "NEG count : acceptanceRatio    1 : 1" in out
    # HR=1 FA=0 after ONE weak learner (reference res/README.md table)
    assert "|   1|        1|        0|" in out
    # stage 1 terminates on the required-leaf-FA condition
    assert "===== TRAINING 1-stage =====" in out
    assert (
        "Required leaf false alarm rate achieved. "
        "Branch training terminated." in out
    )
    assert "===== TRAINING 2-stage =====" not in out


def test_lbp_transcript_parity(tmp_path, oracle_bin):
    model, out, tr = _run(tmp_path, FEATURE_LBP)
    assert tr.evaluator.num_features == 152625  # res/README.md
    _assert_transcript(out, 152625)
    assert model is not None and len(model.stages) == 1
    assert len(model.stages[0].trees) == 1
    # the written cascade must load in the independent OpenCV runtime
    import subprocess

    r = subprocess.run(
        [oracle_bin, str(tmp_path / "data" / "cascade.xml"),
         os.path.join(RES, "ean13_5012345678900.png"), "1.1", "0"],
        capture_output=True, text=True,
    )
    assert r.stdout.startswith("LOADED")


def test_haar_transcript_parity(tmp_path):
    model, out, tr = _run(tmp_path, FEATURE_HAAR)
    assert tr.evaluator.num_features == 2790554  # res/README.md
    _assert_transcript(out, 2790554)
    assert model is not None and len(model.stages) == 1
    assert len(model.stages[0].trees) == 1
