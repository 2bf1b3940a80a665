"""Multi-scale detector for HOG-feature cascades.

The OpenCV runtime never supported HOG cascades (the reference trains them
but cannot detect with them — SURVEY §2.3), so detection semantics are this
framework's own. We define them to be **crop-consistent with training**:
every candidate window is evaluated exactly like a training sample
(per-window gradient histograms with replicated borders at the window edge,
CvHOGEvaluator semantics), so a window that scored s during training scores
s at detection time. The parity oracle is therefore our own trainer →
predictor round trip.

Pipeline: per pyramid level — bit-exact resize, all windows on the ystep
grid extracted as a batch, evaluated through the training-side predictor;
then cvRound coordinate mapping + groupRectangles, matching the geometry of
the Haar/LBP detector.
"""

from __future__ import annotations

import numpy as np

from cascadeclassifier_tpu.detect.grouping import clip_rects, group_rectangles
from cascadeclassifier_tpu.detect.pyramid import build_plan
from cascadeclassifier_tpu.models.model import FEATURE_HOG, CascadeModel
from cascadeclassifier_tpu.ops.features import hog_catalog
from cascadeclassifier_tpu.ops.resize import resize_linear_exact_np
from cascadeclassifier_tpu.train.evaluators import HOGTrainEvaluator
from cascadeclassifier_tpu.train.predictor import CascadePredictor


class HOGDetector:
    """detectMultiScale for HOG cascades (crop-consistent semantics)."""

    def __init__(self, model: CascadeModel, batch: int = 2048):
        assert model.feature_type == FEATURE_HOG
        self.model = model
        self.batch = batch
        self._ev = HOGTrainEvaluator(hog_catalog(model.width, model.height))
        # stages reference compacted feature list; rebuild global var ids
        self._stages = self._stages_with_global_vars(model)
        self._pred = CascadePredictor(lambda: self._ev, self._stages)

    @staticmethod
    def _stages_with_global_vars(model: CascadeModel):
        """Map compacted feature indices back to catalog variable ids."""
        import copy

        cat = hog_catalog(model.width, model.height)
        rect_to_fi = {
            tuple(int(v) for v in cat.rects[i]): i for i in range(len(cat))
        }
        stages = copy.deepcopy(model.stages)
        for s in stages:
            for t in s.trees:
                for ni in range(t.num_nodes):
                    f = model.features[int(t.feature_idx[ni])]
                    fi = rect_to_fi[tuple(f.rect)]
                    t.feature_idx[ni] = fi * 36 + f.component
        return stages

    def detect_multi_scale(
        self,
        img: np.ndarray,
        scale_factor: float = 1.1,
        min_neighbors: int = 3,
        min_size=None,
        max_size=None,
    ) -> np.ndarray:
        assert img.ndim == 2 and img.dtype == np.uint8
        h, w = img.shape
        ww, wh = self.model.width, self.model.height
        plan = build_plan(
            w, h, ww, wh, scale_factor,
            tuple(min_size) if min_size else None,
            tuple(max_size) if max_size else None,
        )
        rects = []
        for s, f in enumerate(plan.scales):
            sw, sh = int(plan.scaled_w[s]), int(plan.scaled_h[s])
            if sw < ww or sh < wh:
                continue
            step = int(plan.ystep[s])
            scaled = resize_linear_exact_np(img, sw, sh)
            ys = np.arange((sh + 1 - wh) // step) * step
            xs = np.arange(0, sw - ww + 1, step)
            if len(ys) == 0 or len(xs) == 0:
                continue
            wins = np.lib.stride_tricks.sliding_window_view(
                scaled, (wh, ww)
            )[np.ix_(ys, xs)]
            grid = wins.reshape(-1, wh, ww)
            ok = np.zeros(len(grid), bool)
            for lo in range(0, len(grid), self.batch):
                ok[lo : lo + self.batch] = self._pred.predict_batch(
                    grid[lo : lo + self.batch]
                )
            yy, xx = np.meshgrid(ys, xs, indexing="ij")
            sel = ok.reshape(len(ys), len(xs))
            fx = np.float64(f)
            for (gy, gx) in zip(yy[sel], xx[sel]):
                x_img = int(np.rint(gx * fx))
                y_img = int(np.rint(gy * fx))
                rects.append(
                    (x_img, y_img, int(plan.box_w[s]), int(plan.box_h[s]))
                )
        # group UNCLIPPED candidates, clip the grouped output — same
        # order as detectMultiScale (groupRectangles then clipObjects)
        return clip_rects(
            group_rectangles(
                np.array(rects, np.int64).reshape(-1, 4), min_neighbors
            ),
            w,
            h,
        )
