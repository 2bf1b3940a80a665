"""Training-side cascade predictor for sample filtering.

Mirrors CvCascadeClassifier::predict → CvCascadeBoost::predict
(cascadeclassifier.cpp:297-306, boost.cpp:461-477): training-evaluator
feature semantics, tree walk with ``val <= c`` (ordered) or subset-bit
(categorical), stage rejection at ``sum < threshold − 1e-5``.

Evaluates whole window batches at once: the features used by the trained
stages (a few hundred) are computed for the entire batch via one MXU
matmul, then the small trees are walked vectorized in numpy.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

CV_THRESHOLD_EPS = 1e-5


class CascadePredictor:
    """Predicts accept/reject of the current (partial) cascade on batches."""

    def __init__(self, evaluator_factory, stages=None):
        """evaluator_factory: () → fresh train evaluator over the full
        catalog (set_samples + values_for the used variables)."""
        self._make_ev = evaluator_factory
        self.stages = list(stages or [])

    def add_stage(self, stage):
        self.stages.append(stage)

    def _used_vars(self):
        used = set()
        for s in self.stages:
            for t in s.trees:
                used.update(int(v) for v in t.feature_idx)
        return sorted(used)

    def predict_batch(self, samples: np.ndarray) -> np.ndarray:
        """samples: (m, h, w) uint8 → (m,) bool — True when every stage
        accepts (1 == reference predict)."""
        m = samples.shape[0]
        if not self.stages or m == 0:
            return np.ones(m, bool)
        # pad to a bucketed batch so mining reuses compiled programs
        m_pad = max(256, -(-m // 256) * 256)
        if m_pad != m:
            samples = np.concatenate(
                [samples, np.zeros((m_pad - m,) + samples.shape[1:],
                                   samples.dtype)]
            )
        used = self._used_vars()
        # pad the used-variable list to a bucket so the number of trained
        # stages doesn't trigger recompiles of the evaluation program
        k = len(used)
        k_pad = max(16, -(-k // 16) * 16)
        used_padded = used + [used[0]] * (k_pad - k)
        ev = self._make_ev()
        ev.set_samples(samples)
        vals = np.asarray(ev.values_for_vars(used_padded))[:k, :m]  # (K, m)
        var_pos = {v: i for i, v in enumerate(used)}

        ok = np.ones(m, bool)
        categorical = ev.maxCatCount > 0
        for stage in self.stages:
            sums = np.zeros(m, np.float64)
            for tree in stage.trees:
                node = np.zeros(m, np.int32)
                out = np.zeros(m, np.float64)
                active = np.ones(m, bool)
                for _ in range(tree.num_nodes + 1):
                    if not active.any():
                        break
                    for ni in np.unique(node[active]):
                        sel = active & (node == ni)
                        v = vals[var_pos[int(tree.feature_idx[ni])]][sel]
                        if categorical:
                            code = v.astype(np.int64)
                            bit = (
                                tree.subsets[ni].astype(np.uint32)[code >> 5]
                                >> (code & 31)
                            ) & 1
                            go_left = bit != 0
                        else:
                            go_left = v <= tree.threshold[ni]
                        child = np.where(go_left, tree.left[ni], tree.right[ni])
                        idx = np.nonzero(sel)[0]
                        leaf = child <= 0
                        out[idx[leaf]] = tree.leaf_values[-child[leaf]]
                        active[idx[leaf]] = False
                        node[idx[~leaf]] = child[~leaf]
                sums += out
            ok &= ~(sums < stage.threshold - CV_THRESHOLD_EPS)
        return ok
