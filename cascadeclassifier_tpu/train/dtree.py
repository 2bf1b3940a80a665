"""Standalone CART decision trees (the reference's L1 ML core).

Covers the capability surface of CvDTree (o_cvdtree.cpp) as used and tested
by the reference (test_dtree.cpp): binary classification (weighted Gini)
and regression (weighted squared-error) on ordered and categorical
variables, depth / min-sample stopping, sample-index masking, priors, and
cost-complexity pruning selected by k-fold cross-validation with the
optional 1-SE rule (prune_cv, o_cvdtree.cpp:1561-1690).

The split search reuses the same vectorized device kernels as the boosted
trainer (a (D, N) block scan per node — the moral opposite of the
reference's per-variable serial loops). Pruning follows the standard CART
weakest-link construction; the reference's fold bookkeeping differs in
detail, so pruned trees are behaviorally (not node-for-node) equivalent.

Not implemented (unused by any reference test): surrogate splits for
missing values, >2-class classification, category clustering for
max_categories overflow.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax.numpy as jnp

from cascadeclassifier_tpu.train.boost import (
    _categorical_class_split_block,
    _categorical_split_block,
    _ordered_class_split_block,
    _ordered_split_block,
    as_f64,
)


@dataclasses.dataclass
class DTreeParams:
    """Defaults mirror CvDTreeParams (o_cvdtreeparams.cpp:5-29)."""

    max_depth: int = 2**31 - 1
    min_sample_count: int = 10
    cv_folds: int = 10
    use_1se_rule: bool = True
    regression_accuracy: float = 0.01
    priors: np.ndarray | None = None  # (2,) class priors


@dataclasses.dataclass
class _Node:
    leaf_value: float
    n: int
    risk: float  # training risk of this node as a leaf
    var: int = -1
    thr: float = 0.0
    subset: np.ndarray | None = None
    left: "_Node | None" = None
    right: "_Node | None" = None

    def is_leaf(self):
        return self.left is None


class DecisionTree:
    """CART for binary classification or regression.

    X: (N, D) float32 feature matrix; categorical columns hold integer
    codes in [0, 256) and are declared via ``categorical`` (list of column
    indices). y: (N,) {0,1} for classification, float for regression.
    """

    def __init__(
        self,
        params: DTreeParams | None = None,
        regression: bool = False,
        categorical=(),
    ):
        self.params = params or DTreeParams()
        self.regression = regression
        self.categorical = frozenset(categorical)
        self.root = None

    # ------------------------------------------------------------ fitting

    def fit(self, X, y, sample_weight=None, sample_idx=None):
        X = np.asarray(X, np.float32)
        y = np.asarray(y, np.float64)
        n = len(X)
        w = (
            np.asarray(sample_weight, np.float64)
            if sample_weight is not None
            else np.ones(n)
        )
        if not self.regression and self.params.priors is not None:
            pr = np.asarray(self.params.priors, np.float64)
            cls_w = pr / np.maximum(
                np.bincount(y.astype(int), minlength=2), 1
            )
            w = w * cls_w[y.astype(int)]
        mask = np.zeros(n, bool)
        if sample_idx is not None:
            mask[np.asarray(sample_idx)] = True
        else:
            mask[:] = True

        self._ord_cols = [d for d in range(X.shape[1]) if d not in self.categorical]
        self._cat_cols = sorted(self.categorical)
        self._Xo = np.ascontiguousarray(X[:, self._ord_cols].T)  # (Do, N)
        self._so = np.argsort(self._Xo, axis=1).astype(np.int32)
        self._Xc = (
            np.ascontiguousarray(X[:, self._cat_cols].T.astype(np.int32))
            if self._cat_cols
            else None
        )
        self.root = self._grow(w, y, mask, 0)
        if self.params.cv_folds > 1 and mask.sum() >= 2 * self.params.cv_folds:
            self._prune(X, y, w, mask)
        return self

    def _leaf_stats(self, y, w, mask):
        wm = w * mask
        sw = wm.sum()
        if self.regression:
            mean = float((wm * y).sum() / sw) if sw > 0 else 0.0
            risk = float((wm * (y - mean) ** 2).sum())
            return mean, risk
        w1 = float(wm[y == 1].sum())
        w0 = float(sw - w1)
        value = 1.0 if w1 > w0 else 0.0
        risk = min(w0, w1)  # weighted misclassification as a leaf
        return value, risk

    def _grow(self, w, y, mask, depth) -> _Node:
        count = int(mask.sum())
        value, risk = self._leaf_stats(y, w, mask)
        node = _Node(leaf_value=value, n=count, risk=risk)
        p = self.params
        if depth >= p.max_depth or count <= p.min_sample_count:
            return node
        if self.regression:
            # regression_accuracy stop (o_cvdtree.cpp try_split_node)
            wm = (w * mask).sum()
            if wm > 0 and np.sqrt(risk / wm) < p.regression_accuracy:
                return node
        elif risk == 0.0:
            return node

        best = self._best_split(w, y, mask)
        if best is None:
            return node
        kind, var, payload, _q = best
        if kind == "ord":
            col = self._ord_cols.index(var) if var in self._ord_cols else None
            vals = self._Xo[self._ord_cols.index(var)]
            go_left = vals <= payload
            node.var, node.thr = var, float(payload)
        else:
            ci = self._cat_cols.index(var)
            codes = self._Xc[ci].astype(np.int64)
            bits = (
                np.asarray(payload, np.uint32)[codes >> 5] >> (codes & 31)
            ) & 1
            go_left = bits != 0
            node.var, node.subset = var, np.asarray(payload, np.int32)
        lmask = mask & go_left
        rmask = mask & ~go_left
        if lmask.sum() == 0 or rmask.sum() == 0:
            node.var = -1
            node.subset = None
            return node
        node.left = self._grow(w, y, lmask, depth + 1)
        node.right = self._grow(w, y, rmask, depth + 1)
        return node

    def _best_split(self, w, y, mask):
        best = None
        wj = as_f64(w)
        mj = jnp.asarray(mask)
        if self.regression:
            rj = as_f64(y)
        else:
            cj = jnp.asarray(y.astype(np.int32))
        if self._Xo.shape[0]:
            if self.regression:
                q, thr = _ordered_split_block(
                    jnp.asarray(self._Xo), jnp.asarray(self._so), wj, rj, mj
                )
            else:
                q, thr = _ordered_class_split_block(
                    jnp.asarray(self._Xo), jnp.asarray(self._so), wj, cj, mj,
                    True,
                )
            q = np.asarray(q)
            i = int(np.argmax(q))
            if np.isfinite(q[i]):
                best = ("ord", self._ord_cols[i], np.float32(thr[i]), float(q[i]))
        if self._Xc is not None:
            if self.regression:
                q, subs = _categorical_split_block(
                    jnp.asarray(self._Xc), wj, rj, mj
                )
            else:
                q, subs = _categorical_class_split_block(
                    jnp.asarray(self._Xc), wj, cj, mj, True
                )
            q = np.asarray(q)
            i = int(np.argmax(q))
            if np.isfinite(q[i]) and (best is None or q[i] > best[3]):
                best = ("cat", self._cat_cols[i], np.asarray(subs[i]), float(q[i]))
        return best

    # ----------------------------------------------------------- pruning

    @staticmethod
    def _subtree(node):
        if node.is_leaf():
            return [node]
        return (
            DecisionTree._subtree(node.left)
            + DecisionTree._subtree(node.right)
            + [node]
        )

    def _prune(self, X, y, w, mask):
        """Cost-complexity pruning; alpha chosen by k-fold CV (+1-SE)."""
        alphas = self._alpha_sequence(self.root)
        if not alphas:
            return
        folds = self.params.cv_folds
        n = len(X)
        idx = np.nonzero(mask)[0]
        rng = np.random.default_rng(0)
        perm = rng.permutation(idx)
        fold_of = np.full(n, -1)
        for k, i in enumerate(perm):
            fold_of[i] = k % folds

        cv_err = np.zeros(len(alphas))
        cv_err2 = np.zeros(len(alphas))
        for k in range(folds):
            tr_mask = mask & (fold_of != k)
            te = mask & (fold_of == k)
            sub = DecisionTree(
                DTreeParams(
                    max_depth=self.params.max_depth,
                    min_sample_count=self.params.min_sample_count,
                    cv_folds=0,
                    regression_accuracy=self.params.regression_accuracy,
                ),
                regression=self.regression,
                categorical=self.categorical,
            )
            sub.fit(X, y, sample_weight=w, sample_idx=np.nonzero(tr_mask)[0])
            for ai, a in enumerate(alphas):
                pruned = sub._pruned_copy(sub.root, a)
                pred = sub._predict_node(pruned, X[te])
                if self.regression:
                    e = float(((pred - y[te]) ** 2).sum())
                else:
                    e = float((pred != y[te]).sum())
                cv_err[ai] += e
                cv_err2[ai] += e * e
        m = cv_err / folds
        best_ai = int(np.argmin(m))
        if self.params.use_1se_rule:
            se = np.sqrt(
                np.maximum(cv_err2 / folds - m * m, 0.0) / max(folds, 1)
            )
            lim = m[best_ai] + se[best_ai]
            for ai in range(len(alphas) - 1, -1, -1):
                if m[ai] <= lim:
                    best_ai = ai
                    break
        self.root = self._pruned_copy(self.root, alphas[best_ai])

    def _alpha_sequence(self, root):
        """Weakest-link alpha breakpoints of the full tree."""
        alphas = set()

        def subtree_stats(node):
            if node.is_leaf():
                return node.risk, 1
            lr, ln = subtree_stats(node.left)
            rr, rn = subtree_stats(node.right)
            r, leaves = lr + rr, ln + rn
            if leaves > 1:
                alphas.add(max((node.risk - r) / (leaves - 1), 0.0))
            return r, leaves

        subtree_stats(root)
        out = sorted(alphas)
        return [0.0] + [a * 1.0000001 for a in out]

    def _pruned_copy(self, node, alpha):
        if node.is_leaf():
            return node

        left = self._pruned_copy(node.left, alpha)
        right = self._pruned_copy(node.right, alpha)

        def stats(nd):
            if nd.is_leaf():
                return nd.risk, 1
            lr, ln = stats(nd.left)
            rr, rn = stats(nd.right)
            return lr + rr, ln + rn

        out = _Node(
            leaf_value=node.leaf_value,
            n=node.n,
            risk=node.risk,
            var=node.var,
            thr=node.thr,
            subset=node.subset,
            left=left,
            right=right,
        )
        r, leaves = stats(out)
        # weakest-link: collapse when the risk saved per removed leaf
        # g(t) = (R(t) − R_subtree)/(leaves−1) does not exceed alpha
        if leaves > 1 and (node.risk - r) / (leaves - 1) <= alpha:
            return _Node(leaf_value=node.leaf_value, n=node.n, risk=node.risk)
        return out

    # ---------------------------------------------------------- predict

    def _predict_node(self, root, X):
        X = np.asarray(X, np.float32)
        out = np.empty(len(X))
        node_ids = [root] * 1  # traverse iteratively per sample batch
        idx_all = np.arange(len(X))

        def rec(node, idx):
            if node.is_leaf():
                out[idx] = node.leaf_value
                return
            if node.subset is None:
                go_left = X[idx, node.var] <= node.thr
            else:
                codes = X[idx, node.var].astype(np.int64)
                go_left = (
                    (node.subset.astype(np.uint32)[codes >> 5] >> (codes & 31))
                    & 1
                ) != 0
            rec(node.left, idx[go_left])
            rec(node.right, idx[~go_left])

        rec(root, idx_all)
        return out

    def predict(self, X):
        assert self.root is not None, "tree has not been trained yet"
        return self._predict_node(self.root, X)

    def num_leaves(self):
        def cnt(nd):
            return 1 if nd.is_leaf() else cnt(nd.left) + cnt(nd.right)

        return cnt(self.root)
