"""Standalone CART layer — mirrors the reference test_dtree.cpp scenarios:
separable 1-D/2-D classification, generalization, regression mode,
cv_folds pruning on noisy data, sampleIdx masking."""

import numpy as np
import pytest

from cascadeclassifier_tpu.train.dtree import DecisionTree, DTreeParams


def test_separable_1d_classification():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (200, 1)).astype(np.float32)
    y = (x[:, 0] > 0.1).astype(np.float64)
    t = DecisionTree(DTreeParams(cv_folds=0)).fit(x, y)
    assert (t.predict(x) == y).mean() == 1.0
    # generalization on fresh points
    xt = rng.uniform(-1, 1, (100, 1)).astype(np.float32)
    yt = (xt[:, 0] > 0.1).astype(np.float64)
    assert (t.predict(xt) == yt).mean() > 0.95


def test_separable_2d_classification():
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (400, 2)).astype(np.float32)
    y = ((x[:, 0] > 0) & (x[:, 1] > 0)).astype(np.float64)
    t = DecisionTree(DTreeParams(cv_folds=0)).fit(x, y)
    assert (t.predict(x) == y).mean() > 0.99


def test_regression_mode():
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 4, (300, 1)).astype(np.float32)
    y = np.floor(x[:, 0])  # staircase
    t = DecisionTree(
        DTreeParams(cv_folds=0, regression_accuracy=0.01), regression=True
    ).fit(x, y)
    assert np.abs(t.predict(x) - y).mean() < 0.1


def test_cv_pruning_shrinks_noisy_tree():
    """On pure-noise labels, CV pruning should collapse the tree far below
    the unpruned size (the reference's test asserts the same idea)."""
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
    y = rng.integers(0, 2, 300).astype(np.float64)  # pure noise
    full = DecisionTree(DTreeParams(cv_folds=0, min_sample_count=5)).fit(x, y)
    pruned = DecisionTree(
        DTreeParams(cv_folds=10, min_sample_count=5, use_1se_rule=True)
    ).fit(x, y)
    assert pruned.num_leaves() <= full.num_leaves() // 3
    assert pruned.num_leaves() <= 16


def test_sample_idx_masking():
    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, (200, 1)).astype(np.float32)
    y = (x[:, 0] > 0).astype(np.float64)
    # poison the excluded half; the tree must ignore it
    y2 = y.copy()
    y2[100:] = rng.integers(0, 2, 100)
    t = DecisionTree(DTreeParams(cv_folds=0)).fit(
        x, y2, sample_idx=np.arange(100)
    )
    assert (t.predict(x[:100]) == y2[:100]).mean() == 1.0


def test_categorical_split():
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 8, 300)
    y = np.isin(codes, [1, 3, 5]).astype(np.float64)
    x = codes[:, None].astype(np.float32)
    t = DecisionTree(DTreeParams(cv_folds=0), categorical=[0]).fit(x, y)
    assert (t.predict(x) == y).mean() == 1.0


def test_priors_shift_decision():
    rng = np.random.default_rng(6)
    x = rng.uniform(-1, 1, (400, 1)).astype(np.float32)
    y = (x[:, 0] > 0.9).astype(np.float64)  # 5% positives
    heavy = DecisionTree(
        DTreeParams(cv_folds=0, priors=np.array([1.0, 50.0]))
    ).fit(x, y)
    # with a heavy positive prior no positive may be misclassified
    assert (heavy.predict(x)[y == 1] == 1).all()


def test_predict_before_fit_raises():
    with pytest.raises(AssertionError):
        DecisionTree().predict(np.zeros((1, 1), np.float32))


def test_multiclass_classification():
    """>2-class CART (calc_node_value / find_split_ord_class multiclass,
    o_cvdtree.cpp:359-469, 1074-1173): 3 separable clusters in 2-D."""
    rng = np.random.default_rng(5)
    n = 300
    X = rng.normal(size=(n, 2)).astype(np.float32)
    y = np.zeros(n)
    X[100:200, 0] += 6
    y[100:200] = 1
    X[200:, 1] += 6
    y[200:] = 2
    t = DecisionTree(DTreeParams(cv_folds=0, min_sample_count=5))
    t.fit(X, y)
    acc = (t.predict(X) == y).mean()
    assert acc > 0.97
    # generalization
    Xt = np.array([[0, 0], [6, 0], [0, 6]], np.float32)
    assert list(t.predict(Xt)) == [0.0, 1.0, 2.0]


def test_multiclass_categorical_clustering():
    """Categorical multiclass split goes through cluster_categories
    (o_cvdtree.cpp:470-547) when categories exceed max_categories."""
    rng = np.random.default_rng(6)
    n = 600
    cats = rng.integers(0, 60, n)  # 60 categories > max_categories=10
    y = cats % 3  # class fully determined by category
    X = np.stack([cats, rng.normal(size=n)], axis=1).astype(np.float32)
    t = DecisionTree(
        DTreeParams(cv_folds=0, min_sample_count=5, max_categories=10),
        categorical=(0,),
    )
    t.fit(X, y.astype(np.float64))
    acc = (t.predict(X) == y).mean()
    assert acc > 0.9


def test_surrogate_splits_missing_values():
    """Surrogates (o_cvdtree.cpp:860-1059): feature 0 predicts the class,
    feature 1 is strongly correlated with it; samples missing feature 0
    must still route correctly via the surrogate at predict time."""
    rng = np.random.default_rng(7)
    n = 400
    y = (np.arange(n) % 2).astype(np.float64)
    f0 = np.where(y == 1, 2.0, -2.0) + rng.normal(scale=0.3, size=n)
    f1 = f0 + rng.normal(scale=0.2, size=n)  # surrogate candidate
    X = np.stack([f0, f1], axis=1).astype(np.float32)
    Xm = X.copy()
    miss = rng.random(n) < 0.2
    Xm[miss, 0] = np.nan
    t = DecisionTree(
        DTreeParams(cv_folds=0, min_sample_count=5, use_surrogates=True)
    )
    t.fit(Xm, y)
    # held-out samples with feature 0 missing entirely
    Xt = np.stack(
        [np.full(50, np.nan), np.where(np.arange(50) % 2 == 1, 2.0, -2.0)],
        axis=1,
    ).astype(np.float32)
    yt = (np.arange(50) % 2).astype(np.float64)
    acc = (t.predict(Xt) == yt).mean()
    assert acc > 0.95, acc
    # the root must actually carry surrogates
    assert t.root.surrogates, "no surrogate splits recorded"


def test_missing_values_regression():
    """Missing-value regression with the numpy split path."""
    rng = np.random.default_rng(8)
    n = 300
    x = rng.uniform(-1, 1, n)
    y = np.where(x > 0, 5.0, -5.0) + rng.normal(scale=0.1, size=n)
    X = np.stack([x, x + rng.normal(scale=0.05, size=n)], axis=1).astype(
        np.float32
    )
    X[rng.random(n) < 0.15, 0] = np.nan
    t = DecisionTree(
        DTreeParams(cv_folds=0, min_sample_count=10), regression=True
    )
    t.fit(X, y)
    pred = t.predict(np.array([[0.5, 0.5], [-0.5, -0.5]], np.float32))
    assert abs(pred[0] - 5.0) < 1.0 and abs(pred[1] + 5.0) < 1.0
