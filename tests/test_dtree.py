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
