"""Preprocessing vs simple NumPy oracles (reference semantics
magi_v2.py:475-527,695-770)."""

import numpy as np

from magi_v2_tpu import preprocess


def test_discretize_shapes_and_alignment():
    ts = np.linspace(0.0, 4.0, 81)
    X = np.random.default_rng(0).normal(size=(81, 3))
    I, Xd = preprocess.discretize(ts, X, discretization=1)
    assert I.shape == (161, 1)
    assert Xd.shape == (161, 3)
    # original observations sit at every 2nd row
    np.testing.assert_allclose(I[::2, 0], ts)
    np.testing.assert_allclose(Xd[::2], X)
    assert np.all(np.isnan(Xd[1::2]))
    # inserted timesteps are midpoints
    np.testing.assert_allclose(I[1::2, 0], (ts[:-1] + ts[1:]) / 2)


def test_discretize_zero_means_identity():
    ts = np.linspace(0, 1, 11)
    X = np.random.default_rng(1).normal(size=(11, 2))
    I, Xd = preprocess.discretize(ts, X, discretization=0)
    np.testing.assert_allclose(I[:, 0], ts)
    np.testing.assert_allclose(Xd, X)


def test_linear_interpolate_fills_nans():
    X = np.array([[0.0, 1.0], [np.nan, np.nan], [2.0, 3.0], [np.nan, 5.0]])
    out = preprocess.linear_interpolate(X)
    np.testing.assert_allclose(out[:, 0], [0.0, 1.0, 2.0, 2.0])
    np.testing.assert_allclose(out[:, 1], [1.0, 2.0, 3.0, 5.0])


def test_linear_interpolate_keeps_fully_missing():
    X = np.full((5, 2), np.nan)
    X[:, 0] = 1.0
    out = preprocess.linear_interpolate(X)
    assert np.all(np.isnan(out[:, 1]))


def test_observation_index_roundtrip():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(7, 3))
    X[rng.random(X.shape) < 0.4] = np.nan
    idx = preprocess.build_observation_index(X)
    flat = X.ravel()
    np.testing.assert_allclose(flat[idx.not_nan_idxs], idx.y_observed)
    np.testing.assert_array_equal(idx.not_nan_cols, idx.not_nan_idxs % 3)
    np.testing.assert_array_equal(idx.N_ds, (~np.isnan(X)).sum(axis=0))


def test_cv_smoother_reduces_noise():
    rng = np.random.default_rng(3)
    I = np.linspace(0, 2 * np.pi, 101)
    truth = np.sin(I)
    noisy = truth + 0.3 * rng.normal(size=I.shape)
    smoothed = preprocess.single_cv_cubic_smoother(I, noisy)
    assert np.mean((smoothed - truth) ** 2) < 0.5 * np.mean((noisy - truth) ** 2)


def test_cv_smoother_small_n_passthrough():
    I = np.linspace(0, 1, 5)
    x = np.random.default_rng(4).normal(size=5)
    np.testing.assert_allclose(preprocess.single_cv_cubic_smoother(I, x), x)


def test_cv_smoother_matrix_columnwise():
    rng = np.random.default_rng(5)
    I = np.linspace(0, 1, 50)
    X = rng.normal(size=(50, 2))
    out = preprocess.cv_cubic_smoother(I, X)
    assert out.shape == X.shape
    for d in range(2):
        np.testing.assert_allclose(
            out[:, d], preprocess.single_cv_cubic_smoother(I, X[:, d])
        )
