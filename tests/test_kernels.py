"""Matern kernel-matrix builder vs independent SciPy oracles.

Oracles are built directly from the Matern definition with scipy.special.kv
and central finite differences — fully independent of both our JAX code and
the reference's closed forms — so they validate the *math*, including the
diagonal limits the reference hard-codes (magi_v2.py:795,802,815).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special as sps

from magi_v2_tpu.ops.kernels import (
    magi_kernel_matrices,
    matern_derivative_matrices,
    matern_gram,
)
from magi_v2_tpu.ops.linalg import band_part, sym_pinv

V = 2.01


def matern_scalar(s, t, phi1, phi2, v=V):
    """Scalar Matern kernel via SciPy — the test oracle."""
    l = abs(s - t)
    if l == 0.0:
        return phi1
    u = np.sqrt(2 * v) * l / phi2
    return phi1 * 2.0 ** (1 - v) / sps.gamma(v) * u ** v * sps.kv(v, u)


@pytest.fixture(scope="module")
def grid():
    return np.linspace(0.0, 4.0, 33)


@pytest.mark.parametrize("phi1,phi2", [(1.0, 0.5), (3.7, 1.3), (0.2, 2.5)])
def test_gram_matches_scipy(grid, phi1, phi2):
    ours = np.asarray(matern_gram(jnp.asarray(grid), phi1, phi2, V))
    ref = np.array([[matern_scalar(s, t, phi1, phi2) for t in grid] for s in grid])
    np.testing.assert_allclose(ours, ref, rtol=1e-11, atol=1e-14)


def test_derivative_matrices_match_finite_differences(grid):
    phi1, phi2 = 2.0, 0.8
    kappa, dk_ds, kpp = (
        np.asarray(m)
        for m in matern_derivative_matrices(jnp.asarray(grid), phi1, phi2, V)
    )
    h = 1e-6
    h2 = 1e-4  # cross-derivative: balance trunc (h^2) vs roundoff (eps/h^2)
    # spot-check a set of off-diagonal pairs
    rng = np.random.default_rng(0)
    for _ in range(30):
        i, j = rng.integers(0, len(grid), size=2)
        if i == j:
            continue
        s, t = grid[i], grid[j]
        fd_ds = (matern_scalar(s + h, t, phi1, phi2) - matern_scalar(s - h, t, phi1, phi2)) / (2 * h)
        np.testing.assert_allclose(dk_ds[i, j], fd_ds, rtol=1e-6)
        fd_dsdt = (
            matern_scalar(s + h2, t + h2, phi1, phi2)
            - matern_scalar(s + h2, t - h2, phi1, phi2)
            - matern_scalar(s - h2, t + h2, phi1, phi2)
            + matern_scalar(s - h2, t - h2, phi1, phi2)
        ) / (4 * h2 * h2)
        np.testing.assert_allclose(kpp[i, j], fd_dsdt, rtol=1e-5)


def test_diagonal_limits(grid):
    """Diagonals must equal the analytic u->0 limits (magi_v2.py:795,802,815)."""
    phi1, phi2 = 1.5, 0.6
    kappa, dk_ds, kpp = matern_derivative_matrices(jnp.asarray(grid), phi1, phi2, V)
    np.testing.assert_allclose(np.diag(np.asarray(kappa)), phi1)
    np.testing.assert_allclose(np.diag(np.asarray(dk_ds)), 0.0)
    np.testing.assert_allclose(
        np.diag(np.asarray(kpp)), V * phi1 / (phi2 ** 2 * (V - 1))
    )
    # continuity: near-diagonal entries approach the diagonal limit
    dense = np.linspace(0.0, 1e-4, 5)
    _, _, kpp_d = matern_derivative_matrices(jnp.asarray(dense), phi1, phi2, V)
    kpp_d = np.asarray(kpp_d)
    np.testing.assert_allclose(kpp_d[0, 1], kpp_d[0, 0], rtol=1e-4)


def test_dkappa_antisymmetric_kpp_symmetric(grid):
    _, dk_ds, kpp = matern_derivative_matrices(jnp.asarray(grid), 1.0, 1.0, V)
    np.testing.assert_allclose(np.asarray(dk_ds), -np.asarray(dk_ds).T, atol=1e-12)
    np.testing.assert_allclose(np.asarray(kpp), np.asarray(kpp).T, atol=1e-12)


def test_gram_grad_wrt_phi2_matches_fd(grid):
    """Autodiff through the Bessel ladder vs finite differences."""
    I = jnp.asarray(grid)

    def loss(phi2):
        return jnp.sum(matern_gram(I, 1.3, phi2, V) ** 2)

    g = jax.grad(loss)(jnp.asarray(0.9))
    h = 1e-6
    fd = (loss(jnp.asarray(0.9 + h)) - loss(jnp.asarray(0.9 - h))) / (2 * h)
    np.testing.assert_allclose(np.asarray(g), np.asarray(fd), rtol=1e-6)


def test_magi_matrices_psd_and_shapes(grid):
    I = jnp.asarray(grid)
    C, m, K = magi_kernel_matrices(I, 1.0, 0.7, V)
    n = len(grid)
    assert C.shape == (n, n) and m.shape == (n, n) and K.shape == (n, n)
    wC = np.linalg.eigvalsh(np.asarray(C))
    wK = np.linalg.eigvalsh(np.asarray(K) + np.asarray(K).T) / 2
    assert wC.min() > -1e-8 * wC.max()
    assert wK.min() > -1e-6 * abs(wK).max()


def test_sym_pinv_matches_numpy():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(20, 20))
    a = a @ a.T
    # make it rank-deficient
    w, v = np.linalg.eigh(a)
    w[:5] = 0.0
    a = (v * w) @ v.T
    np.testing.assert_allclose(
        np.asarray(sym_pinv(jnp.asarray(a))), np.linalg.pinv(a), rtol=1e-8, atol=1e-10
    )


def test_band_part_matches_tf_semantics():
    a = jnp.arange(25.0).reshape(5, 5)
    out = np.asarray(band_part(a, 1, 2))
    expect = np.asarray(a).copy()
    for i in range(5):
        for j in range(5):
            if (i - j) > 1 or (j - i) > 2:
                expect[i, j] = 0.0
    np.testing.assert_allclose(out, expect)
    np.testing.assert_allclose(np.asarray(band_part(a, -1, -1)), np.asarray(a))


def test_uniform_toeplitz_matches_general(grid):
    """Toeplitz fast path == general pairwise build on a uniform grid."""
    from magi_v2_tpu.ops.kernels import (
        magi_kernel_matrices,
        matern_derivative_matrices,
        matern_derivative_matrices_uniform,
        uniform_spacing,
    )

    h = uniform_spacing(grid)
    assert h is not None
    n = len(grid)
    I = jnp.asarray(grid)
    for phi1, phi2 in [(1.0, 0.5), (2.3, 1.1)]:
        ref = matern_derivative_matrices(I, phi1, phi2, V)
        fast = matern_derivative_matrices_uniform(n, h, phi1, phi2, V)
        for a, b in zip(fast, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-12, atol=1e-13)
    C1, m1, K1 = magi_kernel_matrices(I, 1.0, 0.7, V)
    C2, m2, K2 = magi_kernel_matrices(I, 1.0, 0.7, V, spacing=h)
    np.testing.assert_allclose(np.asarray(C2), np.asarray(C1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(K2), np.asarray(K1), rtol=1e-9, atol=1e-9)


def test_uniform_spacing_detection():
    from magi_v2_tpu.ops.kernels import uniform_spacing

    assert uniform_spacing(np.linspace(0, 1, 11)) is not None
    assert uniform_spacing(np.array([0.0, 0.1, 0.3])) is None
    assert uniform_spacing(np.array([0.0])) is None


def test_rowblocked_build_matches_direct(monkeypatch):
    """The row-blocked large-N non-uniform build (memory-cliff fix) must
    match the direct pairwise build, values and phi2 gradients, including
    the padded final tile."""
    import magi_v2_tpu.ops.kernels as K

    rng = np.random.default_rng(3)
    s = jnp.asarray(np.sort(rng.uniform(0.0, 4.0, 53)))  # 53 = 3*16 + 5 pad
    direct = K.matern_derivative_matrices(s, 1.3, 0.7, V)

    monkeypatch.setattr(K, "ROW_BLOCK_THRESHOLD", 16)
    monkeypatch.setattr(K, "ROW_BLOCK", 16)
    blocked = K.matern_derivative_matrices(s, 1.3, 0.7, V)
    for a, b in zip(blocked, direct):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-13)

    g_blocked = jax.grad(lambda p: jnp.sum(K.matern_gram(s, 1.3, p, V)))(0.7)
    monkeypatch.setattr(K, "ROW_BLOCK_THRESHOLD", 1024)
    g_direct = jax.grad(lambda p: jnp.sum(K.matern_gram(s, 1.3, p, V)))(0.7)
    np.testing.assert_allclose(float(g_blocked), float(g_direct), rtol=1e-12)
