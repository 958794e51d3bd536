"""High-level differentiable solve (linalg/solve.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sprs_tpu as st
from sprs_tpu.linalg import solve
from sprs_tpu.linalg.lu import splu

RNG = np.random.default_rng(21)


def random_spd(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, n))
    d[rng.random((n, n)) > 0.3] = 0.0
    d = (d + d.T) / 2
    d += np.eye(n) * (np.abs(d).sum(1).max() + 1)
    return d


def random_general(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, n))
    d[rng.random((n, n)) > 0.3] = 0.0
    d += np.eye(n) * (np.abs(d).sum(1).max() + 1)
    return d


class TestSolveTransposed:
    def test_lu_transposed(self):
        d = random_general(14, seed=1)
        lu = splu(st.from_dense(d))
        b = RNG.standard_normal(14)
        x = np.asarray(lu.solve_transposed(b))
        np.testing.assert_allclose(x, np.linalg.solve(d.T, b), rtol=1e-6)

    def test_lu_transposed_multi_rhs(self):
        d = random_general(9, seed=2)
        lu = splu(st.from_dense(d))
        B = RNG.standard_normal((9, 3))
        X = np.asarray(lu.solve_transposed(B))
        np.testing.assert_allclose(X, np.linalg.solve(d.T, B), rtol=1e-6)


class TestSolve:
    @pytest.mark.parametrize("method,maker", [
        ("ldl", random_spd),
        ("lu", random_general),
        ("auto", random_spd),
        ("auto", random_general),
    ])
    def test_correct(self, method, maker):
        d = maker(12, seed=3)
        b = RNG.standard_normal(12)
        x = np.asarray(solve(st.from_dense(d), b, method=method))
        np.testing.assert_allclose(x, np.linalg.solve(d, b), rtol=1e-6)

    def test_grad_b(self):
        d = random_general(8, seed=4)
        m = st.from_dense(d)
        b = RNG.standard_normal(8)
        g = jax.grad(lambda b: jnp.sum(solve(m, b, method="lu") ** 2))(
            jnp.asarray(b)
        )
        x = np.linalg.solve(d, b)
        # d/db sum(x^2) = 2 A^-T x
        expected = 2 * np.linalg.solve(d.T, x)
        np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-5)

    def test_grad_matrix_values(self):
        d = random_spd(6, seed=5)
        m = st.from_dense(d)
        b = RNG.standard_normal(6)

        def loss(data):
            m2 = m.with_data(data)
            return jnp.sum(solve(m2, b, method="ldl") ** 2)

        g = jax.grad(loss)(m.data)
        # Finite differences against the TRUE assembled matrix via
        # numpy (perturbing one stored entry makes A nonsymmetric, which
        # an LDL-based loss would silently symmetrize — np.linalg.solve
        # is the honest reference for d/dA of x = A^{-1} b).
        nnz = int(m.nnz)
        rows = np.repeat(np.arange(6), np.diff(np.asarray(m.indptr)))
        cols = np.asarray(m.indices)[:nnz]

        def loss_np(data):
            a = np.zeros((6, 6))
            a[rows, cols[: len(rows)]] = data[: len(rows)]
            x = np.linalg.solve(a, b)
            return float(np.sum(x**2))

        eps = 1e-6
        data0 = np.asarray(m.data)
        for k in [0, 3, 7]:
            dp = data0.copy(); dp[k] += eps
            dm = data0.copy(); dm[k] -= eps
            fd = (loss_np(dp) - loss_np(dm)) / (2 * eps)
            np.testing.assert_allclose(float(g[k]), fd, rtol=1e-3, atol=1e-7)

    def test_jit(self):
        d = random_spd(10, seed=6)
        m = st.from_dense(d)
        b = RNG.standard_normal(10)
        x = jax.jit(lambda b: solve(m, b, method="ldl"))(jnp.asarray(b))
        np.testing.assert_allclose(
            np.asarray(x), np.linalg.solve(d, b), rtol=1e-6
        )

    def test_multi_rhs(self):
        d = random_general(7, seed=7)
        B = RNG.standard_normal((7, 3))
        X = np.asarray(solve(st.from_dense(d), B, method="lu"))
        np.testing.assert_allclose(X, np.linalg.solve(d, B), rtol=1e-6)


def test_solve_fill_auto_and_override():
    import numpy as np

    from sprs_tpu.utils.special import dirichlet_laplacian
    from sprs_tpu.linalg import solve

    mat = dirichlet_laplacian((7, 9))
    d = np.asarray(mat.to_dense())
    b = np.linspace(1.0, 2.0, d.shape[0])
    x_auto = np.asarray(solve(mat, b, method="ldl"))
    for fill in ("camd", "rcm", "none"):
        x = np.asarray(solve(mat, b, method="ldl", fill=fill))
        np.testing.assert_allclose(x, x_auto, rtol=1e-4, atol=1e-5)
    assert np.abs(d @ x_auto - b).max() < 1e-4
