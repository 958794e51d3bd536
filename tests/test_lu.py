"""Sparse LU factorization (UMFPACK-class surface, linalg/lu.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sprs_tpu as st
from sprs_tpu.linalg import splu
from sprs_tpu.errors import NonSquareMatrixError, SingularMatrixError

RNG = np.random.default_rng(7)


def random_invertible(n, density=0.3, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, n))
    d[rng.random((n, n)) > density] = 0.0
    d += np.diag(np.sign(np.diag(d)) + (np.diag(d) == 0)) * n  # diag-dominant
    return d


class TestSpLu:
    def test_reconstruction(self):
        d = random_invertible(12, seed=1)
        lu = splu(st.from_dense(d))
        L = np.asarray(lu.l().to_dense())
        U = np.asarray(lu.u().to_dense())
        P = np.asarray(lu.row_perm.perm)
        Q = np.asarray(lu.col_perm.perm)
        R = np.asarray(lu.scale)
        # P R A Q == L U
        praq = (R[:, None] * d)[P][:, Q]
        np.testing.assert_allclose(L @ U, praq, rtol=1e-6, atol=1e-9)
        # L unit lower, U upper
        assert np.allclose(np.triu(L, 1), 0)
        assert np.allclose(np.diag(L), 1)
        assert np.allclose(np.tril(U, -1), 0)

    def test_solve(self):
        d = random_invertible(15, seed=2)
        lu = splu(st.from_dense(d))
        b = RNG.standard_normal(15)
        x = np.asarray(lu.solve(b))
        np.testing.assert_allclose(x, np.linalg.solve(d, b), rtol=1e-5)

    def test_solve_multi_rhs(self):
        d = random_invertible(10, seed=3)
        lu = splu(st.from_dense(d))
        B = RNG.standard_normal((10, 4))
        X = np.asarray(lu.solve(B))
        np.testing.assert_allclose(X, np.linalg.solve(d, B), rtol=1e-5)

    def test_solve_jit(self):
        d = random_invertible(8, seed=4)
        lu = splu(st.from_dense(d))
        b = RNG.standard_normal(8)
        x = jax.jit(lu.solve)(b)
        np.testing.assert_allclose(
            np.asarray(x), np.linalg.solve(d, b), rtol=1e-5
        )

    def test_needs_pivoting(self):
        # zero diagonal forces row exchange
        d = np.array([[0.0, 2.0], [3.0, 1.0]])
        lu = splu(st.from_dense(d))
        b = np.array([2.0, 4.0])
        np.testing.assert_allclose(
            np.asarray(lu.solve(b)), np.linalg.solve(d, b), rtol=1e-6
        )

    def test_min_degree_col_perm(self):
        d = random_invertible(20, density=0.2, seed=5)
        lu = splu(st.from_dense(d), col_perm="min_degree")
        b = RNG.standard_normal(20)
        np.testing.assert_allclose(
            np.asarray(lu.solve(b)), np.linalg.solve(d, b), rtol=1e-4
        )

    def test_no_scaling(self):
        d = random_invertible(9, seed=6)
        lu = splu(st.from_dense(d), scale=False)
        assert np.allclose(np.asarray(lu.scale), 1.0)
        b = RNG.standard_normal(9)
        np.testing.assert_allclose(
            np.asarray(lu.solve(b)), np.linalg.solve(d, b), rtol=1e-5
        )

    def test_det(self):
        d = random_invertible(7, seed=8)
        lu = splu(st.from_dense(d))
        np.testing.assert_allclose(
            float(lu.det()), np.linalg.det(d), rtol=1e-5
        )

    def test_strict_partial_pivoting(self):
        d = random_invertible(11, seed=9)
        lu = splu(st.from_dense(d), pivot_threshold=1.0)
        b = RNG.standard_normal(11)
        np.testing.assert_allclose(
            np.asarray(lu.solve(b)), np.linalg.solve(d, b), rtol=1e-5
        )

    def test_singular_raises(self):
        d = np.array([[1.0, 2.0], [2.0, 4.0]])  # rank 1
        with pytest.raises(SingularMatrixError):
            splu(st.from_dense(d))

    def test_structurally_singular(self):
        d = np.array([[1.0, 0.0], [5.0, 0.0]])  # empty column
        with pytest.raises(SingularMatrixError):
            splu(st.from_dense(d))

    def test_non_square(self):
        with pytest.raises(NonSquareMatrixError):
            splu(st.from_dense(np.ones((3, 4))))

    def test_lu_nnz(self):
        d = random_invertible(10, seed=10)
        lu = splu(st.from_dense(d))
        lnnz, unnz = lu.lu_nnz()
        assert lnnz >= 10 and unnz >= 10  # at least the diagonals

    def test_laplacian_solve(self):
        lap = st.utils.grid_laplacian((6, 6), dtype=np.float64)
        d = np.asarray(lap.to_dense())
        lu = splu(lap)
        b = RNG.standard_normal(36)
        np.testing.assert_allclose(
            np.asarray(lu.solve(b)), np.linalg.solve(d, b), rtol=1e-6
        )

    def test_vs_scipy(self):
        try:
            from scipy.sparse.linalg import splu as scipy_splu
        except Exception:
            pytest.skip("scipy.sparse.linalg unavailable")
        d = random_invertible(25, density=0.15, seed=11)
        m = st.from_dense(d)
        lu = splu(m)
        b = RNG.standard_normal(25)
        x_scipy = scipy_splu(m.to_scipy().tocsc()).solve(b)
        np.testing.assert_allclose(
            np.asarray(lu.solve(b)), x_scipy, rtol=1e-5
        )
