"""Solver tests: triangular solves, LDLᵀ, orderings, BiCGSTAB, heat parity.

Oracles are dense numpy (np.linalg.solve / cholesky), replicating the
reference's golden-value discipline (sprs-ldl/src/lib.rs:634-866) in a
self-verifying form.
"""

import jax
import numpy as np
import pytest

import sprs_tpu as st
from sprs_tpu.linalg import (
    Ldl,
    LdlSymbolic,
    bandwidth,
    bicgstab,
    build_schedule,
    diag_solve,
    etree_from_pattern,
    gauss_seidel,
    jacobi,
    lsolve,
    lsolve_csc_sparse_rhs,
    postorder,
    reverse_cuthill_mckee,
    tree_levels,
    usolve,
)
from sprs_tpu.ops import transform_mat_papt
from sprs_tpu.utils import grid_laplacian, tri_mesh_graph_laplacian
from sprs_tpu.utils.fixtures import dense_spd


@pytest.fixture(scope="module")
def tri_problem():
    rng = np.random.default_rng(1)
    n = 12
    low = np.tril(rng.random((n, n)) * (rng.random((n, n)) < 0.4)) + np.diag(
        rng.random(n) + 1.0
    )
    b = rng.random(n)
    return low, b


class TestTrisolve:
    @pytest.mark.parametrize("storage", ["csr", "csc"])
    @pytest.mark.parametrize("method", ["scan", "levels"])
    def test_lsolve(self, tri_problem, storage, method):
        low, b = tri_problem
        m = st.from_dense(low, storage=storage)
        x = lsolve(m, b, method=method)
        np.testing.assert_allclose(x, np.linalg.solve(low, b), rtol=1e-12)

    @pytest.mark.parametrize("storage", ["csr", "csc"])
    @pytest.mark.parametrize("method", ["scan", "levels"])
    def test_usolve(self, tri_problem, storage, method):
        low, b = tri_problem
        up = low.T
        m = st.from_dense(up, storage=storage)
        x = usolve(m, b, method=method)
        np.testing.assert_allclose(x, np.linalg.solve(up, b), rtol=1e-12)

    def test_ignores_wrong_triangle(self, tri_problem):
        low, b = tri_problem
        full = low + np.triu(np.ones_like(low), 1)
        x = lsolve(st.from_dense(full), b, method="scan")
        np.testing.assert_allclose(x, np.linalg.solve(low, b), rtol=1e-12)

    def test_multi_rhs(self, tri_problem):
        low, _ = tri_problem
        rhs = np.arange(36.0).reshape(12, 3)
        x = lsolve(st.from_dense(low), rhs)
        np.testing.assert_allclose(x, np.linalg.solve(low, rhs), rtol=1e-12)

    def test_singular_raises(self):
        sing = np.array([[1.0, 0.0], [1.0, 0.0]])
        with pytest.raises(st.SingularMatrixError):
            lsolve(st.from_dense(sing), np.ones(2))

    def test_reusable_schedule_jit(self, tri_problem):
        low, b = tri_problem
        m = st.from_dense(low)
        sched = build_schedule(m, lower=True)
        f = jax.jit(lambda mm, bb: lsolve(mm, bb, schedule=sched))
        np.testing.assert_allclose(f(m, b), np.linalg.solve(low, b), rtol=1e-12)
        np.testing.assert_allclose(
            f(m.scale(2.0), b), np.linalg.solve(2 * low, b), rtol=1e-12
        )

    def test_sparse_rhs(self, tri_problem):
        low, _ = tri_problem
        v = st.csvec(12, [2, 7], [1.0, 3.0])
        xs = lsolve_csc_sparse_rhs(st.from_dense(low, storage="csc"), v)
        np.testing.assert_allclose(
            xs.to_dense(), np.linalg.solve(low, v.to_dense()), rtol=1e-12
        )

    def test_diag_solve(self):
        d = st.diag_csmat(np.array([2.0, 4.0, 8.0]))
        np.testing.assert_allclose(
            diag_solve(d, np.array([2.0, 4.0, 8.0])), np.ones(3)
        )
        with pytest.raises(st.SingularMatrixError):
            diag_solve(st.diag_csmat(np.array([1.0, 0.0])), np.ones(2))


class TestEtree:
    def test_parents_ascending(self):
        m = st.from_dense(dense_spd(10))
        csr = m.to_csr()
        par = etree_from_pattern(
            np.asarray(csr.indptr), np.asarray(csr.indices), 10
        )
        assert all(p == -1 or p > k for k, p in enumerate(par))

    def test_postorder_is_permutation(self):
        m = st.from_dense(dense_spd(10))
        csr = m.to_csr()
        par = etree_from_pattern(
            np.asarray(csr.indptr), np.asarray(csr.indices), 10
        )
        po = postorder(par)
        assert sorted(po.tolist()) == list(range(10))
        lv = tree_levels(par)
        for k, p in enumerate(par):
            if p != -1:
                assert lv[p] >= lv[k] + 1


class TestOrdering:
    def test_recovers_tridiagonal_bandwidth(self):
        rng = np.random.default_rng(5)
        n = 30
        tri = (
            np.diag(np.full(n, 2.0))
            + np.diag(np.full(n - 1, -1.0), 1)
            + np.diag(np.full(n - 1, -1.0), -1)
        )
        prm = rng.permutation(n)
        scrambled = st.from_dense(tri[np.ix_(prm, prm)])
        res = reverse_cuthill_mckee(scrambled)
        bw = bandwidth(transform_mat_papt(scrambled, res.permutation()))
        assert bw <= 2

    def test_disconnected_components(self):
        # block-diagonal of two path graphs → two connected parts
        a = np.array(
            [
                [2.0, -1, 0, 0],
                [-1, 2, 0, 0],
                [0, 0, 2, -1],
                [0, 0, -1, 2],
            ]
        )
        res = reverse_cuthill_mckee(st.from_dense(a))
        assert len(res.connected_parts) == 3
        assert res.connected_parts[0] == 0
        assert res.connected_parts[-1] == 4

    @pytest.mark.parametrize("start", ["next", "min_degree", "pseudo_peripheral"])
    def test_strategies_yield_permutations(self, start):
        from sprs_tpu.linalg import cuthill_mckee_custom

        m = st.from_dense(dense_spd(12))
        res = cuthill_mckee_custom(m, start=start)
        assert sorted(res.perm.tolist()) == list(range(12))

    def test_fill_reduction_quality(self):
        # RCM must not increase LDL fill vs natural order on a banded
        # scrambled problem (reference quality assertion, lib.rs:890-932)
        rng = np.random.default_rng(5)
        n = 30
        tri = (
            np.diag(np.full(n, 4.0))
            + np.diag(np.full(n - 1, -1.0), 1)
            + np.diag(np.full(n - 1, -1.0), -1)
            + np.diag(np.full(n - 3, -1.0), 3)
            + np.diag(np.full(n - 3, -1.0), -3)
        )
        prm = rng.permutation(n)
        m = st.from_dense(tri[np.ix_(prm, prm)])
        nnz_none = Ldl().numeric(m).nnz
        nnz_rcm = Ldl().fill_in_reduction("rcm").numeric(m).nnz
        assert nnz_rcm <= nnz_none


class TestLdl:
    @pytest.fixture(scope="class")
    def spd(self):
        return dense_spd(10)

    @pytest.mark.parametrize("fill", ["none", "rcm"])
    @pytest.mark.parametrize("backend", ["host", "device"])
    def test_solve(self, spd, fill, backend):
        rng = np.random.default_rng(2)
        m = st.from_dense(spd)
        ldl = Ldl().fill_in_reduction(fill).numeric(m, backend=backend)
        b = rng.random(10)
        np.testing.assert_allclose(
            ldl.solve(b), np.linalg.solve(spd, b), rtol=1e-10, atol=1e-12
        )

    def test_factor_identity(self, spd):
        ldl = Ldl().fill_in_reduction("rcm").numeric(st.from_dense(spd))
        L = np.asarray(ldl.l().to_dense())
        D = np.asarray(ldl.d)
        p = np.asarray(ldl.symbolic.perm.perm)
        np.testing.assert_allclose(
            L @ np.diag(D) @ L.T, spd[np.ix_(p, p)], rtol=1e-12, atol=1e-12
        )
        assert np.all(np.diag(L) == 1.0)  # unit diagonal
        assert np.all(D > 0)  # SPD pivots

    def test_matches_dense_cholesky(self, spd):
        # golden-value analog: exact match against the dense factorization
        ldl = Ldl().numeric(st.from_dense(spd), backend="host")
        L = np.asarray(ldl.l().to_dense())
        D = np.asarray(ldl.d)
        chol = np.linalg.cholesky(spd)
        np.testing.assert_allclose(
            L * np.sqrt(D)[None, :], chol, rtol=1e-10, atol=1e-12
        )

    def test_device_update_jit(self, spd):
        m = st.from_dense(spd)
        sym = LdlSymbolic.from_matrix(m)
        f = jax.jit(lambda mm: sym.factor(mm, backend="device").l_data)
        ld_a = f(m)
        spd2 = spd + np.eye(10)
        ld_b = f(st.from_dense(spd2))  # same pattern → same trace
        host_b = sym.factor(st.from_dense(spd2), backend="host")
        np.testing.assert_allclose(ld_b, host_b.l_data, rtol=1e-10)
        assert not np.allclose(ld_a, ld_b)

    def test_lt_is_metadata_flip(self, spd):
        ldl = Ldl().numeric(st.from_dense(spd))
        L = np.asarray(ldl.l().to_dense())
        np.testing.assert_allclose(np.asarray(ldl.lt().to_dense()), L.T)
        np.testing.assert_allclose(np.asarray(ldl.l_csr().to_dense()), L)

    def test_multi_rhs(self, spd):
        rng = np.random.default_rng(3)
        B = rng.random((10, 4))
        ldl = Ldl().fill_in_reduction("rcm").numeric(st.from_dense(spd))
        np.testing.assert_allclose(
            ldl.solve(B), np.linalg.solve(spd, B), rtol=1e-10
        )

    def test_asymmetric_rejected(self):
        a = np.array([[1.0, 2.0], [0.0, 1.0]])
        with pytest.raises(st.LinalgError):
            Ldl().numeric(st.from_dense(a))

    def test_singular_detected(self):
        sing = np.array([[1.0, 1.0], [1.0, 1.0]])
        with pytest.raises(st.SingularMatrixError):
            Ldl().numeric(st.from_dense(sing), backend="host")

    def test_explicit_perm(self, spd):
        p = st.Permutation.from_array(
            np.random.default_rng(4).permutation(10).astype(np.int32)
        )
        sym = LdlSymbolic.from_matrix(st.from_dense(spd), perm=p)
        num = sym.factor(st.from_dense(spd))
        b = np.arange(10.0)
        np.testing.assert_allclose(
            num.solve(b), np.linalg.solve(spd, b), rtol=1e-10
        )


class TestBicgstab:
    def test_spd(self):
        spd = dense_spd(20, seed=9)
        rng = np.random.default_rng(0)
        b = rng.random(20)
        res = bicgstab(st.from_dense(spd), b, tol=1e-10, max_iter=200)
        assert res.converged
        np.testing.assert_allclose(res.x, np.linalg.solve(spd, b), rtol=1e-6)

    def test_nonsymmetric(self):
        rng = np.random.default_rng(1)
        a = np.eye(15) * 5 + rng.random((15, 15)) * 0.5
        b = rng.random(15)
        res = bicgstab(st.from_dense(a), b, tol=1e-10, max_iter=300)
        assert res.converged
        np.testing.assert_allclose(res.x, np.linalg.solve(a, b), rtol=1e-6)

    def test_jittable(self):
        spd = dense_spd(10)
        m = st.from_dense(spd)
        b = np.arange(10.0)
        f = jax.jit(lambda mm, bb: bicgstab(mm, bb, tol=1e-10, max_iter=100).x)
        np.testing.assert_allclose(f(m, b), np.linalg.solve(spd, b), rtol=1e-6)

    def test_matvec_callable(self):
        spd = dense_spd(10)
        b = np.ones(10)
        res = bicgstab(lambda v: jax.numpy.asarray(spd) @ v, b, tol=1e-10)
        assert res.converged


class TestHeatExampleParity:
    """End-to-end parity with the reference heat-diffusion example
    (heat.rs:141-175): 10×10 grid Laplacian, solve to 1e-8."""

    def setup_method(self):
        self.lap = grid_laplacian((10, 10))
        # rhs: interior heat source, zero Dirichlet borders (heat.rs fixture)
        rhs = np.zeros((10, 10))
        rhs[1:-1, 1:-1] = 1.0
        self.rhs = rhs.reshape(-1)

    def test_structure(self):
        assert self.lap.shape == (100, 100)
        d = np.asarray(self.lap.to_dense())
        assert np.all(np.diag(d)[[0, 9, 90, 99]] == 1.0)  # identity corners
        assert d[11, 11] == 4.0 and d[11, 12] == -1.0

    def test_gauss_seidel_reference(self):
        res = gauss_seidel(self.lap, self.rhs, tol=1e-8, max_iter=300)
        assert res.converged and res.iterations <= 300
        np.testing.assert_allclose(
            res.x,
            np.linalg.solve(np.asarray(self.lap.to_dense()), self.rhs),
            atol=1e-7,
        )

    def test_jacobi_device_matches(self):
        ref = np.linalg.solve(np.asarray(self.lap.to_dense()), self.rhs)
        res = jacobi(self.lap, self.rhs, tol=1e-9, max_iter=5000)
        assert res.converged
        np.testing.assert_allclose(res.x, ref, atol=1e-7)

    def test_bicgstab_fast(self):
        ref = np.linalg.solve(np.asarray(self.lap.to_dense()), self.rhs)
        res = bicgstab(self.lap, self.rhs, tol=1e-12, max_iter=300)
        assert res.converged
        np.testing.assert_allclose(res.x, ref, atol=1e-7)


class TestMeshLaplacian:
    def test_two_triangles(self):
        # vertices 0-3, triangles (0,1,2) and (1,2,3): edge (1,2) shared
        lap = tri_mesh_graph_laplacian(4, [[0, 1, 2], [1, 2, 3]])
        d = np.asarray(lap.to_dense())
        expect = np.array(
            [
                [2, -1, -1, 0],
                [-1, 3, -1, -1],
                [-1, -1, 3, -1],
                [0, -1, -1, 2],
            ],
            dtype=float,
        )
        np.testing.assert_allclose(d, expect)
        assert st.is_symmetric(lap)


class TestSupernodes:
    """Fundamental supernode detection (docs/SUPERNODAL_PLAN.md step 1)."""

    def _tridiag_symbolic(self, n):
        # tridiagonal: etree is a path, colcount = 2 except last col
        parent = np.array(
            [j + 1 for j in range(n - 1)] + [-1], dtype=np.int64
        )
        colcount = np.array(
            [2] * (n - 1) + [1], dtype=np.int64
        )
        return parent, colcount

    def test_tridiagonal_path_is_column_pairs(self):
        from sprs_tpu.linalg import fundamental_supernodes

        parent, colcount = self._tridiag_symbolic(6)
        sn = fundamental_supernodes(parent, colcount)
        # chain criterion: colcount drops by 1 only at the last column,
        # so supernodes are singletons except the final pair
        assert sn.ptr[-1] == 6
        assert np.all(np.diff(sn.ptr) >= 1)
        # of[] is consistent with ptr
        for s in range(sn.n_snodes):
            assert np.all(
                sn.of[sn.ptr[s] : sn.ptr[s + 1]] == s
            )

    def test_dense_lower_is_one_supernode(self):
        from sprs_tpu.linalg import fundamental_supernodes

        # fully dense L: parent path, colcount n-j
        n = 5
        parent = np.array([1, 2, 3, 4, -1], dtype=np.int64)
        colcount = np.array([5, 4, 3, 2, 1], dtype=np.int64)
        sn = fundamental_supernodes(parent, colcount)
        assert sn.n_snodes == 1
        assert list(sn.ptr) == [0, 5]

    def test_branching_breaks_supernodes(self):
        from sprs_tpu.linalg import fundamental_supernodes

        # two children (0, 1) of column 2: 2 must start a supernode
        parent = np.array([2, 2, 3, -1], dtype=np.int64)
        colcount = np.array([2, 2, 2, 1], dtype=np.int64)
        sn = fundamental_supernodes(parent, colcount)
        assert 2 in list(sn.ptr)

    def test_amalgamation_merges_within_budget(self):
        from sprs_tpu.linalg import (
            amalgamate,
            fundamental_supernodes,
        )

        parent, colcount = self._tridiag_symbolic(8)
        sn = fundamental_supernodes(parent, colcount)
        merged = amalgamate(
            sn, parent, colcount, max_zeros=100, max_width=8
        )
        assert merged.n_snodes < sn.n_snodes
        assert merged.ptr[-1] == 8
        # zero budget forbids any merge that introduces fill
        frozen = amalgamate(
            sn, parent, colcount, max_zeros=0, max_width=8
        )
        assert frozen.n_snodes >= merged.n_snodes

    def test_real_matrix_via_ldl_symbolic(self):
        from sprs_tpu.linalg import (
            LdlSymbolic,
            fundamental_supernodes,
        )
        from sprs_tpu.utils.special import dirichlet_laplacian

        lap = dirichlet_laplacian((6, 6), dtype=np.float64)
        sym = LdlSymbolic.from_matrix(lap, check_symmetry=False)
        colcount = np.diff(np.asarray(sym.l_indptr)).astype(np.int64)
        sn = fundamental_supernodes(
            np.asarray(sym.parent, dtype=np.int64), colcount
        )
        n = lap.shape[0]
        assert sn.ptr[0] == 0 and sn.ptr[-1] == n
        assert np.all(np.diff(sn.ptr) >= 1)
        # partition property: every column in exactly one supernode
        assert sn.of.shape == (n,)
        assert sn.of[-1] == sn.n_snodes - 1

    def test_supernode_structure_shared_pattern(self):
        from sprs_tpu.linalg import (
            LdlSymbolic,
            fundamental_supernodes,
        )
        from sprs_tpu.linalg.supernodes import supernode_structure
        from sprs_tpu.utils.special import dirichlet_laplacian

        lap = dirichlet_laplacian((5, 5), dtype=np.float64)
        sym = LdlSymbolic.from_matrix(lap, check_symmetry=False)
        colcount = np.diff(np.asarray(sym.l_indptr)).astype(np.int64)
        sn = fundamental_supernodes(
            np.asarray(sym.parent, dtype=np.int64), colcount
        )
        rows, nrows = supernode_structure(
            sym.l_indptr, sym.l_indices, sn
        )
        assert rows.shape[0] == sn.n_snodes
        assert np.all(nrows >= 0)
        # row ids are valid and below-block
        for s in range(sn.n_snodes):
            r = rows[s, : nrows[s]]
            assert np.all(r >= sn.ptr[s + 1])
            assert np.all(r < lap.shape[0])


class TestTrisolveWindow:
    """Static window bound for the scan method under jit."""

    def test_window_solves_and_poisons(self):
        rng = np.random.default_rng(5)
        n = 12
        d = np.tril(rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.3))
        np.fill_diagonal(d, 2.0)
        m = st.from_dense(d)
        w = int(np.diff(np.asarray(m.indptr)).max())
        f = jax.jit(
            lambda mat, b: st.linalg.lsolve(
                mat, b, method="scan", window=w
            )
        )
        b = rng.standard_normal(n)
        x = np.asarray(f(m, b))
        np.testing.assert_allclose(x, np.linalg.solve(d, b), rtol=1e-5)
        # a too-small window NaN-poisons instead of silently truncating
        g = jax.jit(
            lambda mat, b: st.linalg.lsolve(
                mat, b, method="scan", window=max(w - 1, 1)
            )
        )
        assert np.isnan(np.asarray(g(m, b))).any()


class TestBicgstabSparse:
    """Sparse-unknown BiCGSTAB (reference bicgstab.rs:95-112 iterates
    CsVec x/r/p): static-capacity iterates, loud overflow."""

    def test_matches_dense_solution(self):
        from sprs_tpu.formats.csvec import csvec_from_dense
        from sprs_tpu.linalg import bicgstab_sparse

        rng = np.random.default_rng(0)
        n = 60
        d = rng.normal(size=(n, n)) * (rng.random((n, n)) < 0.1)
        d = d + np.eye(n) * (np.abs(d).sum(1).max() + 1)
        a = st.from_dense(d)
        bd = np.zeros(n)
        bd[[3, 17, 40]] = [1.0, -2.0, 0.5]
        res = bicgstab_sparse(a, csvec_from_dense(bd), tol=1e-8)
        assert res.converged
        x = np.asarray(res.x.to_dense())
        np.testing.assert_allclose(x, np.linalg.solve(d, bd), atol=1e-6)

    def test_sparse_support_stays_within_cap(self):
        # block-diagonal: support never leaves the seeded block, so a
        # cap far below n suffices — the sparse-iterate payoff case
        from sprs_tpu.formats.csvec import csvec_from_dense
        from sprs_tpu.linalg import bicgstab_sparse

        rng = np.random.default_rng(1)
        blk = rng.normal(size=(8, 8))
        blk = blk @ blk.T + 8 * np.eye(8)
        d = np.zeros((64, 64))
        for i in range(8):
            d[i * 8 : (i + 1) * 8, i * 8 : (i + 1) * 8] = blk
        a = st.from_dense(d)
        bd = np.zeros(64)
        bd[16:24] = 1.0
        res = bicgstab_sparse(a, csvec_from_dense(bd), cap=16, tol=1e-10)
        assert res.converged
        x = np.asarray(res.x.to_dense())
        np.testing.assert_allclose(x, np.linalg.solve(d, bd), atol=1e-7)
        assert int(res.x.nnz) <= 16

    def test_overflow_raises(self):
        from sprs_tpu.errors import CapacityError
        from sprs_tpu.formats.csvec import csvec_from_dense
        from sprs_tpu.linalg import bicgstab_sparse

        rng = np.random.default_rng(2)
        d = rng.normal(size=(30, 30)) * (rng.random((30, 30)) < 0.3)
        d = d + 40 * np.eye(30)
        bd = np.zeros(30)
        bd[0] = 1.0
        with pytest.raises(CapacityError):
            bicgstab_sparse(
                st.from_dense(d), csvec_from_dense(bd), cap=2, tol=1e-10
            )
