"""Native C++ host library vs pure-Python fallbacks.

Every native entry point must agree with the numpy path — the analog of
the reference trusting SuiteSparse only because sprs-ldl reproduces it
(sprs-ldl/src/lib.rs golden tests).
"""

import numpy as np
import pytest

import sprs_tpu as st
from sprs_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def spd_pattern(n=30, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, n))
    d[rng.random((n, n)) > 0.2] = 0.0
    d = (d + d.T) / 2
    d += np.eye(n) * (np.abs(d).sum(1).max() + 1)
    m = st.from_dense(d)
    nnz = int(m.nnz)
    return (
        np.asarray(m.indptr),
        np.asarray(m.indices)[:nnz],
        np.asarray(m.data)[:nnz],
        n,
        d,
    )


class TestNativeParity:
    def test_etree(self):
        indptr, indices, _, n, _ = spd_pattern()
        from sprs_tpu.linalg.etree import etree_from_pattern

        native_parent = native.etree(indptr, indices, n)
        py_parent = etree_from_pattern(indptr, indices, n)
        np.testing.assert_array_equal(native_parent, py_parent)

    def test_rcm(self):
        indptr, indices, _, n, _ = spd_pattern(seed=1)
        perm, parts = native.rcm(indptr, indices, n)
        assert sorted(perm.tolist()) == list(range(n))
        assert parts[0] == 0 and parts[-1] == n

    def test_tri_levels_lower(self):
        # lower-triangular part of the SPD pattern
        indptr, indices, data, n, d = spd_pattern(seed=2)
        low = np.tril(d)
        m = st.from_dense(low)
        nnz = int(m.nnz)
        ip = np.asarray(m.indptr)
        ix = np.asarray(m.indices)[:nnz]
        level, n_levels = native.tri_levels(ip, ix, n, lower=True)
        # validate: each row's deps are in strictly earlier levels
        for i in range(n):
            for p in range(ip[i], ip[i + 1]):
                j = ix[p]
                if j < i:
                    assert level[j] < level[i]
        assert n_levels == int(level.max()) + 1

    def test_gauss_seidel_converges(self):
        indptr, indices, data, n, d = spd_pattern(seed=3)
        b = np.linspace(1, 2, n)
        x0 = np.zeros(n)
        x, it, res = native.gauss_seidel(
            indptr, indices, data.astype(np.float64), b, x0, 1e-10, 500
        )
        np.testing.assert_allclose(x, np.linalg.solve(d, b), rtol=1e-7)
        assert res <= 1e-10

    def test_min_degree_is_permutation(self):
        indptr, indices, _, n, _ = spd_pattern(seed=4)
        perm = native.min_degree(indptr, indices, n)
        assert sorted(perm.tolist()) == list(range(n))

    def test_lu_matches_python(self):
        rng = np.random.default_rng(5)
        n = 25
        d = rng.standard_normal((n, n))
        d[rng.random((n, n)) > 0.2] = 0.0
        d += np.eye(n) * (np.abs(d).sum(1).max() + 1)
        m = st.from_dense(d).to_csc()
        nnz = int(m.nnz)
        qptr = np.asarray(m.indptr).astype(np.int64)
        qidx = np.asarray(m.indices)[:nnz].astype(np.int64)
        qdat = np.asarray(m.data)[:nnz].astype(np.float64)
        out = native.lu(qptr, qidx, qdat, n, 0.1)
        assert out is not None
        li, lx, ld, ui, ux, ud, perm_r = out
        from sprs_tpu.linalg.lu import _cols_to_csc, _lu_gilbert_peierls

        plr, plv, pur, puv, pperm = _lu_gilbert_peierls(
            qptr, qidx, qdat, n, 0.1
        )
        pli, plx, pld = _cols_to_csc(plr, plv, n, np.float64, True)
        pui, pux, pud = _cols_to_csc(pur, puv, n, np.float64, False)
        np.testing.assert_array_equal(perm_r, pperm)
        np.testing.assert_array_equal(li, pli)
        np.testing.assert_array_equal(lx, plx)
        np.testing.assert_allclose(ld, pld, rtol=1e-14)
        np.testing.assert_array_equal(ui, pui)
        np.testing.assert_array_equal(ux, pux)
        np.testing.assert_allclose(ud, pud, rtol=1e-14)

    def test_ldl_symbolic(self):
        indptr, indices, _, n, _ = spd_pattern(seed=6)
        out = native.ldl_symbolic(indptr, indices, n)
        assert out is not None
        parent, col_count, row_count, total = out
        assert total == int(col_count.sum())
        # parents point forward (etree property)
        for k in range(n):
            assert parent[k] == -1 or parent[k] > k


@pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)
class TestIncompleteFactorizations:
    """C++ ilu0/ic0 vs the pure-numpy fallbacks: bit-identical."""

    def _random_csr(self, n, density, seed, symmetric=False):
        rng = np.random.default_rng(seed)
        d = rng.standard_normal((n, n))
        d[rng.random((n, n)) > density] = 0.0
        if symmetric:
            d = (d + d.T) / 2
        d[np.arange(n), np.arange(n)] = np.abs(d).sum(1) + 1.0
        return d

    def test_ilu0_bit_identical(self):
        from sprs_tpu.linalg.ilu import _ilu0_host

        d = self._random_csr(60, 0.15, seed=11)
        a = st.from_dense(d).to_csr().compact()
        indptr = np.asarray(a.indptr)
        nnz = int(indptr[-1])
        indices = np.asarray(a.indices)[:nnz]
        data = np.asarray(a.data)[:nnz]
        ref, _ = _ilu0_host(indptr, indices, data)
        fast = native.ilu0_numeric(indptr, indices, data)
        np.testing.assert_array_equal(ref, fast)

    def test_ic0_bit_identical(self):
        from sprs_tpu.linalg.ilu import _ic0_host

        d = self._random_csr(60, 0.15, seed=12, symmetric=True)
        a = st.from_dense(d).to_csr().compact()
        indptr = np.asarray(a.indptr)
        nnz = int(indptr[-1])
        indices = np.asarray(a.indices)[:nnz]
        data = np.asarray(a.data)[:nnz]
        rows = np.repeat(np.arange(60), np.diff(indptr))
        keep = indices <= rows
        l_rows = rows[keep]
        l_indptr = np.zeros(61, np.int64)
        np.add.at(l_indptr, l_rows + 1, 1)
        l_indptr = np.cumsum(l_indptr)
        ref = _ic0_host(l_indptr, indices[keep], data[keep])
        fast = native.ic0_numeric(l_indptr, indices[keep], data[keep])
        np.testing.assert_array_equal(ref, fast)

    def test_ilu0_pivot_failure_reported(self):
        # row 1 diagonal structurally missing
        d = np.array([[2.0, 1.0], [1.0, 0.0]])
        a = st.from_dense(d).to_csr().compact()
        indptr = np.asarray(a.indptr)
        nnz = int(indptr[-1])
        with pytest.raises(ValueError, match="row 1"):
            native.ilu0_numeric(
                indptr,
                np.asarray(a.indices)[:nnz],
                np.asarray(a.data)[:nnz],
            )


class TestAmdOrdering:
    """AMD (quotient-graph approximate minimum degree) — the CAMD role.

    Mirrors the reference's ordering-quality test
    (sprs-ldl/src/lib.rs:890-932): the fill-reducing ordering must
    produce no more LDL fill than RCM, which must beat natural order.
    """

    def _fill(self, mat, perm):
        from sprs_tpu.linalg.ldl import LdlSymbolic

        return LdlSymbolic.from_matrix(
            mat, perm=perm, check_symmetry=False
        ).nnz

    def test_is_permutation_on_random_symmetric(self):
        from sprs_tpu.linalg.amd import camd_order

        rng = np.random.default_rng(11)
        for n in (1, 2, 17, 120):
            d = (rng.random((n, n)) < 0.08).astype(np.float64)
            d = np.maximum(d, d.T)
            np.fill_diagonal(d, 1.0)
            p = np.asarray(camd_order(st.from_dense(d)).perm)
            assert np.array_equal(np.sort(p), np.arange(n))

    def test_amd_fill_beats_rcm_on_laplacian(self):
        from sprs_tpu.linalg import reverse_cuthill_mckee
        from sprs_tpu.linalg.amd import camd_order
        from sprs_tpu.utils.special import dirichlet_laplacian

        lap = dirichlet_laplacian((24, 24), dtype=np.float64)
        f_amd = self._fill(lap, camd_order(lap))
        f_rcm = self._fill(
            lap, reverse_cuthill_mckee(lap).permutation()
        )
        f_nat = self._fill(lap, None)
        assert f_amd <= f_rcm <= f_nat
        # AMD should be a real improvement, not a tie
        assert f_amd < 0.8 * f_rcm

    def test_ldl_camd_front_door_solves(self):
        from sprs_tpu.linalg import Ldl
        from sprs_tpu.utils.special import dirichlet_laplacian

        lap = dirichlet_laplacian((9, 9), dtype=np.float64)
        n = lap.shape[0]
        num = Ldl().fill_in_reduction("camd").numeric(lap)
        x = np.asarray(num.solve(np.ones(n)))
        np.testing.assert_allclose(
            np.asarray(lap.to_dense()) @ x, np.ones(n), atol=1e-10
        )

    def test_amd_handles_unsymmetric_input_by_symmetrizing(self):
        from sprs_tpu.linalg.amd import camd_order

        d = np.array(
            [
                [1.0, 2.0, 0.0, 0.0],
                [0.0, 1.0, 3.0, 0.0],
                [0.0, 0.0, 1.0, 4.0],
                [5.0, 0.0, 0.0, 1.0],
            ]
        )
        p = np.asarray(camd_order(st.from_dense(d)).perm)
        assert np.array_equal(np.sort(p), np.arange(4))

    def test_amd_disconnected_components(self):
        from sprs_tpu.linalg.amd import camd_order

        d = np.zeros((7, 7))
        d[:3, :3] = 1.0
        d[4, 5] = d[5, 4] = 1.0
        np.fill_diagonal(d, 2.0)
        p = np.asarray(camd_order(st.from_dense(d)).perm)
        assert np.array_equal(np.sort(p), np.arange(7))


class TestNativeSpgemm:
    """Gustavson C++ SpGEMM (the Eigen-class bench baseline) vs scipy."""

    def test_matches_scipy(self):
        import scipy.sparse as sp

        from sprs_tpu import native

        if not native.available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(42)
        for shape_a, shape_b, dens in [
            ((50, 40), (40, 30), 0.1),
            ((200, 150), (150, 180), 0.02),
            ((64, 64), (64, 64), 0.0),  # empty operands
        ]:
            A = sp.random(*shape_a, density=dens, random_state=rng, format="csr")
            B = sp.random(*shape_b, density=dens, random_state=rng, format="csr")
            cp, ci, cv = native.spgemm_host(
                A.indptr, A.indices, A.data,
                B.indptr, B.indices, B.data, shape_b[1],
            )
            C = sp.csr_matrix(
                (cv, ci[: cp[-1]], cp), shape=(shape_a[0], shape_b[1])
            )
            np.testing.assert_allclose(
                C.toarray(), (A @ B).toarray(), rtol=1e-12, atol=0
            )
            # sorted-column CSR invariant
            for i in range(shape_a[0]):
                row = ci[cp[i] : cp[i + 1]]
                assert np.all(np.diff(row) > 0) or row.size <= 1


class TestNdOrderNative:
    """C++ nested dissection must be bit-identical to the numpy path
    (linalg/nd.py) — same BFS level-set order, separator choice, and
    emit order."""

    def _numpy_order(self, mat, monkeypatch):
        import os

        from sprs_tpu import native
        from sprs_tpu.linalg.nd import nd_order

        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setenv("SPRS_TPU_NO_NATIVE", "1")
        try:
            return nd_order(mat)
        finally:
            monkeypatch.delenv("SPRS_TPU_NO_NATIVE")

    def test_grid_parity(self, monkeypatch):
        from sprs_tpu import native
        from sprs_tpu.linalg.nd import nd_order
        from sprs_tpu.utils.special import dirichlet_laplacian

        if not native.available():
            pytest.skip("native library unavailable")
        for shape in [(9, 9), (24, 24), (13, 57)]:
            mat = dirichlet_laplacian(shape)
            fast = np.asarray(nd_order(mat).perm)
            slow = np.asarray(self._numpy_order(mat, monkeypatch).perm)
            np.testing.assert_array_equal(fast, slow)

    def test_random_pattern_parity(self, monkeypatch):
        import scipy.sparse as sp

        import sprs_tpu as st
        from sprs_tpu import native
        from sprs_tpu.linalg.nd import nd_order

        if not native.available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(7)
        A = sp.random(800, 800, density=0.004, random_state=rng)
        A = ((A + A.T) != 0).astype(np.float64) + sp.eye(800)
        mat = st.from_scipy(A.tocsr())
        fast = np.asarray(nd_order(mat).perm)
        slow = np.asarray(self._numpy_order(mat, monkeypatch).perm)
        np.testing.assert_array_equal(fast, slow)
        assert sorted(fast.tolist()) == list(range(800))
