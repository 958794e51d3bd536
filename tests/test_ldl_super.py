"""Supernodal LDLᵀ numeric: parity against the exact host numeric.

Mirrors the golden-parity discipline of tests/test_ldl_golden.py
(reference: /root/reference/sprs-ldl/src/lib.rs:634-845): the supernodal
factorization reorders floating-point sums, so we assert relative
closeness in f64 rather than bit identity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sprs_tpu as st
from sprs_tpu.linalg import Ldl
from sprs_tpu.linalg.ldl import LdlSymbolic
from sprs_tpu.linalg.ldl_super import build_super_plan, numeric_supernodal
from sprs_tpu.utils.special import dirichlet_laplacian


def _rand_spd(n, density, seed, jitter=0.0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, n)) * (rng.random((n, n)) < density)
    spd = a @ a.T + n * np.eye(n)
    if jitter:
        spd += jitter * np.diag(rng.random(n))
    return spd


def _factor_pair(mat, fill="none"):
    """(host exact, supernodal) factor pair on the same symbolic plan."""
    builder = Ldl().fill_in_reduction(fill).check_symmetry(False)
    sym = builder.symbolic(mat)
    host = sym.factor(mat, backend="host")
    sup = sym.factor(mat, backend="supernodal")
    return host, sup


def _assert_factor_close(host, sup, rtol=1e-10):
    l_h = np.asarray(host.l_data)
    l_s = np.asarray(sup.l_data)
    scale = max(np.abs(l_h).max(), 1.0)
    np.testing.assert_allclose(l_s, l_h, rtol=rtol, atol=rtol * scale)
    np.testing.assert_allclose(
        np.asarray(sup.d), np.asarray(host.d), rtol=rtol
    )


class TestSupernodalParity:
    @pytest.mark.parametrize("fill", ["none", "rcm"])
    @pytest.mark.parametrize("grid", [(7, 9), (12, 12)])
    def test_laplacian(self, grid, fill):
        mat = dirichlet_laplacian(grid)
        host, sup = _factor_pair(mat, fill)
        _assert_factor_close(host, sup)

    def test_dense_spd(self):
        # one big supernode, no below rows on the root
        spd = _rand_spd(24, 1.0, 0)
        host, sup = _factor_pair(st.from_dense(spd))
        _assert_factor_close(host, sup)

    @pytest.mark.parametrize("seed", [1, 2])
    def test_random_sparse_spd(self, seed):
        spd = _rand_spd(60, 0.08, seed, jitter=0.5)
        host, sup = _factor_pair(st.from_dense(spd))
        _assert_factor_close(host, sup)

    def test_tridiagonal(self):
        n = 37
        d = np.zeros((n, n))
        np.fill_diagonal(d, 2.0 + np.arange(n) * 0.1)
        idx = np.arange(n - 1)
        d[idx, idx + 1] = -1.0
        d[idx + 1, idx] = -1.0
        host, sup = _factor_pair(st.from_dense(d))
        _assert_factor_close(host, sup)

    def test_arrowhead(self):
        # dense last row/column: branching etree, wide root supernode
        n = 30
        d = np.eye(n) * 4.0
        d[-1, :] = 1.0
        d[:, -1] = 1.0
        d[-1, -1] = n
        host, sup = _factor_pair(st.from_dense(d))
        _assert_factor_close(host, sup)

    def test_diagonal_matrix(self):
        # no below rows anywhere: pure factor tasks
        d = np.diag(np.arange(1.0, 9.0))
        host, sup = _factor_pair(st.from_dense(d))
        _assert_factor_close(host, sup)

    def test_golden_fixture(self):
        # the reference 10x10 golden fixture (sprs-ldl/src/lib.rs:634-745)
        from tests.test_ldl_golden import fixture_mat

        mat = fixture_mat()
        host, sup = _factor_pair(mat)
        _assert_factor_close(host, sup, rtol=1e-12)

    def test_solve_roundtrip(self):
        mat = dirichlet_laplacian((9, 9))
        sym = Ldl().fill_in_reduction("rcm").symbolic(mat)
        num = sym.factor(mat, backend="supernodal")
        b = np.linspace(-1.0, 2.0, 81)
        x = np.asarray(num.solve(b))
        ad = np.asarray(mat.to_dense())
        np.testing.assert_allclose(ad @ x, b, atol=1e-9)

    def test_jit_refactorization(self):
        # same pattern, two value sets, jitted once (the update() path)
        spd1 = _rand_spd(40, 0.15, 7, jitter=0.3)
        mask = spd1 != 0
        rng = np.random.default_rng(8)
        a2 = rng.normal(size=(40, 40)) * mask
        spd2 = (a2 + a2.T) / 2 + 80 * np.eye(40)
        spd2 *= mask  # identical pattern
        m1 = st.from_dense(spd1)
        sym = Ldl().check_symmetry(False).symbolic(m1)
        plan = sym.super_plan()

        f = jax.jit(lambda data: numeric_supernodal(plan, data))
        for spd in (spd1, spd2):
            m = st.from_dense(spd).to_csr()
            lx, d = f(m.data)
            host = sym.factor(st.from_dense(spd), backend="host")
            np.testing.assert_allclose(
                np.asarray(lx), np.asarray(host.l_data), atol=1e-10
            )
            np.testing.assert_allclose(
                np.asarray(d), np.asarray(host.d), rtol=1e-10
            )


class TestSuperPlan:
    def test_plan_geometry(self):
        mat = dirichlet_laplacian((10, 10))
        sym = Ldl().fill_in_reduction("rcm").symbolic(mat)
        plan = build_super_plan(sym)
        # supernodes tile the columns
        assert int(plan.c0[0]) == 0
        widths = np.asarray(plan.w)
        assert (widths >= 1).all()
        assert int((plan.c0 + widths)[-1]) == plan.n
        np.testing.assert_array_equal(plan.c0[1:], (plan.c0 + widths)[:-1])
        # every column slot extracted exactly once
        assert plan.csc_gather.shape[0] == sym.nnz
        assert len(np.unique(plan.csc_gather)) == sym.nnz
        # one factor task per supernode, in ascending order
        fact = plan.t_src[plan.t_type == 1]
        np.testing.assert_array_equal(fact, np.arange(plan.S))

    def test_amalgamation_widens_banded(self):
        mat = dirichlet_laplacian((16, 16))
        sym = Ldl().fill_in_reduction("rcm").symbolic(mat)
        plan = build_super_plan(sym)
        # the relative-zeros budget must produce MXU-worthy panels
        assert plan.w.max() >= 8

    def test_infeasible_raises(self):
        from sprs_tpu.linalg.ldl_super import SupernodalPlanError

        mat = dirichlet_laplacian((8, 8))
        sym = LdlSymbolic.from_matrix(mat)
        with pytest.raises(SupernodalPlanError):
            build_super_plan(sym, panel_limit=16)


class TestUnionAmalgamation:
    def test_camd_postorder_supernodal_exact(self):
        # regression: union-amalgamated panels carry below rows in the
        # top block whenever w < W; their cross-terms used to drift the
        # masked columns to an exactly-zero pivot on integer-valued
        # Laplacian data, and the inf pivot sprayed inf*0 = NaN into
        # real columns (first seen on the 12x12 camd-ordered grid).
        import jax.numpy as jnp

        from sprs_tpu.linalg.ldl import _numeric_host
        from sprs_tpu.linalg.ldl_super import numeric_supernodal

        for g, fill in ((12, "camd"), (16, "camd"), (16, "rcm")):
            mat = dirichlet_laplacian((g, g))
            sym = (
                Ldl()
                .fill_in_reduction(fill)
                .check_symmetry(False)
                .symbolic(mat)
            )
            data = np.asarray(mat.to_csr().data, np.float64)
            lx_h, d_h = _numeric_host(sym, data)
            plan = sym.super_plan()
            lx_s, d_s = numeric_supernodal(plan, jnp.asarray(data))
            assert np.isfinite(np.asarray(lx_s)).all()
            np.testing.assert_allclose(
                np.asarray(lx_s), lx_h, rtol=0, atol=1e-12
            )
            np.testing.assert_allclose(
                np.asarray(d_s), d_h, rtol=0, atol=1e-12
            )

    def test_union_lists_cover_member_columns(self):
        from sprs_tpu.linalg.supernodes import amalgamate_union

        mat = dirichlet_laplacian((14, 14))
        sym = (
            Ldl()
            .fill_in_reduction("camd")
            .check_symmetry(False)
            .symbolic(mat)
        )
        lp = np.asarray(sym.l_indptr)
        li = np.asarray(sym.l_indices)
        sn, bptr, bflat = amalgamate_union(
            lp, li, np.asarray(sym.parent), np.diff(lp)
        )
        for s in range(sn.n_snodes):
            c0, c1 = int(sn.ptr[s]), int(sn.ptr[s + 1])
            rows = set(bflat[bptr[s] : bptr[s + 1]].tolist())
            # ascending, no duplicates
            seg = bflat[bptr[s] : bptr[s + 1]]
            assert (np.diff(seg) > 0).all() if seg.size > 1 else True
            for j in range(c0, c1):
                below = li[lp[j] : lp[j + 1]]
                below = below[below >= c1]
                assert set(below.tolist()) <= rows, (s, j)


class TestSupernodalSolve:
    def test_matches_level_solve_and_oracle(self):
        import jax

        rng = np.random.default_rng(3)
        for g, fill in ((8, "rcm"), (12, "camd"), (16, "camd")):
            mat = dirichlet_laplacian((g, g))
            dense = np.asarray(mat.to_dense())
            num = (
                Ldl()
                .fill_in_reduction(fill)
                .check_symmetry(False)
                .numeric(mat)
            )
            b = rng.random(dense.shape[0]).astype(np.float32)
            x_lv = np.asarray(num.solve(b))
            x_sp = np.asarray(num.solve(b, method="super"))
            np.testing.assert_allclose(x_sp, x_lv, rtol=2e-4, atol=2e-4)
            np.testing.assert_allclose(
                dense @ x_sp, b, rtol=1e-3, atol=1e-3
            )
        # jittable end-to-end
        mat = dirichlet_laplacian((10, 10))
        num = Ldl().fill_in_reduction("camd").numeric(mat)
        b = np.linspace(1, 2, mat.shape[0]).astype(np.float32)
        f = jax.jit(lambda v: num.solve(v, method="super"))
        np.testing.assert_allclose(
            np.asarray(f(b)),
            np.asarray(num.solve(b)),
            rtol=2e-4,
            atol=2e-4,
        )

    def test_multi_rhs(self):
        rng = np.random.default_rng(5)
        d0 = rng.random((40, 40)) * (rng.random((40, 40)) < 0.2)
        spd = d0 @ d0.T + np.eye(40) * 40
        mat = st.from_dense(spd)
        num = (
            Ldl()
            .fill_in_reduction("camd")
            .check_symmetry(False)
            .numeric(mat)
        )
        B = rng.random((40, 3))
        X = np.asarray(num.solve(B, method="super"))
        assert np.abs(spd @ X - B).max() < 1e-5
