"""Multifrontal-lite LDLᵀ numeric: parity against the exact host
numeric, across front budgets (tiny fronts force heavy aggregation,
huge budgets degenerate to the pure left-looking schedule).

Mirrors tests/test_ldl_super.py's relative-closeness discipline (the
aggregation reorders floating-point sums; bit identity is not the
contract — golden parity lives in tests/test_ldl_golden.py).
"""

import numpy as np
import pytest

import sprs_tpu as st
from sprs_tpu.linalg import Ldl
from sprs_tpu.linalg.ldl_mf import build_mf_plan, numeric_multifrontal
from sprs_tpu.linalg.ldl_super import panels_from_csc, solve_supernodal
from sprs_tpu.utils.special import dirichlet_laplacian


def _rand_spd(n, density, seed):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, n)) * (rng.random((n, n)) < density)
    return a @ a.T + n * np.eye(n)


def _host_and_mf(mat, fill="none", **plan_kwargs):
    builder = Ldl().fill_in_reduction(fill).check_symmetry(False)
    sym = builder.symbolic(mat)
    host = sym.factor(mat, backend="host")
    plan = build_mf_plan(sym, **plan_kwargs)
    a = mat.to_csr()
    lx, d = numeric_multifrontal(plan, a.data)
    return sym, host, plan, np.asarray(lx), np.asarray(d)


def _assert_close(host, lx, d, rtol=1e-10):
    l_h = np.asarray(host.l_data)
    scale = max(np.abs(l_h).max(), 1.0)
    np.testing.assert_allclose(lx, l_h, rtol=rtol, atol=rtol * scale)
    np.testing.assert_allclose(d, np.asarray(host.d), rtol=rtol)


class TestMultifrontalParity:
    @pytest.mark.parametrize("fill", ["none", "rcm", "camd"])
    def test_laplacian(self, fill):
        mat = dirichlet_laplacian((12, 12))
        _, host, plan, lx, d = _host_and_mf(mat, fill)
        assert plan.F >= 1
        _assert_close(host, lx, d)

    @pytest.mark.parametrize("max_cols", [8, 24, 10_000])
    def test_front_budget_sweep(self, max_cols):
        # tiny budgets force many fronts (aggregation-dominated);
        # a huge budget gives F == 1 (no cross-front aggregate at all)
        mat = dirichlet_laplacian((9, 13))
        _, host, plan, lx, d = _host_and_mf(
            mat, "camd", max_front_cols=max_cols, max_front_rows=10_000
        )
        if max_cols >= 10_000:
            assert plan.F == 1
        else:
            assert plan.F > 1
        _assert_close(host, lx, d)

    def test_random_spd(self):
        spd = _rand_spd(60, 0.08, 3)
        _, host, plan, lx, d = _host_and_mf(
            st.from_dense(spd), "camd", max_front_cols=16
        )
        _assert_close(host, lx, d)

    def test_row_budget_cut(self):
        # the rows budget bounds |R_f|: subtree roots whose below count
        # exceeds it are refused, and leftover merging cuts on the
        # distinct-row estimate — a tiny budget must still be exact
        mat = dirichlet_laplacian((10, 10))
        _, host, plan, lx, d = _host_and_mf(
            mat, "rcm", max_front_cols=8, max_front_rows=4
        )
        assert plan.F > 1
        _assert_close(host, lx, d)

    def test_solve_on_mf_panels(self):
        # solve_supernodal consumes an MfPlan unchanged (same geometry
        # surface as SuperPlan)
        mat = dirichlet_laplacian((8, 11))
        sym, host, plan, lx, d = _host_and_mf(mat, "none", max_front_cols=16)
        n = sym.n
        rng = np.random.default_rng(0)
        b = rng.normal(size=n)
        panels = panels_from_csc(plan, lx)
        x = np.asarray(solve_supernodal(plan, panels, d, b))
        dense = np.asarray(mat.to_dense())
        np.testing.assert_allclose(x, np.linalg.solve(dense, b), rtol=1e-8)

    def test_refactorization_same_plan(self):
        mat = dirichlet_laplacian((7, 7))
        builder = Ldl().fill_in_reduction("none").check_symmetry(False)
        sym = builder.symbolic(mat)
        plan = build_mf_plan(sym, max_front_cols=12)
        a = mat.to_csr()
        scaled = a.data * 3.0
        lx, d = numeric_multifrontal(plan, scaled)
        host = sym.factor(
            st.CsMat(a.indptr, a.indices, scaled, a.shape, a.storage),
            backend="host",
        )
        _assert_close(host, np.asarray(lx), np.asarray(d))

    def test_factor_backend_mf(self):
        mat = dirichlet_laplacian((9, 9))
        builder = Ldl().fill_in_reduction("camd").check_symmetry(False)
        sym = builder.symbolic(mat)
        host = sym.factor(mat, backend="host")
        num = sym.factor(mat, backend="mf")
        _assert_close(host, np.asarray(num.l_data), np.asarray(num.d))
