"""Level-batched LDLᵀ numeric: parity against the exact host numeric
for BOTH plan types (SuperPlan, MfPlan), across orderings, front
budgets, and round widths (width 1 degenerates to the sequential
schedule; tiny widths force maximal round splitting).

Same relative-closeness discipline as tests/test_ldl_mf.py — batched
rounds reorder commutative float adds; bit identity is not the
contract (golden parity lives in tests/test_ldl_golden.py).
"""

import numpy as np
import pytest

import sprs_tpu as st
from sprs_tpu.linalg import Ldl
from sprs_tpu.linalg.ldl_batched import build_round_schedule, numeric_batched
from sprs_tpu.linalg.ldl_mf import build_mf_plan
from sprs_tpu.linalg.ldl_super import panels_from_csc, solve_supernodal
from sprs_tpu.utils.special import dirichlet_laplacian


def _rand_spd(n, density, seed):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, n)) * (rng.random((n, n)) < density)
    return a @ a.T + n * np.eye(n)


def _host_and_plan(mat, fill="none", kind="super", **plan_kwargs):
    builder = Ldl().fill_in_reduction(fill).check_symmetry(False)
    sym = builder.symbolic(mat)
    host = sym.factor(mat, backend="host")
    if kind == "super":
        plan = sym.super_plan(**plan_kwargs)
    else:
        plan = build_mf_plan(sym, **plan_kwargs)
    return sym, host, plan


def _assert_close(host, lx, d, rtol=1e-10):
    l_h = np.asarray(host.l_data)
    scale = max(np.abs(l_h).max(), 1.0)
    np.testing.assert_allclose(np.asarray(lx), l_h, rtol=rtol, atol=rtol * scale)
    np.testing.assert_allclose(np.asarray(d), np.asarray(host.d), rtol=rtol)


class TestBatchedParity:
    @pytest.mark.parametrize("fill", ["none", "rcm", "camd"])
    @pytest.mark.parametrize("kind", ["super", "mf"])
    def test_laplacian(self, fill, kind):
        mat = dirichlet_laplacian((12, 12))
        sym, host, plan = _host_and_plan(mat, fill, kind)
        sched = build_round_schedule(plan)
        assert sched.R < plan.n_tasks  # batching actually batched
        lx, d = numeric_batched(plan, sched, mat.to_csr().data)
        _assert_close(host, lx, d)

    @pytest.mark.parametrize("bu,bf,ba", [(1, 1, 1), (3, 2, 2), (64, 64, 8)])
    def test_round_width_sweep(self, bu, bf, ba):
        mat = dirichlet_laplacian((9, 13))
        sym, host, plan = _host_and_plan(
            mat, "camd", "mf", max_front_cols=24
        )
        sched = build_round_schedule(plan, bu=bu, bf=bf, ba=ba)
        lx, d = numeric_batched(plan, sched, mat.to_csr().data)
        _assert_close(host, lx, d)

    @pytest.mark.parametrize("max_cols", [8, 24, 10_000])
    def test_mf_front_budget_sweep(self, max_cols):
        mat = dirichlet_laplacian((9, 13))
        sym, host, plan = _host_and_plan(
            mat, "camd", "mf", max_front_cols=max_cols, max_front_rows=10_000
        )
        sched = build_round_schedule(plan, bu=8, bf=8, ba=4)
        lx, d = numeric_batched(plan, sched, mat.to_csr().data)
        _assert_close(host, lx, d)

    def test_random_spd_super(self):
        spd = _rand_spd(60, 0.08, 3)
        mat = st.from_dense(spd)
        sym, host, plan = _host_and_plan(mat, "camd", "super")
        sched = build_round_schedule(plan, bu=4, bf=4)
        lx, d = numeric_batched(plan, sched, mat.to_csr().data)
        _assert_close(host, lx, d)

    def test_refactorization_same_schedule(self):
        # the schedule is static: rescaled data reuses it unchanged
        mat = dirichlet_laplacian((7, 7))
        builder = Ldl().fill_in_reduction("none").check_symmetry(False)
        sym = builder.symbolic(mat)
        plan = build_mf_plan(sym, max_front_cols=12)
        sched = build_round_schedule(plan, bu=4, bf=4, ba=2)
        a = mat.to_csr()
        scaled = a.data * 3.0
        lx, d = numeric_batched(plan, sched, scaled)
        host = sym.factor(
            st.CsMat(a.indptr, a.indices, scaled, a.shape, a.storage),
            backend="host",
        )
        _assert_close(host, lx, d)

    def test_solve_on_batched_factor(self):
        mat = dirichlet_laplacian((8, 11))
        sym, host, plan = _host_and_plan(mat, "camd", "mf", max_front_cols=16)
        sched = build_round_schedule(plan, bu=8, bf=8, ba=4)
        lx, d = numeric_batched(plan, sched, mat.to_csr().data)
        n = sym.n
        rng = np.random.default_rng(0)
        b = rng.normal(size=n)
        panels = panels_from_csc(plan, lx)
        perm = np.asarray(sym.perm.perm)
        x = np.asarray(
            solve_supernodal(plan, panels, d, b[perm])
        )[np.argsort(perm)]
        dense = np.asarray(mat.to_dense())
        np.testing.assert_allclose(x, np.linalg.solve(dense, b), rtol=1e-8)

    def test_jit_with_plan_and_schedule_as_args(self):
        # plans and schedules are pytrees: pass them THROUGH jit
        import jax

        mat = dirichlet_laplacian((10, 10))
        sym, host, plan = _host_and_plan(mat, "camd", "mf")
        sched = build_round_schedule(plan, bu=8, bf=8, ba=4)
        fn = jax.jit(numeric_batched)
        lx, d = fn(plan, sched, mat.to_csr().data)
        _assert_close(host, lx, d)


class TestBatchedAtScale:
    """65k-row (256² nd) parity — the round-4 verdict asked for a
    >=256² CPU check so at-scale TPU numbers have a correctness anchor
    (12×12-40² parity says nothing about deep-schedule bugs)."""

    def test_256_grid_nd_parity_and_residual(self):
        mat = dirichlet_laplacian((256, 256))
        sym, host, plan = _host_and_plan(
            mat, "nd", "super", rel_zeros=0.85
        )
        sched = build_round_schedule(plan)
        data = mat.to_csr().data.astype(np.float64)
        lx, d = numeric_batched(plan, sched, data)
        # f64 batched rounds reorder commutative adds only
        _assert_close(host, lx, d, rtol=1e-9)
        # relative backward error of a full solve through the factor
        from sprs_tpu.linalg.ldl import LdlNumeric

        num = LdlNumeric(sym, lx, d)
        n = sym.n
        b = np.linspace(1.0, 2.0, n)
        x = np.asarray(num.solve(b, method="super"), np.float64)
        r = np.asarray(st.spmv(mat, x), np.float64) - b
        rbe = np.abs(r).max() / (8.0 * np.abs(x).max() + np.abs(b).max())
        assert rbe < 1e-12, rbe


class TestRowClasses:
    """Round-5 row-class lanes: per-class (MR_c, W) shapes must be
    exact for any class count, and max_classes=1 must degenerate to
    the old single global-MR schedule."""

    @pytest.mark.parametrize("max_classes", [1, 2, 4, 8])
    def test_class_count_sweep(self, max_classes):
        from sprs_tpu.linalg.ldl_batched import (
            build_round_schedule,
            numeric_batched,
        )

        mat = dirichlet_laplacian((11, 13))
        sym, host, plan = _host_and_plan(mat, "camd", "super")
        sched = build_round_schedule(plan, max_classes=max_classes)
        assert len(sched.upd_mr) <= max_classes
        if max_classes == 1:
            assert sched.upd_mr == (plan.MR,)
        lx, d = numeric_batched(plan, sched, mat.to_csr().data)
        _assert_close(host, lx, d)

    def test_mf_with_classes(self):
        from sprs_tpu.linalg.ldl_batched import (
            build_round_schedule,
            numeric_batched,
        )

        mat = dirichlet_laplacian((10, 14))
        sym, host, plan = _host_and_plan(
            mat, "camd", "mf", max_front_cols=24
        )
        sched = build_round_schedule(plan, max_classes=3)
        lx, d = numeric_batched(plan, sched, mat.to_csr().data)
        _assert_close(host, lx, d)


class TestSolveBatched:
    """Round-batched panel solve: the factor rounds are a legal solve
    level schedule (every solve edge is a factor-schedule edge)."""

    @pytest.mark.parametrize("kind", ["super", "mf"])
    def test_matches_sequential_solve(self, kind):
        from sprs_tpu.linalg.ldl_batched import (
            build_round_schedule,
            numeric_batched,
            solve_batched,
        )
        from sprs_tpu.linalg.ldl_super import (
            panels_from_csc,
            solve_supernodal,
        )

        mat = dirichlet_laplacian((13, 9))
        sym, host, plan = _host_and_plan(
            mat, "camd", kind, **({"max_front_cols": 24} if kind == "mf" else {})
        )
        sched = build_round_schedule(plan)
        lx, d = numeric_batched(plan, sched, mat.to_csr().data)
        panels = panels_from_csc(plan, lx)
        rng = np.random.default_rng(3)
        b = rng.standard_normal(sym.n)
        x_seq = np.asarray(solve_supernodal(plan, panels, d, b))
        x_bat = np.asarray(solve_batched(plan, sched, panels, d, b))
        np.testing.assert_allclose(x_bat, x_seq, rtol=1e-9, atol=1e-11)
        # and against the dense oracle
        dense = np.asarray(mat.to_dense())
        bb = b
        if sym.perm is not None:
            dense = dense[np.asarray(sym.perm.perm)][
                :, np.asarray(sym.perm.perm)
            ]
        np.testing.assert_allclose(
            dense @ x_bat, bb, rtol=1e-7, atol=1e-8
        )

    def test_solve_gate_routes_on_plan_size(self, monkeypatch):
        """LdlNumeric.solve uses the round-batched sweeps only past
        SOLVE_BATCHED_MIN_S (measured crossover: x0.29 at S=968 vs
        x1.04 at S=15182, results_r5/ldl*_mf_solveb.json); both
        branches must agree with the dense oracle."""
        from sprs_tpu.linalg import ldl_batched as lb

        mat = dirichlet_laplacian((13, 9))
        builder = Ldl().fill_in_reduction("camd").check_symmetry(False)
        sym = builder.symbolic(mat)
        num = sym.factor(mat, backend="mf-batched")
        plan = sym.__dict__.get("_mf_plan")
        assert plan is not None
        assert (sym.__dict__.get("_round_scheds") or {}).get(
            id(plan)
        ) is not None
        rng = np.random.default_rng(7)
        b = rng.standard_normal(sym.n).astype(np.float32)
        dense = np.asarray(mat.to_dense(), np.float64)
        x_ref = np.linalg.solve(dense, b.astype(np.float64))

        assert plan.S < lb.SOLVE_BATCHED_MIN_S  # small plan: sequential
        x_seq = np.asarray(num.solve(b))
        np.testing.assert_allclose(x_seq, x_ref, rtol=5e-4, atol=5e-4)

        monkeypatch.setattr(lb, "SOLVE_BATCHED_MIN_S", 1)  # force batched
        x_bat = np.asarray(num.solve(b))
        np.testing.assert_allclose(x_bat, x_ref, rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(x_bat, x_seq, rtol=1e-5, atol=1e-5)
