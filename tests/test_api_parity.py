"""Small parity surface: to_inner_onehot, insert/append_outer, CsVec
to_set/items, profiling byte accounting."""

import jax
import numpy as np
import pytest

import sprs_tpu as st
from sprs_tpu.utils.profile import (
    csr_spmv_bytes,
    dia_spmv_bytes,
    ell_spmv_bytes,
    roofline_report,
)


class TestInnerOnehot:
    def test_basic(self):
        d = np.array(
            [[0.0, 3.0, 1.0], [0.0, 0.0, 0.0], [5.0, 2.0, 9.0]]
        )
        hot = st.from_dense(d).to_inner_onehot()
        expect = np.array(
            [[0.0, 1.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 1.0]]
        )
        np.testing.assert_allclose(np.asarray(hot.to_dense()), expect)
        hot.check_structure()

    def test_nan_ignored(self):
        d = np.array([[np.nan, 2.0], [1.0, np.nan]])
        hot = st.from_dense(d).to_inner_onehot()
        expect = np.array([[0.0, 1.0], [1.0, 0.0]])
        np.testing.assert_allclose(np.asarray(hot.to_dense()), expect)

    def test_csc(self):
        d = np.array([[1.0, 4.0], [3.0, 2.0]])
        hot = st.from_dense(d, storage="csc").to_inner_onehot()
        assert hot.is_csc
        # per column: max of col0 is row1 (3), col1 is row0 (4)
        expect = np.array([[0.0, 1.0], [1.0, 0.0]])
        np.testing.assert_allclose(np.asarray(hot.to_dense()), expect)

    def test_jit(self):
        d = np.array([[0.0, 3.0], [7.0, 1.0]])
        m = st.from_dense(d)
        hot = jax.jit(lambda m: m.to_inner_onehot())(m)
        np.testing.assert_allclose(
            np.asarray(hot.to_dense()),
            np.array([[0.0, 1.0], [1.0, 0.0]]),
        )


class TestInsertAppend:
    def test_insert_new(self):
        d = np.array([[1.0, 0.0], [0.0, 2.0]])
        m = st.from_dense(d).insert(0, 1, 5.0)
        d[0, 1] = 5.0
        np.testing.assert_allclose(np.asarray(m.to_dense()), d)
        m.check_structure()

    def test_insert_overwrite(self):
        d = np.array([[1.0, 0.0], [0.0, 2.0]])
        m = st.from_dense(d).insert(1, 1, -3.0)
        d[1, 1] = -3.0
        np.testing.assert_allclose(np.asarray(m.to_dense()), d)

    def test_insert_out_of_range(self):
        m = st.from_dense(np.eye(2))
        with pytest.raises(st.ShapeError):
            m.insert(2, 0, 1.0)

    def test_append_outer(self):
        d = np.array([[1.0, 0.0, 2.0]])
        m = st.from_dense(d).append_outer(np.array([0.0, 7.0, 0.0]))
        assert m.shape == (2, 3)
        np.testing.assert_allclose(
            np.asarray(m.to_dense()),
            np.array([[1.0, 0.0, 2.0], [0.0, 7.0, 0.0]]),
        )
        m.check_structure()

    def test_append_outer_csc(self):
        d = np.array([[1.0], [0.0]])
        m = st.from_dense(d, storage="csc").append_outer(
            np.array([3.0, 4.0])
        )
        assert m.shape == (2, 2)
        np.testing.assert_allclose(
            np.asarray(m.to_dense()), np.array([[1.0, 3.0], [0.0, 4.0]])
        )


class TestCsVecSet:
    def test_to_set(self):
        v = st.csvec(5, [1, 3], [2.0, -1.0])
        s = v.to_set()
        assert s == {1: 2.0, 3: -1.0}
        assert dict(v.items()) == s


class TestPrepareSpmv:
    def test_banded_picks_dia(self):
        from sprs_tpu.formats.dia import DiaMat
        from sprs_tpu.ops.prod import prepare_spmv

        lap = st.utils.grid_laplacian((8, 8), dtype=np.float64)
        fn, prep = prepare_spmv(lap, use_pallas=False)
        assert isinstance(prep, DiaMat)
        x = np.random.default_rng(0).random(64)
        y = jax.jit(fn)(prep, x)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(lap.to_dense()) @ x
        )

    def test_moderate_picks_ell(self):
        from sprs_tpu.formats.ell import EllMat
        from sprs_tpu.ops.prod import prepare_spmv

        rng = np.random.default_rng(1)
        d = rng.standard_normal((64, 64))
        d[rng.random((64, 64)) > 0.6] = 0.0  # dense-ish: many diagonals
        m = st.from_dense(d)
        fn, prep = prepare_spmv(m, use_pallas=False)
        assert isinstance(prep, EllMat)
        x = rng.random(64)
        np.testing.assert_allclose(
            np.asarray(fn(prep, x)), d @ x, rtol=1e-10
        )

    def test_skewed_picks_csr(self):
        from sprs_tpu.ops.prod import prepare_spmv

        # one dense row, rest nearly empty: huge ELL padding overhead
        d = np.zeros((200, 200))
        d[0, :] = 1.0
        d[np.arange(1, 200), 0] = 2.0
        m = st.from_dense(d)
        fn, prep = prepare_spmv(m, use_pallas=False)
        assert prep is m
        x = np.random.default_rng(2).random(200)
        np.testing.assert_allclose(
            np.asarray(fn(prep, x)), d @ x, rtol=1e-10
        )


class TestProfileAccounting:
    def test_byte_formulas(self):
        assert csr_spmv_bytes(10, 4) == 10 * 12 + 4 * 8
        assert dia_spmv_bytes(5, 100, 100) == (500 + 200) * 4
        assert ell_spmv_bytes(8, 3, 10) == 8 * 3 * 8 + 18 * 4

    def test_roofline_report(self):
        rep = roofline_report("k", 0.001, 1_000_000, flops=500, peak_gbps=10.0)
        assert rep["achieved_GBps"] == 1.0
        assert rep["roofline_fraction"] == pytest.approx(0.1)
        assert rep["kernel"] == "k"


class TestPrepareSpmm:
    def test_banded_dispatches_dia(self):
        import jax

        from sprs_tpu.ops.prod import prepare_spmm
        from sprs_tpu.utils.special import dirichlet_laplacian

        lap = dirichlet_laplacian((8, 8), dtype=np.float64)
        fn, prep = prepare_spmm(lap)
        assert type(prep).__name__ == "DiaMat"
        x = np.random.default_rng(0).standard_normal((64, 5))
        y = jax.jit(fn)(prep, x)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(lap.to_dense()) @ x, rtol=1e-10
        )

    def test_uniform_rows_dispatch_ell(self):
        from sprs_tpu.ops.prod import prepare_spmm

        rng = np.random.default_rng(5)
        d = np.zeros((60, 60))
        for i in range(60):  # exactly 40 nnz/row: zero ELL overhead
            cols = rng.choice(60, size=40, replace=False)
            d[i, cols] = rng.standard_normal(40)
        m = st.from_dense(d)
        fn, prep = prepare_spmm(m)
        assert type(prep).__name__ == "EllMat"
        x = rng.standard_normal((60, 9))
        np.testing.assert_allclose(
            np.asarray(fn(prep, x)), d @ x, rtol=1e-10
        )

    def test_skewed_rows_dispatch_csr(self):
        from sprs_tpu.ops.prod import prepare_spmm

        rng = np.random.default_rng(6)
        d = np.zeros((80, 80))
        d[0, :] = 1.0  # one full row dominates the ELL width
        d[np.arange(40, 80), np.arange(40)] = 2.0
        m = st.from_dense(d)
        fn, prep = prepare_spmm(m)
        assert type(prep).__name__ == "CsMat"
        x = rng.standard_normal((80, 4))
        np.testing.assert_allclose(
            np.asarray(fn(prep, x)), d @ x, rtol=1e-10
        )

    def test_use_pallas_wide_rhs(self):
        import jax

        from sprs_tpu.ops.prod import prepare_spmm
        from sprs_tpu.utils.special import dirichlet_laplacian

        lap = dirichlet_laplacian((8, 8), dtype=np.float32)
        fn, prep = prepare_spmm(lap, use_pallas=True)
        x = np.random.default_rng(1).standard_normal((64, 256)).astype(
            np.float32
        )
        y = fn(prep, x)  # wide RHS -> pallas lagflat (interpret on CPU)
        np.testing.assert_allclose(
            np.asarray(y),
            np.asarray(lap.to_dense()) @ x,
            rtol=2e-4,
            atol=2e-4,
        )


class TestChainTimers:
    def test_chain_time_best_runs_and_is_positive(self):
        import jax.numpy as jnp

        from sprs_tpu.utils.profile import chain_time, chain_time_best

        x0 = jnp.arange(1024.0)
        step = lambda v: v * 1.0000001  # noqa: E731
        t1 = chain_time(step, x0, iters=3)
        t2 = chain_time_best(step, x0, iters=3, rounds=2)
        assert t1 > 0 and t2 > 0
        assert t2 <= t1 * 50  # same order of magnitude
