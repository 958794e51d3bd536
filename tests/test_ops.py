"""Dense-oracle tests for products, binops, kron, stacking, permutations.

The key pattern replicated from the reference (prod.rs:598-693): every
sparse expression is compared against the dense computation of the same
expression across all storage/layout combinations, rtol=1e-7 atol=1e-12.
"""

import itertools

import jax
import numpy as np
import pytest

import sprs_tpu as st
from sprs_tpu.utils import fixtures

RTOL, ATOL = 1e-7, 1e-12


def allclose(x, y):
    np.testing.assert_allclose(np.asarray(x), y, rtol=RTOL, atol=ATOL)


DA = fixtures.dense_a()
DB = fixtures.dense_b()
DR = fixtures.dense_rect()


class TestSpMV:
    @pytest.mark.parametrize("storage", ["csr", "csc"])
    def test_square(self, storage):
        m = st.from_dense(DA, storage=storage)
        x = np.arange(1.0, 6.0)
        allclose(st.spmv(m, x), DA @ x)
        allclose(m @ x, DA @ x)

    @pytest.mark.parametrize("storage", ["csr", "csc"])
    def test_rect(self, storage):
        m = st.from_dense(DR, storage=storage)
        x = np.arange(6.0)
        allclose(m @ x, DR @ x)

    def test_vec_times_mat(self):
        m = st.from_dense(DR)
        x = np.arange(4.0)
        allclose(st.ops.rmatmul(x, m), x @ DR)


class TestSpMM:
    @pytest.mark.parametrize(
        "storage,k", itertools.product(["csr", "csc"], [1, 3, 8])
    )
    def test_sparse_dense(self, storage, k):
        m = st.from_dense(DR, storage=storage)
        x = np.arange(6.0 * k).reshape(6, k)
        allclose(m @ x, DR @ x)

    def test_dense_sparse(self):
        m = st.from_dense(DR)
        x = np.arange(12.0).reshape(3, 4)
        allclose(st.ops.rmatmul(x, m), x @ DR)


class TestSpGEMM:
    @pytest.mark.parametrize(
        "s1,s2", itertools.product(["csr", "csc"], repeat=2)
    )
    def test_all_storage_combos(self, s1, s2):
        a = st.from_dense(DA, storage=s1)
        b = st.from_dense(DB, storage=s2)
        c = st.spgemm(a, b)
        assert c.storage == s1  # result storage follows lhs
        allclose(c.to_dense(), DA @ DB)
        c.to_csr().check_structure()

    def test_self_product(self):
        a = st.from_dense(DA)
        allclose(st.spgemm(a, a).to_dense(), DA @ DA)

    def test_rect(self):
        a = st.from_dense(DR)  # 4x6
        b = st.from_dense(DR.T)  # 6x4
        allclose(st.spgemm(a, b).to_dense(), DR @ DR.T)

    def test_zero_rows_regression(self):
        # analog of reference smmp.rs:476-489 (#239): operands with empty rows
        z = np.zeros((4, 4))
        z[1, 2] = 3.0
        a = st.from_dense(z)
        allclose(st.spgemm(a, a).to_dense(), z @ z)

    def test_with_identity(self):
        a = st.from_dense(DA)
        i = st.eye(5, dtype=a.dtype)
        allclose(st.spgemm(a, i).to_dense(), DA)
        allclose(st.spgemm(i, a).to_dense(), DA)

    def test_mat_times_sparse_vec(self):
        a = st.from_dense(DA)
        v = st.csvec(5, [0, 3], [1.0, 2.0])
        out = a @ v
        assert isinstance(out, st.CsVec)
        allclose(out.to_dense(), DA @ v.to_dense())

    def test_sparse_vec_times_mat(self):
        a = st.from_dense(DA)
        v = st.csvec(5, [0, 3], [1.0, 2.0])
        out = v @ a
        assert isinstance(out, st.CsVec)
        allclose(out.to_dense(), v.to_dense() @ DA)

    def test_random_larger(self):
        rng = np.random.default_rng(0)
        d1 = rng.random((40, 30)) * (rng.random((40, 30)) < 0.1)
        d2 = rng.random((30, 50)) * (rng.random((30, 50)) < 0.1)
        c = st.spgemm(st.from_dense(d1), st.from_dense(d2))
        allclose(c.to_dense(), d1 @ d2)
        assert c.nnz == np.count_nonzero(d1 @ d2)

    def test_capacity_error(self):
        a = st.from_dense(DA)
        with pytest.raises(st.CapacityError):
            st.spgemm(a, a, out_cap=2)


class TestBinop:
    @pytest.mark.parametrize(
        "s1,s2", itertools.product(["csr", "csc"], repeat=2)
    )
    def test_add_sub(self, s1, s2):
        a = st.from_dense(DA, storage=s1)
        b = st.from_dense(DB, storage=s2)
        c = a + b
        assert c.storage == s1
        allclose(c.to_dense(), DA + DB)
        allclose((a - b).to_dense(), DA - DB)

    def test_elementwise_mul(self):
        a = st.from_dense(DA)
        b = st.from_dense(DB)
        allclose((a * b).to_dense(), DA * DB)

    def test_max_min(self):
        a = st.from_dense(DA)
        b = st.from_dense(DB)
        allclose(st.ops.maximum(a, b).to_dense(), np.maximum(DA, DB))
        allclose(st.ops.minimum(a, b).to_dense(), np.minimum(DA, DB))

    def test_sparse_plus_dense(self):
        a = st.from_dense(DA)
        allclose(a + DB, DA + DB)
        allclose(a - DB, DA - DB)
        allclose(st.ops.sub(DB, a), DB - DA)

    def test_mul_dense_keeps_pattern(self):
        a = st.from_dense(DA)
        dense = np.full_like(DA, 2.0)
        out = a * dense
        assert isinstance(out, st.CsMat)
        assert out.nnz == a.nnz
        allclose(out.to_dense(), DA * 2.0)

    def test_cancellation_keeps_stored_zero(self):
        a = st.from_dense(DA)
        c = a - a
        allclose(c.to_dense(), np.zeros_like(DA))
        pruned = c.compact()
        assert pruned.nnz == 0


class TestKron:
    def test_vs_numpy(self):
        a = st.from_dense(DA)
        b = st.from_dense(DR)
        allclose(
            st.kronecker_product(a, b).to_dense(), np.kron(DA, DR)
        )

    def test_csc_operands(self):
        a = st.from_dense(DA, storage="csc")
        b = st.from_dense(DB, storage="csc")
        allclose(
            st.kronecker_product(a, b).to_dense(), np.kron(DA, DB)
        )


class TestStack:
    def test_vstack(self):
        mats = [st.from_dense(DA), st.from_dense(DB, storage="csc")]
        allclose(st.vstack(mats).to_dense(), np.vstack([DA, DB]))

    def test_hstack(self):
        mats = [st.from_dense(DA), st.from_dense(DB)]
        out = st.hstack(mats)
        assert out.storage == "csc"
        allclose(out.to_dense(), np.hstack([DA, DB]))

    def test_bmat(self):
        a, r = st.from_dense(DA), st.from_dense(DR.T[:5])  # 5x4... shape juggle
        grid = [[a, None], [None, st.from_dense(DB)]]
        expect = np.block(
            [[DA, np.zeros((5, 5))], [np.zeros((5, 5)), DB]]
        )
        allclose(st.bmat(grid).to_dense(), expect)

    def test_bmat_shape_errors(self):
        a = st.from_dense(DA)
        with pytest.raises(st.ShapeError):
            st.bmat([[a, st.from_dense(DR)]])  # height mismatch
        with pytest.raises(st.ShapeError):
            st.bmat([[None, None], [a, None]])  # empty block col

    def test_stack_mismatch(self):
        with pytest.raises(st.ShapeError):
            st.vstack([st.from_dense(DA), st.from_dense(DR)])


class TestPermutation:
    def test_identity(self):
        p = st.Permutation.identity(5)
        m = st.from_dense(DA)
        allclose(st.permute_rows(m, p).to_dense(), DA)

    def test_apply_vec(self):
        p = st.Permutation.from_array([2, 0, 3, 1])
        x = np.array([10.0, 20.0, 30.0, 40.0])
        allclose(p @ x, x[[2, 0, 3, 1]])
        allclose(p.inverse() @ (p @ x), x)

    def test_permute_rows_cols(self):
        perm = [4, 2, 0, 1, 3]
        p = st.Permutation.from_array(perm)
        m = st.from_dense(DA)
        allclose(st.permute_rows(m, p).to_dense(), DA[perm])
        allclose(st.permute_cols(m, p).to_dense(), DA[:, perm])

    def test_papt(self):
        perm = [4, 2, 0, 1, 3]
        p = st.Permutation.from_array(perm)
        m = st.from_dense(DA)
        allclose(
            st.transform_mat_papt(m, p).to_dense(),
            DA[np.ix_(perm, perm)],
        )

    def test_paq(self):
        pr = st.Permutation.from_array([3, 1, 0, 2])
        pc = st.Permutation.from_array([5, 0, 1, 2, 4, 3])
        m = st.from_dense(DR)
        allclose(
            st.transform_mat_paq(m, pr, pc).to_dense(),
            DR[np.ix_([3, 1, 0, 2], [5, 0, 1, 2, 4, 3])],
        )

    def test_invalid_perm(self):
        with pytest.raises(st.StructureError):
            st.Permutation.from_array([0, 0, 1])

    def test_compose(self):
        p = st.Permutation.from_array([2, 0, 1])
        q = st.Permutation.from_array([1, 2, 0])
        x = np.array([1.0, 2.0, 3.0])
        allclose((p.compose(q)) @ x, p @ (q @ x))


class TestSymmetry:
    def test_symmetric(self):
        s = DA + DA.T
        assert st.is_symmetric(st.from_dense(s))
        assert st.is_symmetric(st.from_dense(s, storage="csc"))

    def test_asymmetric_value(self):
        s = DA + DA.T
        s[0, 3] += 1.0  # breaks value symmetry, keeps pattern
        assert not st.is_symmetric(st.from_dense(s))

    def test_asymmetric_pattern(self):
        assert not st.is_symmetric(st.from_dense(DA))

    def test_nonsquare(self):
        assert not st.is_symmetric(st.from_dense(DR))


class TestAssignToDense:
    def test_overwrites_stored_only(self):
        m = st.from_dense(DA)
        base = np.full((5, 5), 9.0)
        out = st.ops.assign_to_dense(base, m)
        expect = base.copy()
        expect[DA != 0] = DA[DA != 0]
        allclose(out, expect)


class TestJitAndAutodiff:
    def test_jit_dynamic_nnz_reuse(self):
        cap = 16
        m1 = st.from_dense(DA, cap=cap)
        m2 = st.from_dense(DB, cap=cap)
        calls = []

        @jax.jit
        def f(m, x):
            calls.append(1)
            return st.spmv(m, x)

        x = np.arange(1.0, 6.0)
        allclose(f(m1, x), DA @ x)
        allclose(f(m2, x), DB @ x)
        assert len(calls) == 1  # one trace serves both nnz

    def test_grad_through_spmv(self):
        m = st.from_dense(DA)
        x = np.arange(1.0, 6.0)

        def loss(data):
            return st.spmv(m.with_data(data), x).sum()

        g = jax.grad(loss)(m.data)
        # d(sum(Ax))/d a_ij = x_j at stored positions
        rows, cols, _ = m.coo_arrays()
        live = np.asarray(m.live_mask())
        expect = np.where(live, x[np.minimum(np.asarray(cols), 4)], 0.0)
        allclose(g, expect)

    def test_spgemm_chunked_matches_single_shot(self):
        import importlib

        sg = importlib.import_module("sprs_tpu.ops.spgemm")
        rng = np.random.default_rng(11)
        da = (rng.random((60, 40)) * (rng.random((60, 40)) < 0.25)).astype(
            np.float32
        )
        db = (rng.random((40, 50)) * (rng.random((40, 50)) < 0.25)).astype(
            np.float32
        )
        da[7] = 0.0  # empty row inside a chunk
        a, b = st.from_dense(da), st.from_dense(db)
        ref = st.spgemm(a, b)
        # force many chunks with a tiny budget; boundaries land
        # mid-matrix and at empty rows
        for budget in (16, 97, 1000):
            c = sg._spgemm_chunked(a, b.to_csr(), budget)
            np.testing.assert_allclose(
                np.asarray(c.to_dense()),
                np.asarray(ref.to_dense()),
                rtol=1e-6,
            )
            assert c.is_csr
            assert int(c.nnz) == int(ref.nnz)

    def test_spgemm_dense_matches_esc(self):
        rng = np.random.default_rng(5)
        da = (rng.random((37, 23)) * (rng.random((37, 23)) < 0.3)).astype(
            np.float32
        )
        db = (rng.random((23, 41)) * (rng.random((23, 41)) < 0.3)).astype(
            np.float32
        )
        a, b = st.from_dense(da), st.from_dense(db)
        c = st.spgemm_dense(a, b)
        np.testing.assert_allclose(
            np.asarray(c.to_dense()), da @ db, rtol=1e-5, atol=1e-6
        )
        assert c.is_csr
        # tightly packed on concrete inputs: nnz == numerical nonzeros
        assert int(c.nnz) == int(np.count_nonzero(da @ db))

    def test_spgemm_dense_chunked_matches(self):
        import importlib
        from unittest import mock

        sg = importlib.import_module("sprs_tpu.ops.spgemm")
        construct = importlib.import_module("sprs_tpu.ops.construct")
        rng = np.random.default_rng(6)
        # m=300 > the 128-row chunk floor so chunking really happens
        da = (
            rng.random((300, 30)) * (rng.random((300, 30)) < 0.1)
        ).astype(np.float32)
        db = (rng.random((30, 20)) * (rng.random((30, 20)) < 0.2)).astype(
            np.float32
        )
        a, b = st.from_dense(da), st.from_dense(db)
        old = sg.DENSE_BYTES_BUDGET
        try:
            # budget below dense_bytes=(300*30+30*20+300*20)*4=62400
            # but above fixed=k*n*4*2 so the COLUMN branch stays off
            sg.DENSE_BYTES_BUDGET = 20000
            with mock.patch.object(
                construct, "vstack", wraps=construct.vstack
            ) as vs:
                c = sg.spgemm_dense(a, b)
            assert vs.call_count == 1  # the chunk branch really ran
            assert len(vs.call_args[0][0]) == 3  # 128+128+44 rows
            # out_cap must be honored through the chunk path
            c_cap = sg.spgemm_dense(a, b, out_cap=4096)
            assert c_cap.cap == 4096
        finally:
            sg.DENSE_BYTES_BUDGET = old
        np.testing.assert_allclose(
            np.asarray(c.to_dense()), da @ db, rtol=1e-5, atol=1e-6
        )
        # CSC A through the chunked path (rows must still mean rows)
        try:
            sg.DENSE_BYTES_BUDGET = 20000
            c2 = sg.spgemm_dense(st.from_dense(da, storage="csc"), b)
        finally:
            sg.DENSE_BYTES_BUDGET = old
        np.testing.assert_allclose(
            np.asarray(c2.to_dense()), da @ db, rtol=1e-5, atol=1e-6
        )

    def test_spgemm_dense_oversized_chunk_no_recursion(self):
        import importlib

        sg = importlib.import_module("sprs_tpu.ops.spgemm")
        rng = np.random.default_rng(13)
        da = (rng.random((40, 30)) * (rng.random((40, 30)) < 0.2)).astype(
            np.float32
        )
        db = (rng.random((30, 25)) * (rng.random((30, 25)) < 0.2)).astype(
            np.float32
        )
        a, b = st.from_dense(da), st.from_dense(db)
        old = sg.DENSE_BYTES_BUDGET
        try:
            # budget so small even one 128-wide chunk exceeds it: must
            # fall through to the one-shot product, not recurse forever
            sg.DENSE_BYTES_BUDGET = 64
            c = sg.spgemm_dense(a, b)
        finally:
            sg.DENSE_BYTES_BUDGET = old
        np.testing.assert_allclose(
            np.asarray(c.to_dense()), da @ db, rtol=1e-5, atol=1e-6
        )

    def test_spgemm_dense_col_chunked_matches(self):
        import importlib

        sg = importlib.import_module("sprs_tpu.ops.spgemm")
        rng = np.random.default_rng(12)
        # wide B: dense B dominates the budget -> column chunking
        da = (rng.random((10, 30)) * (rng.random((10, 30)) < 0.3)).astype(
            np.float32
        )
        db = (
            rng.random((30, 400)) * (rng.random((30, 400)) < 0.1)
        ).astype(np.float32)
        a, b = st.from_dense(da), st.from_dense(db)
        old = sg.DENSE_BYTES_BUDGET
        try:
            sg.DENSE_BYTES_BUDGET = 30 * 150 * 4 * 2  # ~150 cols/chunk
            c = sg.spgemm_dense(a, b)
        finally:
            sg.DENSE_BYTES_BUDGET = old
        assert c.is_csr
        np.testing.assert_allclose(
            np.asarray(c.to_dense()), da @ db, rtol=1e-5, atol=1e-6
        )

    def test_spgemm_dense_csc_input_and_jit(self):
        rng = np.random.default_rng(7)
        da = (rng.random((12, 9)) * (rng.random((12, 9)) < 0.4)).astype(
            np.float32
        )
        db = (rng.random((9, 11)) * (rng.random((9, 11)) < 0.4)).astype(
            np.float32
        )
        a = st.from_dense(da, storage="csc")
        b = st.from_dense(db)
        c = st.spgemm_dense(a, b)
        np.testing.assert_allclose(
            np.asarray(c.to_dense()), da @ db, rtol=1e-5, atol=1e-6
        )

        @jax.jit
        def f(a, b):
            return st.spgemm_dense(a.to_csr(), b, out_cap=128)

        cj = f(st.from_dense(da), b)
        np.testing.assert_allclose(
            np.asarray(cj.to_dense()), da @ db, rtol=1e-5, atol=1e-6
        )

    def test_spgemm_method_routing(self):
        rng = np.random.default_rng(8)
        da = (rng.random((20, 15)) * (rng.random((20, 15)) < 0.5)).astype(
            np.float32
        )
        db = (rng.random((15, 18)) * (rng.random((15, 18)) < 0.5)).astype(
            np.float32
        )
        a, b = st.from_dense(da), st.from_dense(db)
        for method in ("esc", "dense", "auto"):
            c = st.spgemm(a, b, method=method)
            np.testing.assert_allclose(
                np.asarray(c.to_dense()), da @ db, rtol=1e-5, atol=1e-6
            )
        with pytest.raises(ValueError):
            st.spgemm(a, b, method="nope")

    def test_jit_spgemm_with_caps(self):
        a = st.from_dense(DA, cap=16)
        b = st.from_dense(DB, cap=16)

        @jax.jit
        def f(a, b):
            return st.spgemm(
                a, b, prod_cap=64, out_cap=32, check_capacity=False
            )

        allclose(f(a, b).to_dense(), DA @ DB)


class TestSpgemmAutodiff:
    """grad through ESC SpGEMM vs the dense oracle.

    Regression: the A-side values ride a bitcast delta-broadcast whose
    builtin gradient is ZERO — without the custom VJP in
    ops/spgemm.py::_seg_broadcast_float, grads silently vanished."""

    def test_grads_match_dense_oracle(self):
        rng = np.random.default_rng(3)
        d1 = rng.standard_normal((6, 5)) * (rng.random((6, 5)) < 0.5)
        d2 = rng.standard_normal((5, 7)) * (rng.random((5, 7)) < 0.5)
        a, b = st.from_dense(d1), st.from_dense(d2)
        w = rng.standard_normal((6, 7))

        def loss(da, db):
            aa = type(a)(a.indptr, a.indices, da, a.shape, a.storage)
            bb = type(b)(b.indptr, b.indices, db, b.shape, b.storage)
            c = st.spgemm(
                aa, bb, prod_cap=64, out_cap=64, check_capacity=False
            )
            return (c.to_dense() * w).sum()

        ga, gb = jax.grad(loss, argnums=(0, 1))(a.data, b.data)
        assert float(np.abs(np.asarray(ga)).max()) > 0  # old bug: zeros
        oracle_a = w @ d2.T
        oracle_b = d1.T @ w
        nnz_a, nnz_b = int(a.nnz), int(b.nnz)
        rows_a = np.repeat(np.arange(6), np.diff(np.asarray(a.indptr)))
        np.testing.assert_allclose(
            np.asarray(ga)[:nnz_a],
            oracle_a[rows_a, np.asarray(a.indices)[:nnz_a]],
            rtol=1e-6,
        )
        rows_b = np.repeat(np.arange(5), np.diff(np.asarray(b.indptr)))
        np.testing.assert_allclose(
            np.asarray(gb)[:nnz_b],
            oracle_b[rows_b, np.asarray(b.indices)[:nnz_b]],
            rtol=1e-6,
        )


    def test_spgemm_dense_grads_match_oracle(self):
        # the dense path has no custom VJP; matmul + scatter compose
        # differentiably — pin that both operand grads match the oracle
        rng = np.random.default_rng(9)
        d1 = rng.standard_normal((6, 5)) * (rng.random((6, 5)) < 0.6)
        d2 = rng.standard_normal((5, 7)) * (rng.random((5, 7)) < 0.6)
        a, b = st.from_dense(d1), st.from_dense(d2)

        def loss(adata, bdata):
            c = st.spgemm_dense(
                a.with_data(adata), b.with_data(bdata), out_cap=64
            )
            return (c.data ** 2).sum()

        def dense_loss(adata, bdata):
            c = a.with_data(adata).to_dense() @ b.with_data(
                bdata
            ).to_dense()
            return (c ** 2).sum()

        g = jax.grad(loss, argnums=(0, 1))(a.data, b.data)
        gd = jax.grad(dense_loss, argnums=(0, 1))(a.data, b.data)
        assert float(np.abs(np.asarray(g[0])).sum()) > 0
        np.testing.assert_allclose(g[0], gd[0], rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(g[1], gd[1], rtol=1e-6, atol=1e-9)

class TestVmapSamePattern:
    """vmap over VALUES with a shared pattern: one compile serves a
    batch of same-structure matrices (the capacity-padding payoff)."""


    def test_vmap_spmv_over_data(self):
        d = np.array([[1.0, 0, 2], [0, 3, 0], [4, 0, 5]])
        m = st.from_dense(d)
        batch = np.stack(
            [np.asarray(m.data) * s for s in (1.0, 2.0, -0.5)]
        )
        x = np.ones(3)

        def f(data):
            mm = type(m)(m.indptr, m.indices, data, m.shape, m.storage)
            return st.spmv(mm, x)

        import jax.numpy as jnp

        ys = jax.vmap(f)(jnp.asarray(batch))
        for i, s in enumerate((1.0, 2.0, -0.5)):
            np.testing.assert_allclose(
                np.asarray(ys)[i], (d * s) @ x, rtol=1e-10
            )

    def test_vmap_grad_composition(self):
        d = np.array([[2.0, 1.0], [0.0, 3.0]])
        m = st.from_dense(d)
        import jax.numpy as jnp

        batch = jnp.stack([m.data, 2 * m.data])

        def loss(data):
            mm = type(m)(m.indptr, m.indices, data, m.shape, m.storage)
            return jnp.sum(st.spmv(mm, jnp.ones(2)) ** 2)

        gs = jax.vmap(jax.grad(loss))(batch)
        assert gs.shape == batch.shape


class TestBlockDiag:
    def test_matches_scipy(self):
        import scipy.sparse as sp

        from sprs_tpu.ops import block_diag

        rng = np.random.default_rng(12)
        blocks = [
            rng.standard_normal((2, 3)) * (rng.random((2, 3)) < 0.6),
            rng.standard_normal((4, 1)),
            rng.standard_normal((1, 2)),
        ]
        got = block_diag([st.from_dense(b) for b in blocks])
        ref = sp.block_diag([sp.csr_matrix(b) for b in blocks]).toarray()
        np.testing.assert_allclose(np.asarray(got.to_dense()), ref)
        got.check_structure()


class TestSpgemmBatchedSort:
    """compress_coo sort_batches: segment-batched ESC sort."""

    def _pair(self, seed=0, da=0.03, db=0.03):
        import scipy.sparse as sp

        import jax.numpy as jnp

        rng = np.random.default_rng(seed)
        A = sp.random(300, 250, density=da, random_state=rng, format="csr")
        B = sp.random(250, 280, density=db, random_state=rng, format="csr")
        mk = lambda M: st.CsMat(
            jnp.asarray(M.indptr.astype(np.int32)),
            jnp.asarray(M.indices.astype(np.int32)),
            jnp.asarray(M.data),
            M.shape,
            "csr",
        )
        return mk(A), mk(B), (A @ B).toarray()

    def test_matches_flat_sort(self):
        import sprs_tpu.ops.spgemm as _m
        from importlib import import_module

        sg = import_module("sprs_tpu.ops.spgemm")
        a, b, ref = self._pair()
        old = sg.SORT_BATCH_MIN
        sg.SORT_BATCH_MIN = 1
        try:
            for target in (128, 1000, 10**9):
                batches = sg.spgemm_sort_batches(a, b, target=target)
                c = sg.spgemm(a, b, sort_batches=batches)
                np.testing.assert_allclose(
                    np.asarray(c.to_dense()), ref, rtol=1e-10, atol=1e-12
                )
        finally:
            sg.SORT_BATCH_MIN = old

    def test_jit_static_batches(self):
        import functools
        from importlib import import_module

        sg = import_module("sprs_tpu.ops.spgemm")
        a, b, ref = self._pair(seed=3)
        old = sg.SORT_BATCH_MIN
        sg.SORT_BATCH_MIN = 1
        try:
            batches = sg.spgemm_sort_batches(a, b, target=700)
            exact = sg._exact_prod_count(a, b)
            out_cap = int((ref != 0).sum())
            f = jax.jit(
                functools.partial(
                    sg.spgemm,
                    prod_cap=exact,
                    out_cap=out_cap,
                    check_capacity=False,
                    sort_batches=batches,
                )
            )
            c = f(a, b)
            np.testing.assert_allclose(
                np.asarray(c.to_dense()), ref, rtol=1e-10, atol=1e-12
            )
        finally:
            sg.SORT_BATCH_MIN = old


class TestSpgemmDenseBsr:
    """Block-sparse dense-SpGEMM output: the compaction-free route
    (dense->CSR placement is scatter-unit bound at ~50M elem/s on TPU,
    BASELINE.md round 4; block extraction is reductions + one
    contiguous-slice gather)."""

    def test_matches_dense_oracle(self):
        from sprs_tpu.formats import bsr_spmm_xla
        from sprs_tpu.ops import spgemm_dense_bsr

        rng = np.random.default_rng(0)
        for (m, k, n), bs in (((300, 200, 260), 128), ((50, 60, 40), 16)):
            da = (
                rng.random((m, k)) * (rng.random((m, k)) < 0.05)
            ).astype(np.float32)
            db = (
                rng.random((k, n)) * (rng.random((k, n)) < 0.05)
            ).astype(np.float32)
            c = spgemm_dense_bsr(
                st.from_dense(da), st.from_dense(db), block_size=bs
            )
            ref = da @ db
            got = np.asarray(c.to_dense())[:m, :n]
            np.testing.assert_allclose(got, ref, atol=1e-5)
            # the product feeds the BSR SpMM kernels directly
            ncp = c.to_dense().shape[1]
            x = rng.random((ncp, 8)).astype(np.float32)
            y = np.asarray(bsr_spmm_xla(c, x))[:m]
            np.testing.assert_allclose(y, ref @ x[:n], atol=1e-3)

    def test_row_chunked_branch(self):
        import importlib

        from sprs_tpu.ops import spgemm_dense_bsr

        sg = importlib.import_module("sprs_tpu.ops.spgemm")
        rng = np.random.default_rng(1)
        old = sg.DENSE_BYTES_BUDGET
        try:
            sg.DENSE_BYTES_BUDGET = 1 << 19
            da = (
                rng.random((300, 64)) * (rng.random((300, 64)) < 0.2)
            ).astype(np.float32)
            db = (
                rng.random((64, 96)) * (rng.random((64, 96)) < 0.2)
            ).astype(np.float32)
            c = spgemm_dense_bsr(
                st.from_dense(da), st.from_dense(db), block_size=64
            )
            got = np.asarray(c.to_dense())[:300, :96]
            np.testing.assert_allclose(got, da @ db, atol=1e-5)
        finally:
            sg.DENSE_BYTES_BUDGET = old

    def test_oversize_b_raises_with_recipe(self):
        import importlib

        from sprs_tpu.errors import CapacityError
        from sprs_tpu.ops import spgemm_dense_bsr

        sg = importlib.import_module("sprs_tpu.ops.spgemm")
        rng = np.random.default_rng(2)
        old = sg.DENSE_BYTES_BUDGET
        try:
            sg.DENSE_BYTES_BUDGET = 1 << 19
            with pytest.raises(CapacityError, match="chunk"):
                spgemm_dense_bsr(
                    st.from_dense(np.eye(64, 512, dtype=np.float32)),
                    st.from_dense(
                        rng.random((512, 512)).astype(np.float32)
                    ),
                )
        finally:
            sg.DENSE_BYTES_BUDGET = old


class TestBsrProductionDispatch:
    """Round-5 verdict #2: BSR as the dense-SpGEMM production output —
    spgemm(out_format=...), matmul over BsrMat operands, and chained
    products that never touch per-element CSR compaction."""

    def _pair(self, seed=0, m=80, k=70, n=60, density=0.4):
        rng = np.random.default_rng(seed)
        da = (rng.random((m, k)) * (rng.random((m, k)) < density)).astype(
            np.float32
        )
        db = (rng.random((k, n)) * (rng.random((k, n)) < density)).astype(
            np.float32
        )
        return da, db

    def test_out_format_auto_dense_regime_returns_bsr(self):
        from sprs_tpu.formats import BsrMat

        da, db = self._pair(0)
        c = st.spgemm(
            st.from_dense(da),
            st.from_dense(db),
            method="auto",
            out_format="auto",
        )
        assert isinstance(c, BsrMat)
        np.testing.assert_allclose(
            np.asarray(c.to_dense()), da @ db, atol=1e-5
        )

    def test_out_format_bsr_on_esc_path_converts(self):
        from sprs_tpu.formats import BsrMat

        da, db = self._pair(1, density=0.02)  # ESC regime
        c = st.spgemm(
            st.from_dense(da), st.from_dense(db), out_format="bsr"
        )
        assert isinstance(c, BsrMat)
        np.testing.assert_allclose(
            np.asarray(c.to_dense()), da @ db, atol=1e-5
        )

    def test_out_format_default_stays_csmat(self):
        da, db = self._pair(2)
        c = st.spgemm(st.from_dense(da), st.from_dense(db), method="auto")
        assert isinstance(c, st.CsMat)

    def test_matmul_chain_stays_bsr(self):
        from sprs_tpu.formats import BsrMat

        da, db = self._pair(3)
        dc = (
            np.random.default_rng(4).random((60, 50))
            * (np.random.default_rng(5).random((60, 50)) < 0.4)
        ).astype(np.float32)
        ab = st.spgemm(
            st.from_dense(da),
            st.from_dense(db),
            method="dense",
            out_format="bsr",
        )
        assert isinstance(ab, BsrMat)
        # BsrMat @ CsMat and BsrMat @ dense both dispatch
        abc = ab @ st.from_dense(dc)
        assert isinstance(abc, BsrMat)
        np.testing.assert_allclose(
            np.asarray(abc.to_dense())[:80, :50], da @ db @ dc, atol=1e-4
        )
        y = ab @ np.ones(60, np.float32)
        np.testing.assert_allclose(
            np.asarray(y)[:80], (da @ db) @ np.ones(60), rtol=1e-4
        )
        # exit the chain: to_csmat matches
        np.testing.assert_allclose(
            np.asarray(ab.to_csmat().to_dense()), da @ db, atol=1e-5
        )

    def test_csmat_times_bsr(self):
        from sprs_tpu.formats import BsrMat, bsr_from_csmat

        da, db = self._pair(6)
        bb = bsr_from_csmat(st.from_dense(db), block_size=32)
        c = st.matmul(st.from_dense(da), bb)
        assert isinstance(c, BsrMat)
        np.testing.assert_allclose(
            np.asarray(c.to_dense())[:80, :60], da @ db, atol=1e-5
        )

    def test_slice_block_rows(self):
        from sprs_tpu.formats import bsr_from_csmat

        da, _ = self._pair(7)
        bm = bsr_from_csmat(st.from_dense(da), block_size=16)
        part = bm.slice_block_rows(16, 48)
        np.testing.assert_allclose(
            np.asarray(part.to_dense()), da[16:48], atol=0
        )


class TestSpgemmCaps:
    """Round-5 verdict #9: the host-side symbolic pass for traced
    callers (reference analog: SMMP's symbolic phase, smmp.rs:81-131)."""

    def test_exact_caps_against_eager(self):
        rng = np.random.default_rng(8)
        da = (rng.random((50, 40)) * (rng.random((50, 40)) < 0.1)).astype(
            np.float32
        )
        db = (rng.random((40, 30)) * (rng.random((40, 30)) < 0.1)).astype(
            np.float32
        )
        a, b = st.from_dense(da), st.from_dense(db)
        prod, out = st.spgemm_caps(a, b)
        c = st.spgemm(a, b)  # eager: exact packing
        assert out == int(c.nnz)
        # the caps drive an exact jitted product
        f = jax.jit(
            lambda aa, bb: st.spgemm(
                aa, bb, prod_cap=prod, out_cap=out, check_capacity=False
            )
        )
        cj = f(a, b)
        np.testing.assert_allclose(
            np.asarray(cj.to_dense()), da @ db, rtol=1e-6, atol=1e-7
        )

    def test_numpy_fallback_matches_native(self):
        import sprs_tpu.native as native

        if native.get_lib() is None:
            pytest.skip("native lib unavailable; fallback is the path")
        rng = np.random.default_rng(9)
        da = (rng.random((64, 64)) * (rng.random((64, 64)) < 0.15)).astype(
            np.float32
        )
        a = st.from_dense(da)
        ref = st.spgemm_caps(a, a)
        import unittest.mock as mock

        with mock.patch.object(native, "get_lib", lambda: None):
            got = st.spgemm_caps(a, a)
        assert got == ref

    def test_traced_caller_raises(self):
        a = st.from_dense(np.eye(4, dtype=np.float32))
        with pytest.raises(ValueError, match="symbolic"):
            jax.jit(lambda m: st.spgemm_caps(m, m))(a)
