"""Flat blocked level solve: parity with the padded level kernel and
dense oracles across triangle shapes, block sizes, and depth skew
(chains force one block per level; wide rows span multiple blocks)."""

import numpy as np
import pytest

import sprs_tpu as st
from sprs_tpu.linalg import Ldl, build_flat_schedule, lsolve, usolve
from sprs_tpu.utils.special import dirichlet_laplacian


def _rand_lower(n, density, seed, *, chain=False):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, n)) * (rng.random((n, n)) < density)
    a = np.tril(a, -1)
    if chain:  # force a length-n dependency chain (worst-case depth)
        for i in range(1, n):
            a[i, i - 1] = 1.0 + 0.1 * i
    np.fill_diagonal(a, np.arange(1, n + 1, dtype=float))
    return a


class TestFlatTrisolve:
    @pytest.mark.parametrize("blk", [4, 64, 100000])
    @pytest.mark.parametrize("chain", [False, True])
    def test_lower_parity(self, blk, chain):
        d = _rand_lower(60, 0.15, 1, chain=chain)
        mat = st.from_dense(d)
        b = np.linspace(1.0, 2.0, 60)
        sched = build_flat_schedule(mat, lower=True, block_entries=blk)
        x = np.asarray(lsolve(mat, b, method="flat", schedule=sched))
        np.testing.assert_allclose(x, np.linalg.solve(d, b), rtol=1e-10)

    @pytest.mark.parametrize("blk", [8, 1024])
    def test_upper_parity(self, blk):
        d = _rand_lower(50, 0.2, 2).T
        mat = st.from_dense(d)
        b = np.linspace(-1.0, 1.0, 50)
        sched = build_flat_schedule(mat, lower=False, block_entries=blk)
        x = np.asarray(usolve(mat, b, method="flat", schedule=sched))
        np.testing.assert_allclose(x, np.linalg.solve(d, b), rtol=1e-10)

    def test_wide_row_spans_blocks(self):
        # one dense row far wider than the block size: partial sums
        # must accumulate across blocks before the row finalizes
        n = 40
        d = np.eye(n)
        d[n - 1, : n - 1] = np.linspace(1, 2, n - 1)
        d[n - 1, n - 1] = 3.0
        mat = st.from_dense(d)
        b = np.arange(1.0, n + 1)
        sched = build_flat_schedule(mat, lower=True, block_entries=4)
        assert sched.nblocks > (n - 1) // 4  # the row really spans
        x = np.asarray(lsolve(mat, b, method="flat", schedule=sched))
        np.testing.assert_allclose(x, np.linalg.solve(d, b), rtol=1e-12)

    def test_matches_levels_method_on_ldl_factor(self):
        mat = dirichlet_laplacian((9, 11))
        num = Ldl().fill_in_reduction("camd").check_symmetry(False).numeric(
            mat, backend="host"
        )
        L = num.l_csr()
        b = np.linspace(1.0, 2.0, L.shape[0])
        x_lvl = np.asarray(lsolve(L, b, method="levels"))
        x_flat = np.asarray(lsolve(L, b, method="flat"))
        np.testing.assert_allclose(x_flat, x_lvl, rtol=1e-12)

    def test_auto_switches_to_flat_when_padded_explodes(self):
        # construct a pattern whose (n × max_row_nnz) crosses the
        # heuristic: n=5000 with one 4000-wide row
        import scipy.sparse as sp

        n = 5000
        rows = [np.array([i]) for i in range(n)]
        cols = [np.array([i]) for i in range(n)]
        vals = [np.array([2.0])] * n
        wide = np.arange(4000)
        rows.append(np.full(4000, n - 1))
        cols.append(wide)
        vals.append(np.full(4000, 1e-4))
        m = sp.coo_matrix(
            (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
            shape=(n, n),
        ).tocsr()
        mat = st.from_scipy(m)
        b = np.ones(n)
        x = np.asarray(lsolve(mat, b))  # auto → flat, must not OOM
        dense_x = np.ones(n) / 2.0
        dense_x[n - 1] = (1.0 - 1e-4 * dense_x[:4000].sum()) / 2.0
        np.testing.assert_allclose(x, dense_x, rtol=1e-10)

    def test_jit_reusable_across_values(self):
        import jax

        d = _rand_lower(30, 0.3, 5)
        mat = st.from_dense(d)
        sched = build_flat_schedule(mat, lower=True, block_entries=16)
        b = np.ones(30)

        fn = jax.jit(
            lambda m, v: lsolve(m, v, method="flat", schedule=sched)
        )
        x1 = np.asarray(fn(mat, b))
        mat2 = st.CsMat(
            mat.indptr, mat.indices, mat.data * 2.0, mat.shape, mat.storage
        )
        x2 = np.asarray(fn(mat2, b))
        np.testing.assert_allclose(x1, np.linalg.solve(d, b), rtol=1e-10)
        np.testing.assert_allclose(x2, np.linalg.solve(2 * d, b), rtol=1e-10)
