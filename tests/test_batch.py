"""Same-pattern batch API: N matrices, one structure, one dispatch.

Oracle: the per-member eager op.  The batch contract (round-5 verdict
#4) is exactness — batching only adds a vmap axis, never changes the
math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sprs_tpu as st
from sprs_tpu.ops import batch_spgemm, batch_spmm, batch_spmv, BatchedLdl


def _pattern(seed=0, m=30, n=24, density=0.2):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((m, n)) * (rng.random((m, n)) < density)
    return st.from_dense(d)


def _batch_data(mat, N, seed=1):
    rng = np.random.default_rng(seed)
    base = np.asarray(mat.data)
    scale = rng.random((N, 1)) + 0.5
    noise = rng.standard_normal((N, base.shape[0]))
    live = np.asarray(mat.live_mask())
    return jnp.asarray((base[None] * scale + 0.1 * noise) * live)


class TestBatchProducts:
    def test_batch_spmv_matches_loop(self):
        mat = _pattern(0)
        N = 5
        data = _batch_data(mat, N)
        x = np.random.default_rng(2).standard_normal((N, 24))
        y = np.asarray(batch_spmv(mat, data, x))
        for i in range(N):
            ref = np.asarray(st.spmv(mat.with_data(data[i]), x[i]))
            np.testing.assert_allclose(y[i], ref, rtol=1e-6)

    def test_batch_spmv_broadcasts(self):
        mat = _pattern(3)
        data = _batch_data(mat, 4)
        x = np.random.default_rng(4).standard_normal(24)
        y = np.asarray(batch_spmv(mat, data, x))  # one x, many matrices
        assert y.shape == (4, 30)
        y2 = np.asarray(
            batch_spmv(
                mat,
                mat.data,
                np.random.default_rng(5).standard_normal((3, 24)),
            )
        )  # one matrix, many x
        assert y2.shape == (3, 30)

    def test_batch_spmm(self):
        mat = _pattern(6)
        N = 3
        data = _batch_data(mat, N)
        x = np.random.default_rng(7).standard_normal((N, 24, 4))
        y = np.asarray(batch_spmm(mat, data, x))
        for i in range(N):
            ref = np.asarray(st.spmm(mat.with_data(data[i]), x[i]))
            np.testing.assert_allclose(y[i], ref, rtol=1e-6)

    def test_batch_spmv_jits_with_mat_argument(self):
        mat = _pattern(8)
        data = _batch_data(mat, 4)
        x = np.random.default_rng(9).standard_normal((4, 24))
        f = jax.jit(batch_spmv)
        y = np.asarray(f(mat, data, jnp.asarray(x)))
        np.testing.assert_allclose(
            y[2],
            np.asarray(st.spmv(mat.with_data(data[2]), x[2])),
            rtol=1e-6,
        )


class TestBatchSpgemm:
    def test_shared_structure_and_values(self):
        a = _pattern(10, 20, 16, 0.25)
        b = _pattern(11, 16, 18, 0.25)
        N = 4
        ad = _batch_data(a, N, seed=12)
        bd = _batch_data(b, N, seed=13)
        c = batch_spgemm(a, b, ad, bd)
        assert c.n_batch == N
        for i in range(N):
            ref = st.spgemm(a.with_data(ad[i]), b.with_data(bd[i]))
            np.testing.assert_allclose(
                np.asarray(c.member(i).to_dense()),
                np.asarray(ref.to_dense()),
                rtol=1e-6,
                atol=1e-9,
            )

    def test_under_jit_with_explicit_caps(self):
        a = _pattern(14, 12, 12, 0.3)
        prod, out = st.spgemm_caps(a, a)
        ad = _batch_data(a, 3, seed=15)

        f = jax.jit(
            lambda m, d1, d2: batch_spgemm(
                m, m, d1, d2, prod_cap=prod, out_cap=out
            )
        )
        c = f(a, ad, ad)
        ref = st.spgemm(a.with_data(ad[1]), a.with_data(ad[1]))
        np.testing.assert_allclose(
            np.asarray(c.member(1).to_dense()),
            np.asarray(ref.to_dense()),
            rtol=1e-6,
            atol=1e-9,
        )


class TestBatchedLdl:
    def test_factor_solve_matches_host_loop(self):
        from sprs_tpu.linalg import Ldl
        from sprs_tpu.utils.special import dirichlet_laplacian

        mat = dirichlet_laplacian((6, 8))  # n=48 SPD
        n = mat.shape[0]
        sym = Ldl().fill_in_reduction("camd").check_symmetry(False).symbolic(
            mat
        )
        bl = BatchedLdl(sym)
        a = mat.to_csr()
        N = 4
        rng = np.random.default_rng(20)
        scales = rng.random(N) + 0.5
        data = jnp.asarray(
            np.asarray(a.data)[None] * scales[:, None]
        )
        lx, d = bl.factor(data)
        assert lx.shape[0] == N and d.shape == (N, n)
        rhs = rng.standard_normal((N, n))
        # the raw panel solve lives in PERMUTED space: feed P b, read P x
        b_perm = rhs
        if sym.perm is not None:
            b_perm = rhs[:, np.asarray(sym.perm.perm)]
        x = np.asarray(bl.solve(lx, d, b_perm))
        dense = np.asarray(mat.to_dense())
        for i in range(N):
            xi = x[i]
            if sym.perm is not None:
                xi = xi[np.asarray(sym.perm.inv)]
            ref = np.linalg.solve(scales[i] * dense, rhs[i])
            np.testing.assert_allclose(xi, ref, rtol=1e-4, atol=1e-6)

    @pytest.mark.parametrize("kind", ["super", "mf"])
    def test_factor_matches_host_exactly(self, kind):
        from sprs_tpu.linalg import Ldl
        from sprs_tpu.utils.special import dirichlet_laplacian

        mat = dirichlet_laplacian((5, 7))
        sym = Ldl().fill_in_reduction("rcm").check_symmetry(False).symbolic(
            mat
        )
        bl = BatchedLdl(sym, kind=kind)
        a = mat.to_csr()
        data = jnp.stack([a.data, 3.0 * a.data])
        lx, d = bl.factor(data)
        for i, s in enumerate((1.0, 3.0)):
            host = sym.factor(
                st.CsMat(a.indptr, a.indices, s * a.data, a.shape, a.storage),
                backend="host",
            )
            np.testing.assert_allclose(
                np.asarray(lx[i]),
                np.asarray(host.l_data),
                rtol=1e-8,
                atol=1e-8 * float(np.abs(np.asarray(host.l_data)).max()),
            )
            np.testing.assert_allclose(
                np.asarray(d[i]), np.asarray(host.d), rtol=1e-8
            )
