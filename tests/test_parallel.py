"""Distributed kernels on the virtual 8-device CPU mesh.

The analog of the reference's fixed-thread-count determinism tests
(smmp.rs:491-513): same results regardless of shard count.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import sprs_tpu as st
from sprs_tpu.parallel import (
    dist_spgemm,
    dist_spmv,
    dist_spmv_2d,
    dist_spmv_halo,
    shard_csr_2d,
    shard_csr_rows,
    shard_csr_rows_halo,
)

RNG = np.random.default_rng(11)


def mesh_1d(n):
    return Mesh(np.array(jax.devices()[:n]), axis_names=("shards",))


def random_sparse(r, c, density=0.2, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((r, c))
    d[rng.random((r, c)) > density] = 0.0
    return d


class TestDistSpmv:
    @pytest.mark.parametrize("n_shards", [1, 2, 4, 8])
    def test_replicated_x(self, n_shards):
        d = random_sparse(37, 23, seed=1)
        m = st.from_dense(d)
        dm = shard_csr_rows(m, n_shards)
        x = RNG.standard_normal(23)
        y = np.asarray(dm.assemble(dist_spmv(dm, x, mesh_1d(n_shards))))
        np.testing.assert_allclose(y, d @ x, rtol=1e-10)

    @pytest.mark.parametrize("balance", ["rows", "nnz"])
    def test_sharded_x(self, balance):
        d = random_sparse(40, 40, seed=2)
        m = st.from_dense(d)
        dm = shard_csr_rows(m, 4, balance=balance)
        x = RNG.standard_normal(40)
        y = np.asarray(
            dm.assemble(dist_spmv(dm, x, mesh_1d(4), x_sharded=True))
        )
        np.testing.assert_allclose(y, d @ x, rtol=1e-10)

    def test_roundtrip(self):
        d = random_sparse(19, 31, seed=3)
        dm = shard_csr_rows(st.from_dense(d), 4, balance="nnz")
        np.testing.assert_allclose(
            np.asarray(dm.to_csmat().to_dense()), d
        )


class TestDistSpgemm:
    @pytest.mark.parametrize("n_shards", [2, 4])
    def test_matches_dense(self, n_shards):
        da = random_sparse(24, 18, seed=4)
        db = random_sparse(18, 20, seed=5)
        dm = shard_csr_rows(st.from_dense(da), n_shards)
        c = dist_spgemm(dm, st.from_dense(db), mesh_1d(n_shards))
        np.testing.assert_allclose(
            np.asarray(c.to_csmat().to_dense()), da @ db, rtol=1e-10
        )


class TestDistSpgemmBshard:
    @pytest.mark.parametrize("n_shards", [2, 4])
    def test_both_sharded(self, n_shards):
        from sprs_tpu.parallel import dist_spgemm_bshard

        da = random_sparse(24, 18, seed=8)
        db = random_sparse(18, 20, seed=9)
        A = shard_csr_rows(st.from_dense(da), n_shards)
        B = shard_csr_rows(st.from_dense(db), n_shards)
        c = dist_spgemm_bshard(A, B, mesh_1d(n_shards))
        np.testing.assert_allclose(
            np.asarray(c.to_csmat().to_dense()), da @ db, rtol=1e-10
        )

    def test_nnz_balanced_b_rejected(self):
        from sprs_tpu.parallel import dist_spgemm_bshard

        da = random_sparse(16, 16, seed=10)
        # craft a B where nnz-balance differs from rows-balance
        db = np.zeros((16, 16))
        db[:2] = random_sparse(2, 16, density=0.9, seed=11)
        db[2:] = random_sparse(14, 16, density=0.05, seed=12)
        A = shard_csr_rows(st.from_dense(da), 4)
        B = shard_csr_rows(st.from_dense(db), 4, balance="nnz")
        ids = np.asarray(B.row_ids)
        expect = np.arange(B.n_shards * B.rows_per_shard).reshape(
            B.n_shards, -1
        )
        if np.array_equal(
            ids[ids < 16], expect[ids < 16]
        ):  # balance happened to coincide; nothing to assert
            pytest.skip("nnz balance coincided with rows balance")
        with pytest.raises(st.ShapeError):
            dist_spgemm_bshard(A, B, mesh_1d(4))


class TestDistSpgemmBgather:
    @pytest.mark.parametrize("n_shards", [2, 4])
    def test_both_sharded(self, n_shards):
        from sprs_tpu.parallel import dist_spgemm_bgather

        da = random_sparse(24, 18, seed=8)
        db = random_sparse(18, 20, seed=9)
        A = shard_csr_rows(st.from_dense(da), n_shards)
        B = shard_csr_rows(st.from_dense(db), n_shards)
        c = dist_spgemm_bgather(A, B, mesh_1d(n_shards))
        np.testing.assert_allclose(
            np.asarray(c.to_csmat().to_dense()), da @ db, rtol=1e-10
        )

    def test_banded_fetches_fewer_blocks(self):
        """The whole point: a banded A references O(1) B blocks per
        device, so the plan moves less than an all-gather would."""
        from sprs_tpu.parallel import (
            dist_spgemm_bgather,
            plan_b_gather,
        )

        n = 64
        d = np.zeros((n, n))
        for off in (-1, 0, 1):
            idx = np.arange(max(0, -off), min(n, n - off))
            d[idx, idx + off] = RNG.standard_normal(idx.size) + 2.0
        A = shard_csr_rows(st.from_dense(d), 8)
        B = shard_csr_rows(st.from_dense(d), 8)
        plan = plan_b_gather(A, B)
        assert plan.comm_blocks <= 2  # neighbor blocks only
        assert plan.full_blocks == 7  # all-gather moves S-1 remote
        assert plan.comm_fraction < 0.5
        c = dist_spgemm_bgather(A, B, mesh_1d(8), plan=plan)
        np.testing.assert_allclose(
            np.asarray(c.to_csmat().to_dense()), d @ d, rtol=1e-10
        )

    def test_empty_shard(self):
        """A shard with no entries references zero blocks; the padded
        self-fetch keeps the SPMD schedule uniform."""
        from sprs_tpu.parallel import dist_spgemm_bgather

        d = np.zeros((16, 16))
        d[:4] = random_sparse(4, 16, seed=13)  # shards 1-3 empty
        A = shard_csr_rows(st.from_dense(d), 4)
        B = shard_csr_rows(
            st.from_dense(random_sparse(16, 12, seed=14)), 4
        )
        c = dist_spgemm_bgather(A, B, mesh_1d(4))
        np.testing.assert_allclose(
            np.asarray(c.to_csmat().to_dense()),
            d @ np.asarray(B.to_csmat().to_dense()),
            rtol=1e-10,
        )


class TestDist2D:
    @pytest.mark.parametrize("grid", [(2, 2), (2, 4), (4, 2)])
    def test_matches_dense(self, grid):
        R, C = grid
        d = random_sparse(26, 34, seed=6)
        dm, cp = shard_csr_2d(st.from_dense(d), grid)
        x = RNG.standard_normal(34)
        mesh = Mesh(
            np.array(jax.devices()[: R * C]).reshape(R, C),
            axis_names=("r", "c"),
        )
        y = np.asarray(dist_spmv_2d(dm, cp, x, mesh))[:26]
        np.testing.assert_allclose(y, d @ x, rtol=1e-10)


class TestHalo:
    @pytest.mark.parametrize("n_shards", [2, 4, 8])
    def test_laplacian(self, n_shards):
        lap = st.utils.grid_laplacian((8, 8), dtype=np.float64)
        d = np.asarray(lap.to_dense())
        dm = shard_csr_rows_halo(lap, n_shards)
        # one grid row of reach (boundary rows are identity rows, so the
        # max reach can be ny-1 instead of ny depending on shard cuts)
        assert 0 < dm.halo <= 8
        x = RNG.standard_normal(64)
        y = np.asarray(dist_spmv_halo(dm, x, mesh_1d(n_shards)))[:64]
        np.testing.assert_allclose(y, d @ x, rtol=1e-10)

    def test_tridiagonal(self):
        n = 24
        d = (
            np.diag(np.full(n, 2.0))
            + np.diag(np.full(n - 1, -1.0), 1)
            + np.diag(np.full(n - 1, -1.0), -1)
        )
        dm = shard_csr_rows_halo(st.from_dense(d), 4)
        assert dm.halo == 1
        x = RNG.standard_normal(n)
        y = np.asarray(dist_spmv_halo(dm, x, mesh_1d(4)))[:n]
        np.testing.assert_allclose(y, d @ x, rtol=1e-10)

    def test_diagonal_zero_halo(self):
        d = np.diag(np.arange(1.0, 17.0))
        dm = shard_csr_rows_halo(st.from_dense(d), 4)
        assert dm.halo == 0
        x = RNG.standard_normal(16)
        y = np.asarray(dist_spmv_halo(dm, x, mesh_1d(4)))[:16]
        np.testing.assert_allclose(y, d @ x, rtol=1e-10)

    def test_wide_band_rejected(self):
        d = random_sparse(16, 16, density=0.9, seed=7)
        with pytest.raises(st.ShapeError):
            shard_csr_rows_halo(st.from_dense(d), 8)

    def test_non_square_rejected(self):
        with pytest.raises(st.ShapeError):
            shard_csr_rows_halo(st.from_dense(np.ones((4, 6))), 2)

    @pytest.mark.parametrize("n_shards", [2, 4, 8])
    def test_overlap_split(self, n_shards):
        from sprs_tpu.parallel import (
            dist_spmv_halo_overlap,
            shard_csr_rows_halo_split,
        )

        lap = st.utils.grid_laplacian((8, 8), dtype=np.float64)
        d = np.asarray(lap.to_dense())
        dm = shard_csr_rows_halo_split(lap, n_shards)
        x = RNG.standard_normal(64)
        y = np.asarray(
            dist_spmv_halo_overlap(dm, x, mesh_1d(n_shards))
        )[:64]
        np.testing.assert_allclose(y, d @ x, rtol=1e-10)

    def test_overlap_split_diag(self):
        from sprs_tpu.parallel import (
            dist_spmv_halo_overlap,
            shard_csr_rows_halo_split,
        )

        d = np.diag(np.arange(1.0, 17.0))
        dm = shard_csr_rows_halo_split(st.from_dense(d), 4)
        assert dm.halo == 0
        x = RNG.standard_normal(16)
        y = np.asarray(dist_spmv_halo_overlap(dm, x, mesh_1d(4)))[:16]
        np.testing.assert_allclose(y, d @ x, rtol=1e-10)

    def test_matches_allgather_path(self):
        lap = st.utils.grid_laplacian((6, 6), dtype=np.float64)
        x = RNG.standard_normal(36)
        m = mesh_1d(4)
        y_halo = np.asarray(
            dist_spmv_halo(shard_csr_rows_halo(lap, 4), x, m)
        )[:36]
        y_ag = np.asarray(
            dist_spmv(shard_csr_rows(lap, 4), x, m, x_sharded=True)
        )[:36]
        np.testing.assert_allclose(y_halo, y_ag, rtol=1e-12)


class TestDistributedSolvers:
    """Krylov solvers over distributed SpMV (+ preconditioning)."""

    @pytest.mark.parametrize("n_shards", [2, 4])
    def test_distributed_pcg_jacobi(self, n_shards):
        from sprs_tpu.linalg import cg
        from sprs_tpu.utils.special import dirichlet_laplacian

        lap = dirichlet_laplacian((6, n_shards * 2), dtype=np.float64)
        dense = np.asarray(lap.to_dense())
        n = lap.shape[0]
        mesh = mesh_1d(n_shards)
        dmat = shard_csr_rows(lap, n_shards, balance="nnz")
        matvec = jax.jit(lambda v: dmat.assemble(dist_spmv(dmat, v, mesh)))
        b = (dense @ np.ones(n)).astype(np.float64)
        diag = np.asarray(lap.diag())
        precond = lambda r: r / diag  # Jacobi: elementwise, shardable

        plain = cg(matvec, b, tol=1e-10, max_iter=500)
        pre = cg(matvec, b, tol=1e-10, max_iter=500, precond=precond)
        assert plain.converged and pre.converged
        np.testing.assert_allclose(np.asarray(pre.x), np.ones(n), atol=1e-7)
        # same result regardless of shard count is the determinism bar
        np.testing.assert_allclose(
            np.asarray(plain.x), np.asarray(pre.x), atol=1e-7
        )


class TestDistSpmm:
    @pytest.mark.parametrize("n_shards", [2, 4, 8])
    def test_replicated_x(self, n_shards):
        from sprs_tpu.parallel import dist_spmm

        d = random_sparse(37, 23, seed=21)
        m = st.from_dense(d)
        dmat = shard_csr_rows(m, n_shards)
        x = RNG.standard_normal((23, 6))
        y = np.asarray(
            dmat.assemble(dist_spmm(dmat, x, mesh_1d(n_shards)))
        )
        np.testing.assert_allclose(y, d @ x, rtol=1e-10)

    def test_sharded_x(self):
        from sprs_tpu.parallel import dist_spmm

        d = random_sparse(24, 24, seed=22)
        m = st.from_dense(d)
        dmat = shard_csr_rows(m, 4)
        x = RNG.standard_normal((24, 3))
        y = np.asarray(
            dmat.assemble(
                dist_spmm(dmat, x, mesh_1d(4), x_sharded=True)
            )
        )
        np.testing.assert_allclose(y, d @ x, rtol=1e-10)


class TestBlockJacobiLdl:
    def test_block_solve_matches_dense_inverse(self):
        from sprs_tpu.parallel import block_jacobi_ldl
        from sprs_tpu.utils.special import dirichlet_laplacian

        mat = dirichlet_laplacian((12, 16))  # n=192
        dense = np.asarray(mat.to_dense())
        n = mat.shape[0]
        S = 8
        M = block_jacobi_ldl(mat, S)
        r = np.linspace(1.0, 2.0, n)
        x = np.asarray(M.precond(r))
        m = n // S
        for s in range(S):
            blk = dense[s * m : (s + 1) * m, s * m : (s + 1) * m]
            np.testing.assert_allclose(
                x[s * m : (s + 1) * m],
                np.linalg.solve(blk, r[s * m : (s + 1) * m]),
                rtol=1e-5,
                atol=1e-6,
            )

    def test_accelerates_cg(self):
        from sprs_tpu.linalg import cg
        from sprs_tpu.parallel import block_jacobi_ldl
        from sprs_tpu.utils.special import dirichlet_laplacian

        mat = dirichlet_laplacian((16, 16))
        M = block_jacobi_ldl(mat, 8)
        b = np.ones(mat.shape[0])
        plain = cg(mat, b, tol=1e-8, max_iter=1000)
        pre = cg(mat, b, precond=M.precond, tol=1e-8, max_iter=1000)
        assert bool(pre.converged)
        assert int(pre.iterations) < int(plain.iterations)

    def test_shard_map_application(self):
        from functools import partial

        from jax.experimental.shard_map import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        from sprs_tpu.linalg.ldl_super import solve_supernodal
        from sprs_tpu.parallel import block_jacobi_ldl
        from sprs_tpu.utils.special import dirichlet_laplacian

        mat = dirichlet_laplacian((12, 16))
        n = mat.shape[0]
        S = 8
        M = block_jacobi_ldl(mat, S)
        mesh = Mesh(np.array(jax.devices()[:S]), ("i",))

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P("i"), P("i"), P("i")),
            out_specs=P("i"),
        )
        def apply_local(panels, d, rs):
            v = rs[0]
            if M.perm is not None:
                v = v[jnp.asarray(M.perm)]
            x = solve_supernodal(M.plan, panels[0], d[0], v)
            if M.inv is not None:
                x = x[jnp.asarray(M.inv)]
            return x[None]

        r = np.linspace(1.0, 2.0, n)
        rs = jnp.asarray(r.reshape(S, n // S))
        x_sm = np.asarray(
            jax.jit(apply_local)(M.panels, M.d, rs)
        ).reshape(-1)
        np.testing.assert_allclose(
            x_sm, np.asarray(M.precond(r)), rtol=1e-5, atol=1e-6
        )

    def test_dist_cg_front_door(self):
        from sprs_tpu.parallel import dist_cg, shard_csr_rows
        from sprs_tpu.utils.special import dirichlet_laplacian

        spd = dirichlet_laplacian((8, 16))
        dense = np.asarray(spd.to_dense())
        n = spd.shape[0]
        dmat = shard_csr_rows(spd, 8)
        b = (dense @ np.ones(n)).astype(np.float64)
        for pc in (None, "jacobi", "block_ldl"):
            res = dist_cg(
                dmat, b, mesh_1d(8), precond=pc, tol=1e-9, max_iter=500
            )
            np.testing.assert_allclose(
                np.asarray(res.x), np.ones(n), atol=1e-5
            )


class TestPrepareDistSpmv:
    """Round-5 verdict #6: prepare-time routing — banded partitions take
    the O(halo) ppermute path, scattered columns fall back to
    all-gather (byte model: halo ~0.999 vs all-gather ~0.63 weak
    scaling at 8 devices, results_scaling_virtual8.jsonl)."""

    def test_laplacian_routes_to_halo(self):
        from sprs_tpu.parallel import prepare_dist_spmv
        from sprs_tpu.utils.special import dirichlet_laplacian

        mat = dirichlet_laplacian((16, 8))  # n=128, bandwidth 8
        prep = prepare_dist_spmv(mat, 4)
        assert prep.kind == "halo"
        x = RNG.standard_normal(128)
        y = np.asarray(prep(x, mesh_1d(4))).reshape(-1)[:128]
        np.testing.assert_allclose(
            y, np.asarray(mat.to_dense()) @ x, rtol=1e-8
        )

    def test_scattered_routes_to_allgather(self):
        from sprs_tpu.parallel import prepare_dist_spmv

        d = random_sparse(64, 64, density=0.3, seed=21)
        d[0, 63] = 1.0  # full-reach entry kills any halo bound
        prep = prepare_dist_spmv(st.from_dense(d), 4)
        assert prep.kind == "allgather"
        x = RNG.standard_normal(64)
        y = np.asarray(prep.dmat.assemble(prep(x, mesh_1d(4))))
        np.testing.assert_allclose(y, d @ x, rtol=1e-8)

    def test_rectangular_routes_to_allgather(self):
        from sprs_tpu.parallel import prepare_dist_spmv

        d = random_sparse(40, 24, density=0.2, seed=22)
        prep = prepare_dist_spmv(st.from_dense(d), 4)
        assert prep.kind == "allgather"

    def test_prepared_rides_through_jit(self):
        import jax

        from sprs_tpu.parallel import prepare_dist_spmv
        from sprs_tpu.utils.special import dirichlet_laplacian

        mat = dirichlet_laplacian((16, 8))
        prep = prepare_dist_spmv(mat, 4)
        mesh = mesh_1d(4)
        f = jax.jit(lambda p, v: p(v, mesh))
        x = RNG.standard_normal(128)
        y = np.asarray(f(prep, x)).reshape(-1)[:128]
        np.testing.assert_allclose(
            y, np.asarray(mat.to_dense()) @ x, rtol=1e-8
        )
