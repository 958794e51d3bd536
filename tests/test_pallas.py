"""ELL/BSR formats and the Pallas kernels (interpreter mode on CPU).

Dense-oracle discipline per SURVEY §4: every sparse result is compared
against the dense computation of the same expression.  The Pallas kernels
run with ``interpret=True`` here (compiled TPU execution is covered by
bench.py on hardware); the XLA twins run compiled.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sprs_tpu as st
from sprs_tpu.formats.bsr import bsr_from_dense, bsr_spmm_xla
from sprs_tpu.formats.ell import (
    ell_from_csmat,
    ell_overhead,
    ell_spmm,
    ell_spmv,
    ell_to_csmat,
)
from sprs_tpu.formats.dia import dia_from_csmat, dia_spmm, dia_spmv, n_diags_of
from sprs_tpu.ops.pallas import (
    bsr_spmm_pallas,
    bsr_spmv_pallas,
    dia_spmv_pallas,
    ell_spmv_pallas,
)

RNG = np.random.default_rng(42)


def random_sparse(r, c, density=0.2, seed=0):
    rng = np.random.default_rng(seed)
    dense = rng.standard_normal((r, c))
    dense[rng.random((r, c)) > density] = 0.0
    return dense.astype(np.float32)


# ---------------------------------------------------------------------------
# ELL format
# ---------------------------------------------------------------------------


class TestEll:
    def test_roundtrip_dense(self):
        d = random_sparse(13, 9, 0.3, seed=1)
        ell = st.from_dense(d).to_ell()
        np.testing.assert_allclose(np.asarray(ell.to_dense()), d)

    def test_roundtrip_csmat(self):
        d = random_sparse(10, 17, 0.25, seed=2)
        m = st.from_dense(d)
        back = ell_to_csmat(ell_from_csmat(m))
        back.check_structure()
        np.testing.assert_allclose(np.asarray(back.to_dense()), d)

    def test_empty_rows(self):
        d = np.zeros((6, 4), np.float32)
        d[2, 1] = 3.0
        ell = st.from_dense(d).to_ell()
        np.testing.assert_allclose(np.asarray(ell.to_dense()), d)

    def test_spmv_oracle(self):
        d = random_sparse(33, 21, 0.3, seed=3)
        ell = st.from_dense(d).to_ell()
        x = RNG.standard_normal(21).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(ell_spmv(ell, x)), d @ x, rtol=1e-5
        )

    def test_spmv_jit(self):
        d = random_sparse(16, 16, 0.3, seed=4)
        ell = st.from_dense(d).to_ell()
        x = RNG.standard_normal(16).astype(np.float32)
        y = jax.jit(ell_spmv)(ell, x)
        np.testing.assert_allclose(np.asarray(y), d @ x, rtol=1e-5)

    def test_spmm_oracle(self):
        d = random_sparse(12, 20, 0.25, seed=5)
        ell = st.from_dense(d).to_ell()
        x = RNG.standard_normal((20, 7)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(ell_spmm(ell, x)), d @ x, rtol=1e-5
        )

    def test_spmv_grad(self):
        d = random_sparse(8, 8, 0.4, seed=6)
        ell = st.from_dense(d).to_ell()
        x = RNG.standard_normal(8).astype(np.float32)
        g = jax.grad(lambda x: jnp.sum(ell_spmv(ell, x) ** 2))(x)
        expected = 2 * d.T @ (d @ x)
        np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-4)

    def test_overhead_metric(self):
        m = st.from_dense(np.eye(8, dtype=np.float32))
        assert ell_overhead(m) == pytest.approx(0.0)


# ---------------------------------------------------------------------------
# Pallas ELL SpMV (interpret mode)
# ---------------------------------------------------------------------------


class TestEllPallas:
    def test_matches_dense(self):
        d = random_sparse(64, 48, 0.2, seed=7)
        ell = st.from_dense(d).to_ell()
        x = RNG.standard_normal(48).astype(np.float32)
        y = ell_spmv_pallas(ell, x, interpret=True)
        np.testing.assert_allclose(np.asarray(y), d @ x, rtol=1e-5)

    def test_rows_not_multiple_of_block(self):
        d = random_sparse(37, 11, 0.3, seed=8)
        ell = st.from_dense(d).to_ell()
        x = RNG.standard_normal(11).astype(np.float32)
        y = ell_spmv_pallas(ell, x, interpret=True)
        np.testing.assert_allclose(np.asarray(y), d @ x, rtol=1e-5)

    def test_custom_vjp(self):
        d = random_sparse(24, 16, 0.3, seed=9)
        ell = st.from_dense(d).to_ell()
        x = RNG.standard_normal(16).astype(np.float32)

        def loss(data, x):
            e = type(ell)(ell.indices, data, ell.shape)
            return jnp.sum(ell_spmv_pallas(e, x, interpret=True) ** 2)

        gd, gx = jax.grad(loss, argnums=(0, 1))(ell.data, x)
        # oracle via the differentiable XLA path
        def loss_x(data, x):
            e = type(ell)(ell.indices, data, ell.shape)
            return jnp.sum(ell_spmv(e, x) ** 2)

        gd0, gx0 = jax.grad(loss_x, argnums=(0, 1))(ell.data, x)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx0), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gd), np.asarray(gd0), rtol=1e-4)


# ---------------------------------------------------------------------------
# BSR format + kernels
# ---------------------------------------------------------------------------


def random_block_dense(rbr, rbc, bs, block_density, seed):
    rng = np.random.default_rng(seed)
    keep = rng.random((rbr, rbc)) < block_density
    dense = np.zeros((rbr * bs, rbc * bs), np.float32)
    for i, j in zip(*np.nonzero(keep)):
        dense[i * bs : (i + 1) * bs, j * bs : (j + 1) * bs] = (
            rng.standard_normal((bs, bs))
        )
    return dense


class TestBsr:
    def test_roundtrip(self):
        d = random_block_dense(3, 4, 8, 0.5, seed=10)
        b = bsr_from_dense(d, 8)
        np.testing.assert_allclose(np.asarray(b.to_dense()), d)

    def test_unaligned_shape(self):
        d = random_block_dense(3, 3, 8, 0.6, seed=11)[:20, :19]
        b = bsr_from_dense(d, 8)
        assert b.shape == (20, 19)
        np.testing.assert_allclose(np.asarray(b.to_dense()), d)

    def test_empty_rows_get_zero_block(self):
        d = np.zeros((16, 16), np.float32)
        d[0, 0] = 1.0  # only block row 0 nonzero
        b = bsr_from_dense(d, 8)
        assert b.n_blocks == 2  # one real + one explicit zero block
        np.testing.assert_allclose(np.asarray(b.to_dense()), d)

    def test_spmm_xla_oracle(self):
        d = random_block_dense(4, 3, 8, 0.5, seed=12)
        b = bsr_from_dense(d, 8)
        x = RNG.standard_normal((24, 5)).astype(np.float32)
        y = jax.jit(bsr_spmm_xla)(b, x)
        np.testing.assert_allclose(np.asarray(y), d @ x, rtol=1e-4)

    def test_spmm_pallas_matches(self):
        d = random_block_dense(4, 4, 8, 0.4, seed=13)
        b = bsr_from_dense(d, 8)
        x = RNG.standard_normal((32, 16)).astype(np.float32)
        y = bsr_spmm_pallas(b, x, interpret=True)
        np.testing.assert_allclose(np.asarray(y), d @ x, rtol=1e-4)

    def test_spmv_pallas(self):
        d = random_block_dense(3, 3, 8, 0.6, seed=14)
        b = bsr_from_dense(d, 8)
        x = RNG.standard_normal(24).astype(np.float32)
        y = bsr_spmv_pallas(b, x, interpret=True)
        np.testing.assert_allclose(np.asarray(y), d @ x, rtol=1e-4)

    def test_spmm_pallas_grad(self):
        d = random_block_dense(2, 2, 8, 1.0, seed=15)
        b = bsr_from_dense(d, 8)
        x = RNG.standard_normal((16, 8)).astype(np.float32)

        def loss(blocks, x):
            bb = type(b)(b.brows, b.bcols, blocks, b.shape, b.n_blocks)
            return jnp.sum(bsr_spmm_pallas(bb, x, interpret=True) ** 2)

        gb, gx = jax.grad(loss, argnums=(0, 1))(b.blocks, x)

        def loss_o(blocks, x):
            bb = type(b)(b.brows, b.bcols, blocks, b.shape, b.n_blocks)
            return jnp.sum(bsr_spmm_xla(bb, x) ** 2)

        gb0, gx0 = jax.grad(loss_o, argnums=(0, 1))(b.blocks, x)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx0), rtol=1e-3)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gb0), rtol=1e-3)

    def test_from_csmat(self):
        d = random_sparse(20, 20, 0.1, seed=16)
        b = st.from_dense(d).to_bsr(8)
        np.testing.assert_allclose(np.asarray(b.to_dense()), d)

    def test_grouped_matches(self):
        from sprs_tpu.ops.pallas import bsr_group, bsr_spmm_pallas_grouped

        d = random_block_dense(5, 4, 8, 0.4, seed=17)
        b = bsr_group(bsr_from_dense(d, 8), 4)
        assert b.n_blocks % 4 == 0
        np.testing.assert_allclose(np.asarray(b.to_dense()), d)
        x = RNG.standard_normal((32, 16)).astype(np.float32)
        y = bsr_spmm_pallas_grouped(b, x, group=4, interpret=True)
        np.testing.assert_allclose(np.asarray(y), d @ x, rtol=1e-4)

    def test_grouped_empty_row(self):
        from sprs_tpu.ops.pallas import bsr_group, bsr_spmm_pallas_grouped

        d = np.zeros((24, 24), np.float32)
        d[0, 0] = 2.0
        d[17, 5] = -1.0  # block rows 0 and 2; row 1 empty
        b = bsr_group(bsr_from_dense(d, 8), 2)
        x = RNG.standard_normal((24, 8)).astype(np.float32)
        y = bsr_spmm_pallas_grouped(b, x, group=2, interpret=True)
        np.testing.assert_allclose(np.asarray(y), d @ x, rtol=1e-5)


# ---------------------------------------------------------------------------
# DIA format + kernel
# ---------------------------------------------------------------------------


def banded_dense(n, offsets, seed):
    rng = np.random.default_rng(seed)
    d = np.zeros((n, n), np.float32)
    for off in offsets:
        v = rng.standard_normal(n).astype(np.float32)
        for i in range(n):
            j = i + off
            if 0 <= j < n:
                d[i, j] = v[i]
    return d


class TestDia:
    OFFS = (-5, -1, 0, 1, 5)

    def test_roundtrip(self):
        d = banded_dense(23, self.OFFS, seed=20)
        dia = st.from_dense(d).to_dia()
        assert dia.offsets == self.OFFS
        np.testing.assert_allclose(np.asarray(dia.to_dense()), d)

    def test_laplacian_offsets(self):
        lap = st.utils.grid_laplacian((5, 7), dtype=np.float64)
        dia = lap.to_dia()
        assert dia.offsets == (-7, -1, 0, 1, 7)
        np.testing.assert_allclose(
            np.asarray(dia.to_dense()), np.asarray(lap.to_dense())
        )

    def test_spmv_oracle(self):
        d = banded_dense(40, self.OFFS, seed=21)
        dia = st.from_dense(d).to_dia()
        x = RNG.standard_normal(40).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(jax.jit(dia_spmv)(dia, x)), d @ x, rtol=1e-4
        )

    def test_spmm_oracle(self):
        d = banded_dense(24, self.OFFS, seed=22)
        dia = st.from_dense(d).to_dia()
        x = RNG.standard_normal((24, 6)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(dia_spmm(dia, x)), d @ x, rtol=1e-4
        )

    def test_rectangular(self):
        d = np.zeros((6, 9), np.float32)
        for i in range(6):
            d[i, i] = 1.0 + i
            d[i, i + 3] = -1.0
        dia = st.from_dense(d).to_dia()
        x = RNG.standard_normal(9).astype(np.float32)
        np.testing.assert_allclose(np.asarray(dia.to_dense()), d)
        np.testing.assert_allclose(
            np.asarray(dia_spmv(dia, x)), d @ x, rtol=1e-4
        )

    def test_max_diags_guard(self):
        d = random_sparse(12, 12, 0.8, seed=23)
        with pytest.raises(st.ShapeError):
            st.from_dense(d).to_dia(max_diags=3)
        assert n_diags_of(st.from_dense(d)) > 3

    def test_pallas_matches(self):
        d = banded_dense(64, self.OFFS, seed=24)
        dia = st.from_dense(d).to_dia()
        x = RNG.standard_normal(64).astype(np.float32)
        y = dia_spmv_pallas(dia, x, interpret=True)
        np.testing.assert_allclose(np.asarray(y), d @ x, rtol=1e-4)

    def test_pallas_lag_variant(self):
        d = banded_dense(72, self.OFFS, seed=28)
        dia = st.from_dense(d).to_dia()
        x = RNG.standard_normal(72).astype(np.float32)
        y = dia_spmv_pallas(dia, x, variant="lag", interpret=True)
        np.testing.assert_allclose(np.asarray(y), d @ x, rtol=1e-4)

    def test_pallas_flat_variant(self):
        d = banded_dense(72, self.OFFS, seed=29)
        dia = st.from_dense(d).to_dia()
        x = RNG.standard_normal(72).astype(np.float32)
        y = dia_spmv_pallas(dia, x, variant="flat", interpret=True)
        np.testing.assert_allclose(np.asarray(y), d @ x, rtol=1e-4)

    def test_pallas_flat_vjp(self):
        import jax

        d = banded_dense(40, (-2, 0, 1), seed=30)
        dia = st.from_dense(d).to_dia()
        x = RNG.standard_normal(40).astype(np.float32)

        def loss_flat(data, v):
            m = type(dia)(data, dia.offsets, dia.shape)
            return jnp.sum(
                dia_spmv_pallas(m, v, variant="flat", interpret=True) ** 2
            )

        def loss_ref(data, v):
            m = type(dia)(data, dia.offsets, dia.shape)
            return jnp.sum((m.to_dense() @ v) ** 2)

        g_flat = jax.grad(loss_flat, argnums=(0, 1))(dia.data, x)
        g_ref = jax.grad(loss_ref, argnums=(0, 1))(dia.data, x)
        live = np.asarray(g_ref[0]) != 0  # padding rows carry no signal
        np.testing.assert_allclose(
            np.asarray(g_flat[0])[live],
            np.asarray(g_ref[0])[live],
            rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(g_flat[1]), np.asarray(g_ref[1]), rtol=1e-3
        )

    def test_dia_tiled_prepared(self):
        from sprs_tpu.ops.pallas import dia_tile

        d = banded_dense(100, self.OFFS, seed=31)
        dia = st.from_dense(d).to_dia()
        tiled = dia_tile(dia)
        x = RNG.standard_normal(100).astype(np.float32)
        y = tiled.spmv(x, interpret=True)
        np.testing.assert_allclose(np.asarray(y), d @ x, rtol=1e-4)
        # pytree round-trip (solver loops carry it through jit)
        leaves, treedef = jax.tree_util.tree_flatten(tiled)
        t2 = jax.tree_util.tree_unflatten(treedef, leaves)
        y2 = t2.spmv(x, interpret=True)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y))

    def test_dia_tiled_grouped(self):
        from sprs_tpu.ops.pallas import dia_tile

        d = banded_dense(5000, self.OFFS, seed=33)
        dia = st.from_dense(d).to_dia()
        x = RNG.standard_normal(5000).astype(np.float32)
        for grp in (2, 4):
            tiled = dia_tile(dia, blk=1024, grp=grp)
            assert tiled.grp == grp
            y = tiled.spmv(x, interpret=True)
            # atol: f32 entries that cancel to ~0 fail pure-rtol checks
            # (kernel is exact in f64 — fuzz-verified to 4e-15)
            np.testing.assert_allclose(
                np.asarray(y), d @ x, rtol=1e-4, atol=1e-4
            )

    def test_dia_tiled_manual_variant(self):
        """Hand-pipelined DMA twin of flatg: bit-parity at several
        depths, including depth > n_tiles (warm-up clamp)."""
        from sprs_tpu.ops.pallas import dia_tile

        d = banded_dense(6000, self.OFFS, seed=35)
        dia = st.from_dense(d).to_dia()
        x = RNG.standard_normal(6000).astype(np.float32)
        tiled = dia_tile(dia, blk=1024, grp=2)
        y_ref = np.asarray(tiled.spmv(x, interpret=True))
        for depth in (1, 2, 3, 8):
            y = np.asarray(
                tiled.spmv(x, interpret=True, variant="manual", depth=depth)
            )
            np.testing.assert_array_equal(y, y_ref)

    def test_pallas_flatg_variant(self):
        d = banded_dense(5000, self.OFFS, seed=34)
        dia = st.from_dense(d).to_dia()
        x = RNG.standard_normal(5000).astype(np.float32)
        y = dia_spmv_pallas(
            dia, x, blk=1024, grp=4, variant="flatg", interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(y), d @ x, rtol=1e-4, atol=1e-4
        )

        # vjp check on a SMALLER system: f32 gradient sums over 5000
        # rows accumulate ~1e-3 order-dependent noise, which is the
        # kernel-vs-dense summation-order difference, not a bug
        d2 = banded_dense(640, self.OFFS, seed=35)
        dia2 = st.from_dense(d2).to_dia()
        x2 = RNG.standard_normal(640).astype(np.float32)

        def loss(data, v):
            m = type(dia2)(data, dia2.offsets, dia2.shape)
            return jnp.sum(
                dia_spmv_pallas(
                    m, v, blk=1024, grp=2, variant="flatg", interpret=True
                )
                ** 2
            )

        def loss_ref(data, v):
            m = type(dia2)(data, dia2.offsets, dia2.shape)
            return jnp.sum((m.to_dense() @ v) ** 2)

        g = jax.grad(loss, argnums=(0, 1))(dia2.data, x2)
        g_ref = jax.grad(loss_ref, argnums=(0, 1))(dia2.data, x2)
        live = np.asarray(g_ref[0]) != 0
        np.testing.assert_allclose(
            np.asarray(g[0])[live],
            np.asarray(g_ref[0])[live],
            rtol=1e-3,
            atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(g[1]), np.asarray(g_ref[1]), rtol=1e-3, atol=1e-3
        )

    def test_spmm_pallas_matches(self):
        from sprs_tpu.ops.pallas import dia_spmm_pallas

        d = banded_dense(48, self.OFFS, seed=26)
        dia = st.from_dense(d).to_dia()
        x = RNG.standard_normal((48, 6)).astype(np.float32)
        y = dia_spmm_pallas(dia, x, interpret=True)  # lagflat default
        np.testing.assert_allclose(np.asarray(y), d @ x, rtol=1e-4)
        y2 = dia_spmm_pallas(dia, x, variant="carry", interpret=True)
        np.testing.assert_allclose(np.asarray(y2), d @ x, rtol=1e-4)

    def test_spmm_pallas_vjp(self):
        from sprs_tpu.ops.pallas import dia_spmm_pallas

        d = banded_dense(24, (-1, 0, 3), seed=27)
        dia = st.from_dense(d).to_dia()
        x = RNG.standard_normal((24, 4)).astype(np.float32)

        def loss_p(data, x):
            m = type(dia)(data, dia.offsets, dia.shape)
            return jnp.sum(dia_spmm_pallas(m, x, interpret=True) ** 2)

        def loss_o(data, x):
            m = type(dia)(data, dia.offsets, dia.shape)
            return jnp.sum(dia_spmm(m, x) ** 2)

        gd, gx = jax.grad(loss_p, argnums=(0, 1))(dia.data, x)
        gd0, gx0 = jax.grad(loss_o, argnums=(0, 1))(dia.data, x)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx0), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gd), np.asarray(gd0), rtol=1e-4)

    def test_pallas_vjp(self):
        d = banded_dense(32, (-1, 0, 2), seed=25)
        dia = st.from_dense(d).to_dia()
        x = RNG.standard_normal(32).astype(np.float32)

        def loss_p(data, x):
            m = type(dia)(data, dia.offsets, dia.shape)
            return jnp.sum(dia_spmv_pallas(m, x, interpret=True) ** 2)

        def loss_o(data, x):
            m = type(dia)(data, dia.offsets, dia.shape)
            return jnp.sum(dia_spmv(m, x) ** 2)

        gd, gx = jax.grad(loss_p, argnums=(0, 1))(dia.data, x)
        gd0, gx0 = jax.grad(loss_o, argnums=(0, 1))(dia.data, x)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx0), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gd), np.asarray(gd0), rtol=1e-4)


class TestSortRows:
    """Batched bitonic co-sort (ops/pallas/sort.py)."""

    def test_sorts_keys_and_carries_values(self):
        from sprs_tpu.ops.pallas import sort_rows_pallas

        rng = np.random.default_rng(40)
        k = rng.integers(0, 1 << 30, (65, 128)).astype(np.int32)
        v = rng.random((65, 128)).astype(np.float32)
        ks, vs = sort_rows_pallas(jnp.asarray(k), jnp.asarray(v), interpret=True)
        order = np.argsort(k, axis=1)
        np.testing.assert_array_equal(np.asarray(ks), np.take_along_axis(k, order, 1))
        for r in range(65):
            assert sorted(zip(k[r].tolist(), v[r].tolist())) == sorted(
                zip(np.asarray(ks)[r].tolist(), np.asarray(vs)[r].tolist())
            )

    def test_duplicate_keys_keep_pairing(self):
        from sprs_tpu.ops.pallas import sort_rows_pallas

        rng = np.random.default_rng(41)
        k = rng.integers(0, 8, (16, 128)).astype(np.int32)  # heavy ties
        v = rng.random((16, 128)).astype(np.float32)
        ks, vs = sort_rows_pallas(jnp.asarray(k), jnp.asarray(v), interpret=True)
        np.testing.assert_array_equal(np.asarray(ks), np.sort(k, axis=1))
        for r in range(16):
            assert sorted(zip(k[r].tolist(), v[r].tolist())) == sorted(
                zip(np.asarray(ks)[r].tolist(), np.asarray(vs)[r].tolist())
            )

    def test_float_keys(self):
        from sprs_tpu.ops.pallas import sort_rows_pallas

        rng = np.random.default_rng(42)
        k = rng.standard_normal((10, 128)).astype(np.float32)
        v = rng.random((10, 128)).astype(np.float32)
        ks, _ = sort_rows_pallas(jnp.asarray(k), jnp.asarray(v), interpret=True)
        np.testing.assert_allclose(np.asarray(ks), np.sort(k, axis=1))

    def test_shape_validation(self):
        from sprs_tpu.ops.pallas import sort_rows_pallas

        with np.testing.assert_raises(ValueError):
            sort_rows_pallas(
                jnp.zeros((4, 64), jnp.int32),
                jnp.zeros((4, 64), jnp.float32),
                interpret=True,
            )


class TestBsrFromCsmat:
    """Sparse-native CSR->BSR (no densify detour)."""

    def test_matches_dense_path(self):
        d = random_block_dense(5, 7, 8, 0.35, seed=50)
        via_sparse = st.from_dense(d).to_bsr(8)
        via_dense = bsr_from_dense(d, 8)
        np.testing.assert_allclose(
            np.asarray(via_sparse.to_dense()),
            np.asarray(via_dense.to_dense()),
        )
        assert via_sparse.n_blocks == via_dense.n_blocks
        np.testing.assert_array_equal(
            np.asarray(via_sparse.brows)[: via_sparse.n_blocks],
            np.asarray(via_dense.brows)[: via_dense.n_blocks],
        )
        np.testing.assert_array_equal(
            np.asarray(via_sparse.bcols)[: via_sparse.n_blocks],
            np.asarray(via_dense.bcols)[: via_dense.n_blocks],
        )

    def test_unaligned_shape_and_empty_block_rows(self):
        d = np.zeros((20, 19), np.float32)
        d[0, 0] = 1.0
        d[17, 18] = 2.0  # block row 2, block col 2 at bs=8
        b = st.from_dense(d).to_bsr(8)
        assert b.shape == (20, 19)
        np.testing.assert_allclose(np.asarray(b.to_dense()), d)
        # block row 1 is empty -> explicit zero block present
        assert 1 in np.asarray(b.brows)[: b.n_blocks].tolist()

    def test_huge_shape_does_not_densify(self):
        import time

        from sprs_tpu.formats.csmat import csmat

        n = 200_000  # dense would be 320 GB
        m = csmat(
            (n, n),
            np.concatenate(
                [[0, 2, 3], np.full(n - 2, 3, np.int64)]
            ).astype(np.int32),
            np.array([5, n - 1, 100_000], np.int32),
            np.array([1.0, 2.0, 3.0], np.float32),
        )
        t0 = time.perf_counter()
        b = m.to_bsr(128)
        assert time.perf_counter() - t0 < 30.0
        assert b.shape == (n, n)
        got = {
            (int(r), int(c))
            for r, c in zip(
                np.asarray(b.brows)[: b.n_blocks],
                np.asarray(b.bcols)[: b.n_blocks],
            )
        }
        assert (0, 0) in got and (0, (n - 1) // 128) in got
        assert (0, 100_000 // 128) in got  # row 1 lives in block row 0
        assert (1, 0) in got  # empty block row -> explicit zero block
