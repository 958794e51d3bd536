"""Dtype coverage and tolerance table (SURVEY §7 hard part 4).

The reference is f64-exact in places (golden LDL doubles); on TPU the
production dtypes are bf16/f32 with f32 accumulation.  This module pins
the documented tolerance per dtype so regressions in accumulation
precision are caught:

| dtype     | SpMV/SpMM rtol | notes                              |
|-----------|----------------|------------------------------------|
| float64   | 1e-12          | CPU/x64 parity path                |
| float32   | 1e-5           | default device dtype               |
| bfloat16  | 5e-2           | storage bf16, accumulate f32       |
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sprs_tpu as st
from sprs_tpu.formats.bsr import bsr_from_dense, bsr_spmm_xla
from sprs_tpu.formats.dia import dia_spmv
from sprs_tpu.formats.ell import ell_spmv

RTOL = {np.float64: 1e-12, np.float32: 1e-5}
BF16_RTOL = 5e-2


def random_sparse(r, c, density, seed, dtype):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((r, c))
    d[rng.random((r, c)) > density] = 0.0
    return d.astype(dtype)


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
class TestFloatDtypes:
    def test_spmv(self, dtype):
        d = random_sparse(30, 20, 0.3, 0, dtype)
        x = np.random.default_rng(1).standard_normal(20).astype(dtype)
        y = np.asarray(st.spmv(st.from_dense(d), x))
        assert y.dtype == dtype
        np.testing.assert_allclose(
            y, d.astype(np.float64) @ x.astype(np.float64),
            rtol=RTOL[dtype],
        )

    def test_spgemm(self, dtype):
        da = random_sparse(15, 12, 0.3, 2, dtype)
        db = random_sparse(12, 18, 0.3, 3, dtype)
        c = st.spgemm(st.from_dense(da), st.from_dense(db))
        assert np.asarray(c.data).dtype == dtype
        np.testing.assert_allclose(
            np.asarray(c.to_dense()),
            da.astype(np.float64) @ db.astype(np.float64),
            rtol=RTOL[dtype],
            atol=RTOL[dtype],
        )

    def test_binop(self, dtype):
        da = random_sparse(10, 10, 0.4, 4, dtype)
        db = random_sparse(10, 10, 0.4, 5, dtype)
        c = st.from_dense(da) + st.from_dense(db)
        np.testing.assert_allclose(
            np.asarray(c.to_dense()), da + db, rtol=RTOL[dtype]
        )


class TestBf16:
    """bf16 storage, f32 accumulation — the TPU production mix."""

    def _mat(self, seed=0):
        d64 = random_sparse(32, 24, 0.3, seed, np.float64)
        d16 = jnp.asarray(d64, jnp.bfloat16)
        return np.asarray(d16, np.float32).astype(np.float64), d16

    def test_spmv_csr(self):
        d64, d16 = self._mat()
        m = st.from_dense(np.asarray(d16, np.float32)).astype(jnp.bfloat16)
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal(24), jnp.bfloat16
        )
        y = np.asarray(st.spmv(m, x), np.float64)
        ref = d64 @ np.asarray(x, np.float64)
        np.testing.assert_allclose(y, ref, rtol=BF16_RTOL, atol=1e-2)

    def test_ell_spmv(self):
        d64, d16 = self._mat(seed=2)
        ell = st.from_dense(np.asarray(d16, np.float32)).to_ell()
        ell = type(ell)(
            ell.indices, ell.data.astype(jnp.bfloat16), ell.shape
        )
        x = jnp.asarray(
            np.random.default_rng(3).standard_normal(24), jnp.bfloat16
        )
        y = np.asarray(ell_spmv(ell, x), np.float64)
        ref = d64 @ np.asarray(x, np.float64)
        np.testing.assert_allclose(y, ref, rtol=BF16_RTOL, atol=1e-2)

    def test_bsr_spmm_f32_accum(self):
        rng = np.random.default_rng(4)
        d = rng.standard_normal((16, 16)).astype(np.float32)
        b = bsr_from_dense(d, 8, dtype=jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((16, 8)), jnp.bfloat16)
        y = np.asarray(bsr_spmm_xla(b, x), np.float64)
        ref = np.asarray(b.to_dense(), np.float64) @ np.asarray(
            x, np.float64
        )
        # einsum uses preferred_element_type=f32: the error budget is
        # bf16 rounding of the inputs, not the accumulation
        np.testing.assert_allclose(y, ref, rtol=BF16_RTOL, atol=5e-2)

    def test_dia_spmv(self):
        n = 24
        d = np.zeros((n, n), np.float32)
        rng = np.random.default_rng(5)
        for off in (-2, 0, 2):
            for i in range(n):
                j = i + off
                if 0 <= j < n:
                    d[i, j] = rng.standard_normal()
        d16 = np.asarray(jnp.asarray(d, jnp.bfloat16), np.float32)
        dia = st.from_dense(d16).to_dia()
        dia = type(dia)(
            dia.data.astype(jnp.bfloat16), dia.offsets, dia.shape
        )
        x = jnp.asarray(rng.standard_normal(n), jnp.bfloat16)
        y = np.asarray(dia_spmv(dia, x), np.float64)
        ref = d16.astype(np.float64) @ np.asarray(x, np.float64)
        np.testing.assert_allclose(y, ref, rtol=BF16_RTOL, atol=1e-2)

    def test_astype_roundtrip(self):
        d = random_sparse(8, 8, 0.5, 6, np.float32)
        m = st.from_dense(d).astype(jnp.bfloat16)
        assert m.dtype == jnp.bfloat16
        back = m.astype(jnp.float32)
        np.testing.assert_allclose(
            np.asarray(back.to_dense()),
            np.asarray(jnp.asarray(d, jnp.bfloat16), np.float32),
        )


class TestComplex:
    """Complex scalars (the reference supports them: smmp.rs:516-555)."""

    def test_spmv_complex(self):
        rng = np.random.default_rng(7)
        d = (
            rng.standard_normal((10, 10))
            + 1j * rng.standard_normal((10, 10))
        ).astype(np.complex64)
        d[rng.random((10, 10)) > 0.4] = 0
        x = (
            rng.standard_normal(10) + 1j * rng.standard_normal(10)
        ).astype(np.complex64)
        m = st.from_dense(d)
        np.testing.assert_allclose(
            np.asarray(st.spmv(m, x)), d @ x, rtol=1e-4
        )

    def test_spgemm_complex(self):
        rng = np.random.default_rng(8)
        d = (
            rng.standard_normal((8, 8)) + 1j * rng.standard_normal((8, 8))
        ).astype(np.complex64)
        d[rng.random((8, 8)) > 0.5] = 0
        m = st.from_dense(d)
        c = st.spgemm(m, m)
        np.testing.assert_allclose(
            np.asarray(c.to_dense()), d @ d, rtol=1e-3, atol=1e-4
        )


class TestIntData:
    def test_spmv_int(self):
        d = np.array([[1, 0, 2], [0, 3, 0], [4, 0, 5]], np.int32)
        m = st.from_dense(d.astype(np.int32))
        y = np.asarray(st.spmv(m, np.array([1, 2, 3], np.int32)))
        np.testing.assert_array_equal(y, d @ np.array([1, 2, 3]))
