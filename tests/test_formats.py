"""Format construction, validation, and conversions.

Mirrors the reference's constructor/validation tests (csmat.rs:2337-2568)
and triplet tests (triplet.rs:336-643) against dense oracles.
"""

import numpy as np
import pytest

import sprs_tpu as st
from sprs_tpu.utils import fixtures


@pytest.fixture(params=["a", "b", "rect"])
def dense(request):
    return fixtures.all_fixtures()[request.param]


class TestConstruction:
    def test_from_dense_roundtrip(self, dense):
        for storage in ("csr", "csc"):
            m = st.from_dense(dense, storage=storage)
            m.check_structure()
            assert m.nnz == np.count_nonzero(dense)
            np.testing.assert_allclose(m.to_dense(), dense)

    def test_from_dense_eps(self):
        d = np.array([[0.05, 1.0], [0.2, 0.0]])
        m = st.from_dense(d, eps=0.1)
        assert m.nnz == 2
        np.testing.assert_allclose(
            m.to_dense(), np.array([[0.0, 1.0], [0.2, 0.0]])
        )

    def test_from_dense_cap_truncation(self):
        # cap below the true nnz keeps the FIRST cap entries in
        # row-major order (structure stays valid); cap above pads
        d = np.array([[1.0, 0.0, 2.0], [3.0, 4.0, 0.0]])
        m = st.from_dense(d, cap=2)
        m.check_structure()
        assert int(m.nnz) == 2
        np.testing.assert_allclose(
            m.to_dense(), [[1.0, 0.0, 2.0], [0.0, 0.0, 0.0]]
        )
        m8 = st.from_dense(d, cap=8)
        assert int(m8.nnz) == 4
        np.testing.assert_allclose(m8.to_dense(), d)

    def test_from_dense_leading_zero(self):
        # regression: the sort-free path scatters every element; a
        # leading zero used to produce gid=-1, which JAX WRAPS to the
        # last slot (numpy semantics) instead of dropping — corrupting
        # the tail entry under the indices_are_sorted hint
        d = np.array([[0.0, 0.0, 1.0], [0.0, 2.0, 0.0], [3.0, 0.0, 4.0]])
        for storage in ("csr", "csc"):
            m = st.from_dense(d, storage=storage)
            m.check_structure()
            np.testing.assert_allclose(m.to_dense(), d)
        # tight cap (no slack slot to absorb a wrapped write)
        m = st.from_dense(d, cap=4)
        np.testing.assert_allclose(m.to_dense(), d)
        # all-zero input
        z = st.from_dense(np.zeros((2, 3)))
        assert int(z.nnz) == 0
        np.testing.assert_allclose(z.to_dense(), np.zeros((2, 3)))

    def test_from_dense_zero_dims(self):
        for shape in ((0, 3), (3, 0), (0, 0)):
            m = st.from_dense(np.zeros(shape))
            assert int(m.nnz) == 0
            assert m.shape == shape

    def test_csr_explicit(self):
        m = st.csr((3, 3), [0, 2, 2, 3], [0, 2, 1], [1.0, 2.0, 3.0])
        np.testing.assert_allclose(
            m.to_dense(), [[1, 0, 2], [0, 0, 0], [0, 3, 0]]
        )

    def test_eye(self):
        for storage in ("csr", "csc"):
            m = st.eye(4, storage=storage)
            np.testing.assert_allclose(m.to_dense(), np.eye(4))

    def test_diag_csmat(self):
        m = st.diag_csmat(np.array([1.0, 2.0, 3.0]))
        np.testing.assert_allclose(m.to_dense(), np.diag([1.0, 2.0, 3.0]))

    def test_empty(self):
        m = st.empty((3, 4))
        assert m.nnz == 0
        np.testing.assert_allclose(m.to_dense(), np.zeros((3, 4)))

    def test_from_unsorted_sums_duplicates(self):
        m = st.csmat_from_unsorted(
            (2, 3), [0, 3, 4], [2, 0, 2, 1], [1.0, 2.0, 5.0, 3.0]
        )
        np.testing.assert_allclose(m.to_dense(), [[2, 0, 6], [0, 3, 0]])

    def test_from_scipy_roundtrip(self, dense):
        import scipy.sparse as sp

        m = st.from_scipy(sp.csr_matrix(dense))
        np.testing.assert_allclose(m.to_dense(), dense)
        back = m.to_scipy()
        np.testing.assert_allclose(back.toarray(), dense)


class TestValidation:
    def test_unsorted_rejected(self):
        with pytest.raises(st.StructureError):
            st.csr((2, 2), [0, 2, 2], [1, 0], [1.0, 2.0])

    def test_duplicate_rejected(self):
        with pytest.raises(st.StructureError):
            st.csr((2, 2), [0, 2, 2], [1, 1], [1.0, 2.0])

    def test_out_of_range_rejected(self):
        with pytest.raises(st.StructureError):
            st.csr((2, 2), [0, 1, 2], [1, 5], [1.0, 2.0])

    def test_bad_indptr_rejected(self):
        with pytest.raises(st.StructureError):
            st.csr((2, 2), [0, 2, 1], [0, 1], [1.0, 2.0])
        with pytest.raises(st.StructureError):
            st.csr((2, 2), [0, 1], [0], [1.0])  # wrong length

    def test_nnz_exceeds_cap(self):
        with pytest.raises(st.StructureError):
            st.csr((2, 2), [0, 1, 2], [0, 1], [1.0, 2.0], cap=1)


class TestTransposeAndStorage:
    def test_transpose_is_metadata(self, dense):
        m = st.from_dense(dense)
        t = m.T
        assert t.storage == "csc"
        assert t.shape == dense.T.shape
        np.testing.assert_allclose(t.to_dense(), dense.T)
        # same underlying buffers
        assert t.indices is m.indices and t.data is m.data

    def test_storage_roundtrip(self, dense):
        m = st.from_dense(dense)
        back = m.to_csc().to_csr()
        np.testing.assert_array_equal(back.indptr, m.indptr)
        np.testing.assert_array_equal(back.indices, m.indices)
        np.testing.assert_allclose(back.data, m.data)


class TestAccessors:
    def test_get(self, dense):
        m = st.from_dense(dense)
        for i in range(dense.shape[0]):
            for j in range(dense.shape[1]):
                assert float(m[i, j]) == dense[i, j]

    def test_diag(self):
        d = fixtures.dense_a()
        m = st.from_dense(d)
        np.testing.assert_allclose(m.diag(), np.diag(d))
        np.testing.assert_allclose(m.to_csc().diag(), np.diag(d))

    def test_degrees(self):
        d = fixtures.dense_a()
        m = st.from_dense(d)
        expect = [
            np.count_nonzero(d[i]) - (1 if d[i, i] != 0 else 0)
            for i in range(5)
        ]
        np.testing.assert_array_equal(m.degrees(), expect)

    def test_outer_nnz(self):
        d = fixtures.dense_a()
        m = st.from_dense(d)
        np.testing.assert_array_equal(
            m.outer_nnz(), np.count_nonzero(d, axis=1)
        )
        assert m.max_outer_nnz() == int(np.count_nonzero(d, axis=1).max())

    def test_density(self):
        m = st.from_dense(fixtures.dense_a())
        assert m.density == m.nnz / 25


class TestElementwise:
    def test_map_scale_neg(self, dense):
        m = st.from_dense(dense)
        np.testing.assert_allclose(m.scale(2.0).to_dense(), 2 * dense)
        np.testing.assert_allclose((-m).to_dense(), -dense)
        np.testing.assert_allclose((m / 4.0).to_dense(), dense / 4)
        sq = m.map(lambda x: x * x)
        np.testing.assert_allclose(sq.to_dense(), dense * dense)

    def test_map_does_not_densify(self):
        m = st.from_dense(fixtures.dense_a())
        shifted = m.map(lambda x: x + 1.0)
        assert shifted.nnz == m.nnz  # only stored entries changed


class TestSliceCapCompact:
    def test_slice_outer(self):
        d = fixtures.dense_a()
        m = st.from_dense(d)
        s = m.slice_outer(1, 4)
        np.testing.assert_allclose(s.to_dense(), d[1:4])
        s2 = st.from_dense(d, storage="csc").slice_outer(2, 5)
        np.testing.assert_allclose(s2.to_dense(), d[:, 2:5])

    def test_with_cap(self):
        m = st.from_dense(fixtures.dense_a())
        big = m.with_cap(m.cap + 10)
        assert big.cap == m.cap + 10 and big.nnz == m.nnz
        np.testing.assert_allclose(big.to_dense(), m.to_dense())
        with pytest.raises(st.StructureError):
            m.with_cap(m.nnz - 1)

    def test_compact_drops_zeros(self):
        d = fixtures.dense_a()
        m = st.from_dense(d)
        mz = m.with_data(
            np.where(np.asarray(m.data) == 3.5, 0.0, np.asarray(m.data))
        )
        c = mz.compact()
        assert c.nnz == m.nnz - 1
        expect = d.copy()
        expect[expect == 3.5] = 0.0
        np.testing.assert_allclose(c.to_dense(), expect)
        c.check_structure()


class TestTriplet:
    def test_builder_and_duplicates(self):
        t = st.TriMat((3, 4))
        t.add_triplet(0, 1, 2.0)
        t.add_triplet(2, 3, 1.0)
        t.add_triplet(0, 1, 3.0)  # duplicate → summed
        m = t.to_csr()
        assert m.nnz == 2
        expect = np.zeros((3, 4))
        expect[0, 1] = 5.0
        expect[2, 3] = 1.0
        np.testing.assert_allclose(m.to_dense(), expect)
        np.testing.assert_allclose(t.to_csc().to_dense(), expect)

    def test_trailing_empty_rows(self):
        # regression analog of reference issue #170
        t = st.TriMat((4, 2))
        t.add_triplet(0, 0, 1.0)
        m = t.to_csr()
        assert m.indptr.shape == (5,)
        np.testing.assert_array_equal(m.indptr, [0, 1, 1, 1, 1])

    def test_from_triplets_and_locations(self):
        t = st.TriMat.from_triplets(
            (2, 2), [0, 1, 0], [0, 1, 0], [1.0, 2.0, 3.0]
        )
        assert t.find_locations(0, 0) == [0, 2]
        t.set_triplet(2, 0, 1, 7.0)
        np.testing.assert_allclose(
            t.to_csr().to_dense(), [[1, 7], [0, 2]]
        )

    def test_transpose_view(self):
        t = st.TriMat.from_triplets((2, 3), [0, 1], [2, 0], [1.0, 2.0])
        tt = t.transpose_view()
        np.testing.assert_allclose(
            tt.to_csr().to_dense(), t.to_dense().T
        )

    def test_out_of_range_add(self):
        t = st.TriMat((2, 2))
        with pytest.raises(st.StructureError):
            t.add_triplet(2, 0, 1.0)
        with pytest.raises(st.StructureError):
            t.add_triplet(0, -1, 1.0)

    def test_coo_to_csmat_jit(self):
        import jax

        rows = np.array([1, 0, 1, 2], np.int32)
        cols = np.array([0, 1, 0, 2], np.int32)
        vals = np.array([1.0, 2.0, 3.0, 4.0])

        f = jax.jit(
            lambda r, c, v: st.coo_to_csmat(r, c, v, (3, 3), cap=4)
        )
        m = f(rows, cols, vals)
        np.testing.assert_allclose(
            m.to_dense(), [[0, 2, 0], [4, 0, 0], [0, 0, 4]]
        )


class TestVec:
    def test_construct_and_dense(self):
        v = st.csvec(6, [1, 3, 5], [1.0, 2.0, 3.0])
        np.testing.assert_allclose(
            v.to_dense(), [0, 1, 0, 2, 0, 3]
        )
        with pytest.raises(st.StructureError):
            st.csvec(6, [3, 1], [1.0, 2.0])
        with pytest.raises(st.StructureError):
            st.csvec(3, [1, 5], [1.0, 2.0])

    def test_from_unsorted_and_dense(self):
        v = st.csvec_from_unsorted(5, [4, 0, 4], [1.0, 2.0, 3.0])
        np.testing.assert_allclose(v.to_dense(), [2, 0, 0, 0, 4])
        w = st.csvec_from_dense(np.array([0.0, 1.0, 0.0, 2.0]))
        assert w.nnz == 2
        np.testing.assert_allclose(w.to_dense(), [0, 1, 0, 2])

    def test_get(self):
        v = st.csvec(6, [1, 3, 5], [1.0, 2.0, 3.0])
        assert float(v[3]) == 2.0
        assert float(v[0]) == 0.0
        assert float(v[5]) == 3.0

    def test_norms(self):
        v = st.csvec(5, [0, 2], [3.0, -4.0])
        assert float(v.l1_norm()) == 7.0
        assert float(v.l2_norm()) == 5.0
        assert float(v.squared_l2_norm()) == 25.0
        assert float(v.norm(np.inf)) == 4.0
        assert float(v.norm(-np.inf)) == 3.0
        assert float(v.norm(0)) == 2.0
        np.testing.assert_allclose(float(v.norm(2)), 5.0)

    def test_unit_normalize(self):
        v = st.csvec(5, [0, 2], [3.0, -4.0]).unit_normalize()
        np.testing.assert_allclose(float(v.l2_norm()), 1.0)

    def test_dots(self):
        v = st.csvec(8, [1, 3, 6], [1.0, 2.0, 3.0])
        w = st.csvec(8, [3, 5, 6], [4.0, 5.0, 6.0])
        dv, dw = v.to_dense(), w.to_dense()
        assert float(v.dot(w)) == float(np.dot(dv, dw))
        assert float(w.dot(v)) == float(np.dot(dv, dw))
        x = np.arange(8.0)
        assert float(v.dot(x)) == float(np.dot(dv, x))

    def test_views(self):
        v = st.csvec(4, [0, 2], [1.0, 2.0])
        rv = v.row_view()
        assert rv.shape == (1, 4)
        np.testing.assert_allclose(rv.to_dense()[0], v.to_dense())
        cv = v.col_view()
        assert cv.shape == (4, 1)
        np.testing.assert_allclose(cv.to_dense()[:, 0], v.to_dense())

    def test_binops(self):
        v = st.csvec(8, [1, 3, 6], [1.0, 2.0, 3.0])
        w = st.csvec(8, [3, 5, 6], [4.0, 5.0, 6.0])
        dv, dw = v.to_dense(), w.to_dense()
        np.testing.assert_allclose((v + w).to_dense(), dv + dw)
        np.testing.assert_allclose((v - w).to_dense(), dv - dw)
        np.testing.assert_allclose((v * w).to_dense(), dv * dw)
        np.testing.assert_allclose((v * 2.0).to_dense(), 2 * dv)
        np.testing.assert_allclose((-v).to_dense(), -dv)


class TestPackedKeyCompress:
    """compress_coo key-packing paths (i32 / i64 / fallback selection)."""

    def test_index_space_past_i32_uses_i64_and_stays_correct(self):
        # (n_outer+1)*n_inner > 2^31: i64 packing path (x64 is on in
        # the test suite)
        import jax.numpy as jnp

        from sprs_tpu.formats.util import compress_coo

        n_outer = n_inner = 1 << 20  # product 2^40
        rows = jnp.asarray([5, 5, 1 << 19, 3], dtype=jnp.int32)
        cols = jnp.asarray([7, 7, 1 << 18, 0], dtype=jnp.int32)
        vals = jnp.asarray([1.0, 2.0, 3.0, 4.0])
        res = compress_coo(
            rows=rows,
            cols=cols,
            value_channels=(vals,),
            nvalid=4,
            n_outer=n_outer,
            n_inner=n_inner,
            out_cap=4,
        )
        assert int(res.nnz) == 3  # duplicates summed
        idx = np.asarray(res.indices)[:3]
        v = np.asarray(res.values[0])[:3]
        got = {
            (int(np.searchsorted(np.asarray(res.indptr), t, "right") - 1),
             int(idx[t]), float(v[t]))
            for t in range(3)
        }
        assert (3, 0, 4.0) in got
        assert (5, 7, 3.0) in got  # 1+2 summed

    def test_spgemm_large_inner_dim(self):
        # cols near the i32-packing boundary for the whole product
        d_a = np.zeros((3, 4), np.float64)
        d_a[0, 1] = 2.0
        d_a[2, 3] = 1.5
        a = st.from_dense(d_a)
        # b: 4 x huge, a few entries
        n_inner = (1 << 30)  # (n_outer+1)*n_inner over 2^31
        from sprs_tpu.formats.csmat import csmat

        b = csmat(
            (4, n_inner),
            np.array([0, 1, 2, 2, 3], np.int32),
            np.array([n_inner - 1, 5, 123], np.int32),
            np.array([10.0, 20.0, 30.0]),
        )
        c = st.spgemm(a, b)
        dense_row0 = {(0, 5): 40.0}  # a[0,1]*b[1,5]
        assert c.shape == (3, n_inner)
        assert int(c.nnz) == 2
        ind = np.asarray(c.indices)[:2]
        dat = np.asarray(c.data)[:2]
        indptr = np.asarray(c.indptr)
        assert indptr[1] - indptr[0] == 1 and ind[0] == 5 and dat[0] == 40.0
        assert indptr[3] - indptr[2] == 1 and ind[1] == 123 and dat[1] == 45.0


class TestSumMean:
    def test_sum_axes(self):
        d = np.array([[1.0, 0, 2], [0, 0, 3], [4, 5, 6]])
        for storage in ("csr", "csc"):
            m = st.from_dense(d, storage=storage)
            np.testing.assert_allclose(float(m.sum()), d.sum())
            np.testing.assert_allclose(np.asarray(m.sum(axis=1)), d.sum(1))
            np.testing.assert_allclose(np.asarray(m.sum(axis=0)), d.sum(0))
            np.testing.assert_allclose(np.asarray(m.mean(axis=1)), d.mean(1))
            np.testing.assert_allclose(float(m.mean()), d.mean())

    def test_sum_jit_and_padding(self):
        import jax

        d = np.array([[1.0, 2.0], [0.0, 3.0]])
        m = st.from_dense(d).with_cap(16)  # extra padding
        y = jax.jit(lambda mm: mm.sum(axis=1))(m)
        np.testing.assert_allclose(np.asarray(y), d.sum(1))


class TestScipyNameParity:
    def test_multiply_maximum_minimum_methods(self):
        d1 = np.array([[1.0, 0, -2], [0, 3, 0]])
        d2 = np.array([[2.0, 1, 4], [0, -1, 0]])
        a, b = st.from_dense(d1), st.from_dense(d2)
        np.testing.assert_allclose(
            np.asarray(a.multiply(b).to_dense()), d1 * d2
        )
        np.testing.assert_allclose(
            np.asarray(a.maximum(b).to_dense()), np.maximum(d1, d2)
        )
        np.testing.assert_allclose(
            np.asarray(a.minimum(b).to_dense()), np.minimum(d1, d2)
        )

    def test_row_col_accessors(self):
        d = np.array([[1.0, 0, 2], [0, 0, 0], [3, 4, 0]])
        for storage in ("csr", "csc"):
            m = st.from_dense(d, storage=storage)
            np.testing.assert_allclose(
                np.asarray(m.row(0).to_dense()), d[0]
            )
            np.testing.assert_allclose(
                np.asarray(m.row(1).to_dense()), d[1]  # empty row
            )
            np.testing.assert_allclose(
                np.asarray(m.col(1).to_dense()), d[:, 1]
            )
        with pytest.raises(st.ShapeError):
            st.from_dense(d).row(5)

    def test_dia_roundtrip_csmat(self):
        from sprs_tpu.formats.dia import dia_to_csmat

        d = np.zeros((9, 11))
        for off in (-2, 0, 3):
            i = np.arange(max(0, -off), min(9, 11 - off))
            d[i, i + off] = off + 5.0
        m = st.from_dense(d)
        back = dia_to_csmat(m.to_dia())
        np.testing.assert_allclose(np.asarray(back.to_dense()), d)
        back.check_structure()

    def test_csvec_sum_mean(self):
        v = st.csvec(6, [1, 4], [2.0, -0.5])
        np.testing.assert_allclose(float(v.sum()), 1.5)
        np.testing.assert_allclose(float(v.mean()), 0.25)

    def test_norm(self):
        d = np.array([[1.0, -2, 0], [0, 3, -4]])
        for storage in ("csr", "csc"):
            m = st.from_dense(d, storage=storage)
            np.testing.assert_allclose(
                float(m.norm("fro")), np.linalg.norm(d)
            )
            np.testing.assert_allclose(
                float(m.norm(1)), np.abs(d).sum(0).max()
            )
            np.testing.assert_allclose(
                float(m.norm(np.inf)), np.abs(d).sum(1).max()
            )
            np.testing.assert_allclose(float(m.norm("max")), 4.0)

    def test_tril_triu(self):
        rng = np.random.default_rng(9)
        d = rng.standard_normal((7, 9)) * (rng.random((7, 9)) < 0.5)
        for storage in ("csr", "csc"):
            m = st.from_dense(d, storage=storage)
            for k in (-2, 0, 1):
                np.testing.assert_allclose(
                    np.asarray(m.tril(k).to_dense()),
                    np.tril(d, k),
                    rtol=1e-12,
                )
                np.testing.assert_allclose(
                    np.asarray(m.triu(k).to_dense()),
                    np.triu(d, k),
                    rtol=1e-12,
                )
            assert m.tril().storage == m.storage

    def test_diags_scipy_parity(self):
        import scipy.sparse as sp

        from sprs_tpu.formats import diags

        cases = [
            (([1.0, 2, 3], [9.0, 9]), (0, 1), None),
            (([4.0], [-1.0, -2], [7.0, 8]), (0, -1, 1), (3, 3)),
            (([2.0],), (1,), (3, 5)),
        ]
        for diagonals, offsets, shape in cases:
            ref = sp.diags(
                [np.atleast_1d(d) if len(np.atleast_1d(d)) > 1 else d[0]
                 for d in diagonals],
                offsets,
                shape=shape,
            ).toarray()
            got = diags(diagonals, offsets, shape=shape)
            got.check_structure()
            np.testing.assert_allclose(
                np.asarray(got.to_dense()), ref
            )


class TestIndexOverflowGuards:
    """gh374 analog (sprs/tests/gh374.rs:10-33): constructing a matrix
    whose dims/capacity overflow the i32 index type must raise eagerly
    ("Index type is not large enough" panic in the reference), never
    silently wrap."""

    def test_csmat_dims_overflow(self):
        from sprs_tpu.errors import StructureError

        with pytest.raises(StructureError, match="not large enough"):
            st.csmat(
                (2**31 + 5, 4), [0, 0], [0], [1.0], validate=False
            )
        with pytest.raises(StructureError, match="index_overflow"):
            st.csmat(
                (4, 2**31 + 5), [0, 0, 0, 0, 0], [0], [1.0], validate=False
            )

    def test_csmat_cap_overflow(self):
        from sprs_tpu.errors import StructureError

        with pytest.raises(StructureError, match="index_overflow"):
            st.csmat((4, 4), [0] * 5, [], [], cap=2**31, validate=False)

    def test_empty_and_eye_guard(self):
        from sprs_tpu.errors import StructureError
        from sprs_tpu.formats.csmat import empty, eye

        with pytest.raises(StructureError):
            empty((2**32, 3))
        with pytest.raises(StructureError):
            eye(2**31)

    def test_trimat_guard(self):
        from sprs_tpu.errors import StructureError
        from sprs_tpu.formats.triplet import TriMat, coo_to_csmat

        with pytest.raises(StructureError):
            TriMat((2**31 + 1, 2))
        with pytest.raises(StructureError):
            coo_to_csmat([0], [0], [1.0], (2, 2**31 + 1))

    def test_reasonable_sizes_fine(self):
        m = st.csmat((3, 3), [0, 1, 1, 2], [0, 2], [1.0, 2.0])
        assert m.shape == (3, 3)


class TestSliceOuterTightCap:
    def test_concrete_slice_gets_tight_cap(self):
        d = np.zeros((6, 5))
        d[0, :4] = np.arange(1, 5)
        d[3, 2] = 7.0
        d[5, 4] = 9.0
        m = st.from_dense(d)
        s = m.slice_outer(2, 5)  # rows 2..4: only (3,2) lives
        assert s.cap == 1  # tight: one entry, not parent cap
        np.testing.assert_allclose(np.asarray(s.to_dense()), d[2:5])
        s2 = m.slice_outer(0, 1)
        assert s2.cap == 4
        np.testing.assert_allclose(np.asarray(s2.to_dense()), d[0:1])

    def test_outer_blocks_total_work_bounded(self):
        rng = np.random.default_rng(5)
        d = rng.standard_normal((40, 8)) * (rng.random((40, 8)) < 0.2)
        m = st.from_dense(d)
        total_cap = 0
        recon = np.zeros_like(d)
        for start, blk in m.outer_blocks(7):
            total_cap += blk.cap
            recon[start : start + blk.shape[0]] = np.asarray(
                blk.to_dense()
            )
        np.testing.assert_allclose(recon, d)
        # total gathered capacity stays O(nnz + blocks), far below
        # blocks * parent_cap
        assert total_cap <= int(m.nnz) + 6

    def test_traced_slice_keeps_parent_cap(self):
        import jax

        d = np.zeros((4, 4))
        d[1, 1] = 2.0
        m = st.from_dense(d)

        @jax.jit
        def f(mm):
            return mm.slice_outer(1, 3).to_dense()

        np.testing.assert_allclose(np.asarray(f(m)), d[1:3])


class TestNnzIndexModify:
    """Reference parity: NnzIndex handles (csmat.rs:2180-2244,
    vec.rs:800-805), re-validating modify (csmat.rs:1705-1718),
    permuted vector iteration (vec.rs:1042-1046)."""

    def test_csmat_nnz_index(self):
        d = np.array([[1.0, 0.0, 2.0], [0.0, 0.0, 3.0], [4.0, 5.0, 6.0]])
        m = st.from_dense(d)
        slot = int(m.nnz_index(1, 2))
        assert float(m.data[slot]) == 3.0
        assert int(m.nnz_index(0, 1)) == -1
        # O(1) repeated access: update through the slot
        m2 = m.with_data(m.data.at[slot].set(9.0))
        np.testing.assert_allclose(
            m2.to_dense(), [[1, 0, 2], [0, 0, 9], [4, 5, 6]]
        )
        # csc too
        mc = st.from_dense(d, storage="csc")
        slot_c = int(mc.nnz_index(2, 1))
        assert float(mc.data[slot_c]) == 5.0

    def test_csvec_nnz_index(self):
        v = st.csvec(8, [1, 4, 6], [1.0, 2.0, 3.0])
        assert float(v.data[int(v.nnz_index(4))]) == 2.0
        assert int(v.nnz_index(5)) == -1

    def test_modify_revalidates(self):
        from sprs_tpu.errors import StructureError

        d = np.array([[1.0, 2.0], [0.0, 3.0]])
        m = st.from_dense(d)
        m2 = m.modify(lambda ip, ix, dat: (ip, ix, dat * 2))
        np.testing.assert_allclose(m2.to_dense(), d * 2)
        with pytest.raises(StructureError):
            # out-of-range index must be rejected on rebuild
            m.modify(
                lambda ip, ix, dat: (ip, ix.at[0].set(99), dat)
            )

    def test_csvec_iter_perm(self):
        v = st.csvec(4, [0, 2, 3], [1.0, 2.0, 3.0])
        perm = np.array([3, 2, 1, 0])
        got = list(v.iter_perm(perm))
        assert got == [(3, 1.0), (1, 2.0), (0, 3.0)]


class TestStructureView:
    def test_pattern_algebra(self):
        d = np.array([[1.0, 0.0, 2.0], [0.0, 3.0, 0.0], [4.0, 0.0, 5.0]])
        s = st.from_dense(d).structure_view()
        assert s.data.dtype == np.int8
        np.testing.assert_array_equal(
            np.asarray(s.to_dense()), (d != 0).astype(np.int8)
        )
        # structural product: values count contributing partial products
        prod = st.spgemm(
            s.astype(np.float32), s.astype(np.float32)
        )
        expect = (d != 0).astype(float) @ (d != 0).astype(float)
        np.testing.assert_allclose(np.asarray(prod.to_dense()), expect)
