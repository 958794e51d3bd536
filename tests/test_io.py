"""Matrix Market and binary persistence tests.

Mirrors the reference IO suite (io.rs tests + sprs/data/matrix_market
fixtures + sprs-tests serde adversarial tests): round-trips for every
symmetry mode and kind, malformed-file rejection, and validated binary
loads.
"""

import io

import numpy as np
import pytest

import sprs_tpu as st
from sprs_tpu.io import (
    MatrixMarketError,
    dumps,
    load_npz,
    loads,
    read_matrix_market,
    save_npz,
    write_matrix_market,
)
from sprs_tpu.utils.fixtures import dense_a, dense_spd

SIMPLE_MM = """%%MatrixMarket matrix coordinate real general
% comment line
3 4 4
1 1 1.5
2 3 -2.0
3 1 3.0
3 4 4.25
"""

SYMMETRIC_MM = """%%MatrixMarket matrix coordinate real symmetric
3 3 4
1 1 2.0
2 1 -1.0
3 2 -1.0
3 3 2.0
"""

SKEW_MM = """%%MatrixMarket matrix coordinate real skew-symmetric
3 3 2
2 1 1.5
3 2 -2.0
"""

HERMITIAN_MM = """%%MatrixMarket matrix coordinate complex hermitian
2 2 2
1 1 2.0 0.0
2 1 1.0 -3.0
"""

PATTERN_MM = """%%MatrixMarket matrix coordinate pattern general
2 3 3
1 1
1 3
2 2
"""

INTEGER_MM = """%%MatrixMarket matrix coordinate integer general
2 2 2
1 1 7
2 2 -3
"""


class TestRead:
    def test_general(self):
        t = loads(SIMPLE_MM)
        expect = np.zeros((3, 4))
        expect[0, 0] = 1.5
        expect[1, 2] = -2.0
        expect[2, 0] = 3.0
        expect[2, 3] = 4.25
        np.testing.assert_allclose(t.to_csr().to_dense(), expect)

    def test_symmetric_expansion(self):
        d = np.asarray(loads(SYMMETRIC_MM).to_csr().to_dense())
        expect = np.array([[2.0, -1, 0], [-1, 0, -1], [0, -1, 2]])
        np.testing.assert_allclose(d, expect)

    def test_skew_expansion(self):
        d = np.asarray(loads(SKEW_MM).to_csr().to_dense())
        expect = np.array([[0, -1.5, 0], [1.5, 0, 2.0], [0, -2.0, 0]])
        np.testing.assert_allclose(d, expect)

    def test_hermitian_expansion(self):
        d = np.asarray(loads(HERMITIAN_MM).to_csr().to_dense())
        expect = np.array([[2.0, 1 + 3j], [1 - 3j, 0]])
        np.testing.assert_allclose(d, expect)

    def test_pattern(self):
        d = np.asarray(loads(PATTERN_MM).to_csr().to_dense())
        np.testing.assert_allclose(d, [[1, 0, 1], [0, 1, 0]])

    def test_integer(self):
        t = loads(INTEGER_MM)
        assert t.dtype == np.int64
        np.testing.assert_array_equal(t.to_dense(), [[7, 0], [0, -3]])


class TestMalformed:
    @pytest.mark.parametrize(
        "text",
        [
            "%%NotMatrixMarket matrix coordinate real general\n1 1 1\n1 1 1.0\n",
            "%%MatrixMarket matrix array real general\n1 1\n1.0\n",
            "%%MatrixMarket matrix coordinate real sym\n1 1 1\n1 1 1.0\n",
            "%%MatrixMarket matrix coordinate real general\n1 1\n",  # bad size
            "%%MatrixMarket matrix coordinate real general\n2 2 2\n1 1 1.0\n",  # count short
            "%%MatrixMarket matrix coordinate real general\n2 2 1\n3 1 1.0\n",  # oor
            "%%MatrixMarket matrix coordinate real general\n2 2 1\n1 1\n",  # missing val
            "%%MatrixMarket matrix coordinate real symmetric\n2 3 1\n1 1 1.0\n",  # nonsquare sym
            "%%MatrixMarket matrix coordinate real skew-symmetric\n2 2 1\n1 1 1.0\n",  # skew diag
        ],
    )
    def test_rejected(self, text):
        with pytest.raises(MatrixMarketError):
            loads(text)


class TestWrite:
    def test_roundtrip_general(self):
        m = st.from_dense(dense_a())
        text = dumps(m)
        back = loads(text).to_csr()
        np.testing.assert_allclose(back.to_dense(), dense_a())

    def test_roundtrip_symmetric(self):
        s = dense_spd(8)
        m = st.from_dense(s)
        text = dumps(m, symmetry="symmetric")
        assert "symmetric" in text.splitlines()[0]
        back = loads(text).to_csr()
        np.testing.assert_allclose(back.to_dense(), s)
        # stores only the lower triangle
        n_stored = int(text.strip().splitlines()[2].split()[2])
        assert n_stored < np.count_nonzero(s)

    def test_roundtrip_integer(self):
        t = loads(INTEGER_MM)
        np.testing.assert_array_equal(
            loads(dumps(t)).to_dense(), t.to_dense()
        )

    def test_roundtrip_complex(self):
        d = np.array([[1 + 2j, 0], [0, 3 - 4j]])
        m = st.from_dense(d)
        back = loads(dumps(m)).to_csr()
        np.testing.assert_allclose(back.to_dense(), d)

    def test_pattern_write(self):
        m = st.from_dense(dense_a())
        text = dumps(m, kind="pattern")
        back = loads(text).to_csr()
        np.testing.assert_allclose(
            np.asarray(back.to_dense()) != 0, dense_a() != 0
        )

    def test_file_roundtrip(self, tmp_path):
        m = st.from_dense(dense_a())
        path = str(tmp_path / "mat.mm")
        write_matrix_market(path, m)
        back = read_matrix_market(path).to_csr()
        np.testing.assert_allclose(back.to_dense(), dense_a())


class TestNpz:
    def test_csmat_roundtrip(self, tmp_path):
        m = st.from_dense(dense_a(), storage="csc").with_cap(20)
        path = str(tmp_path / "m.npz")
        save_npz(path, m)
        back = load_npz(path)
        assert back.storage == "csc" and back.cap == 20
        np.testing.assert_allclose(back.to_dense(), dense_a())

    def test_csvec_roundtrip(self, tmp_path):
        v = st.csvec(9, [1, 4], [2.0, -1.0])
        path = str(tmp_path / "v.npz")
        save_npz(path, v)
        back = load_npz(path)
        np.testing.assert_allclose(back.to_dense(), v.to_dense())

    def test_adversarial_payload_rejected(self, tmp_path):
        # serde-adversarial analog (sprs-tests/tests/tests.rs): tampered
        # files must fail validation on load
        import numpy as np

        path = str(tmp_path / "bad.npz")
        np.savez(
            path,
            format="csmat",
            indptr=np.array([0, 2, 1], np.int32),  # non-monotone
            indices=np.array([0, 1], np.int32),
            data=np.array([1.0, 2.0]),
            shape=np.array([2, 2]),
            storage="csr",
            cap=2,
        )
        with pytest.raises(st.StructureError):
            load_npz(path)

    def test_unsorted_payload_rejected(self, tmp_path):
        path = str(tmp_path / "bad2.npz")
        np.savez(
            path,
            format="csmat",
            indptr=np.array([0, 2, 2], np.int32),
            indices=np.array([1, 0], np.int32),  # unsorted row
            data=np.array([1.0, 2.0]),
            shape=np.array([2, 2]),
            storage="csr",
            cap=2,
        )
        with pytest.raises(st.StructureError):
            load_npz(path)


class TestRandAndVisu:
    def test_rand_csr_reproducible(self):
        from sprs_tpu.utils import rand_csr

        a = rand_csr((50, 40), 0.05, seed=42)
        b = rand_csr((50, 40), 0.05, seed=42)
        a.check_structure()
        np.testing.assert_array_equal(a.indptr, b.indptr)
        np.testing.assert_array_equal(a.indices, b.indices)
        np.testing.assert_allclose(a.data, b.data)
        c = rand_csr((50, 40), 0.05, seed=43)
        assert not np.array_equal(np.asarray(a.indices), np.asarray(c.indices))
        # density in the right ballpark
        assert 0.01 < a.nnz / 2000 < 0.12

    def test_visu(self):
        from sprs_tpu.utils import nnz_image, nnz_pattern, nnz_pattern_str

        m = st.eye(3)
        pat = nnz_pattern(m)
        np.testing.assert_array_equal(pat, np.eye(3, dtype=bool))
        s = nnz_pattern_str(m)
        assert s.splitlines()[0] == "|x  |"
        img = nnz_image(m)
        assert img[0, 0] == 0 and img[0, 1] == 255


class TestCheckpoint:
    """Orbax pytree checkpointing (io/checkpoint.py)."""

    def test_roundtrip_csmat_tree(self, tmp_path):
        pytest.importorskip("orbax.checkpoint")
        from sprs_tpu.io import load_checkpoint, save_checkpoint

        d = np.array([[1.0, 0, 2], [0, 0, 3], [4, 5, 6]])
        m = st.from_dense(d)
        tree = {"mat": m, "x": np.arange(3.0)}
        save_checkpoint(str(tmp_path / "ck"), tree)
        back = load_checkpoint(str(tmp_path / "ck"))
        assert isinstance(back["mat"], type(m))
        np.testing.assert_allclose(
            np.asarray(back["mat"].to_dense()), d
        )
        np.testing.assert_allclose(np.asarray(back["x"]), np.arange(3.0))

    def test_corrupted_checkpoint_rejected(self, tmp_path):
        pytest.importorskip("orbax.checkpoint")
        import jax.numpy as jnp

        from sprs_tpu.errors import StructureError
        from sprs_tpu.formats.csmat import CsMat
        from sprs_tpu.io import load_checkpoint, save_checkpoint

        d = np.array([[1.0, 2.0], [3.0, 4.0]])
        m = st.from_dense(d)
        # corrupt: unsorted indices within a row
        bad = CsMat(
            m.indptr,
            jnp.asarray(np.asarray(m.indices)[::-1].copy()),
            m.data,
            m.shape,
            m.storage,
        )
        save_checkpoint(str(tmp_path / "ck2"), {"mat": bad})
        with pytest.raises(StructureError):
            load_checkpoint(str(tmp_path / "ck2"))

    def test_roundtrip_mixed_format_tree(self, tmp_path):
        pytest.importorskip("orbax.checkpoint")
        from sprs_tpu.io import load_checkpoint, save_checkpoint

        d = np.zeros((12, 12))
        for off in (-1, 0, 1):
            np.fill_diagonal(d[max(0, -off):, max(0, off):], 2.0 + off)
        m = st.from_dense(d)
        tree = {
            "dia": m.to_dia(),
            "ell": m.to_ell(),
            "bsr": m.to_bsr(4),
            "vec": st.csvec_from_dense(np.array([0.0, 1.0, 0.0, 2.0])),
        }
        save_checkpoint(str(tmp_path / "ck3"), tree)
        back = load_checkpoint(str(tmp_path / "ck3"))
        np.testing.assert_allclose(np.asarray(back["dia"].to_dense()), d)
        np.testing.assert_allclose(np.asarray(back["ell"].to_dense()), d)
        np.testing.assert_allclose(np.asarray(back["bsr"].to_dense()), d)
        np.testing.assert_allclose(
            np.asarray(back["vec"].to_dense()), [0.0, 1.0, 0.0, 2.0]
        )
