"""COO / triplet format: host-side builder plus device-side conversion.

The reference's ``TriMatBase`` (/root/reference/sprs/src/sparse.rs:228-242,
sparse/triplet.rs) is a *construction* format: duplicate entries are legal
and are summed when compressed to CSR/CSC
(triplet_iter.rs:127-224).  Here that splits into two pieces:

* :class:`TriMat` — a host-side growable builder backed by numpy (the
  natural home for incremental `add_triplet` mutation, which has no
  device analog), and
* :func:`coo_to_csmat` — a jittable conversion from padded device COO
  arrays to :class:`~sprs_tpu.formats.csmat.CsMat`, implemented with the
  shared sort-compress primitive (lexsort + duplicate-sum, exactly the
  semantics of triplet_iter.rs:143-194 including empty trailing rows).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..errors import ShapeError, StructureError
from .csmat import CSC, CSR, CsMat
from .util import INDEX_DTYPE, check_index_capacity, compress_coo


def coo_to_csmat(
    rows,
    cols,
    data,
    shape: Tuple[int, int],
    *,
    nnz=None,
    storage: str = CSR,
    cap: Optional[int] = None,
) -> CsMat:
    """Compress COO triplets into a CsMat, summing duplicates.

    ``rows``/``cols``/``data`` are capacity-padded device arrays; ``nnz``
    is the live count (defaults to the full length).  Fully jittable.
    """
    check_index_capacity(rows=shape[0], cols=shape[1], cap=cap)
    rows = jnp.asarray(rows, dtype=INDEX_DTYPE)
    cols = jnp.asarray(cols, dtype=INDEX_DTYPE)
    data = jnp.asarray(data)
    n = rows.shape[0]
    if nnz is None:
        nnz = n
    if cap is None:
        cap = max(n, 1)
    outer, inner = (rows, cols) if storage == CSR else (cols, rows)
    n_outer = shape[0] if storage == CSR else shape[1]
    n_inner = shape[1] if storage == CSR else shape[0]
    res = compress_coo(
        rows=outer,
        cols=inner,
        value_channels=(data,),
        nvalid=nnz,
        n_outer=n_outer,
        n_inner=n_inner,
        out_cap=cap,
    )
    return CsMat(res.indptr, res.indices, res.values[0], tuple(shape), storage)


class TriMat:
    """Host-side triplet builder (triplet.rs:86-177 surface).

    Duplicates allowed; ``to_csr``/``to_csc`` sum them.  All mutation is
    eager numpy; the compression runs through the jittable device path so
    the builder and traced code share one implementation.
    """

    def __init__(self, shape: Tuple[int, int], dtype=np.float64):
        check_index_capacity(rows=shape[0], cols=shape[1])
        self.shape = tuple(shape)
        self._rows: list = []
        self._cols: list = []
        self._data: list = []
        self.dtype = np.dtype(dtype)

    @classmethod
    def from_triplets(cls, shape, rows, cols, data) -> "TriMat":
        data = np.asarray(data)
        m = cls(shape, dtype=data.dtype)
        rows = np.asarray(rows)
        cols = np.asarray(cols)
        if not (rows.shape == cols.shape == data.shape):
            raise ShapeError("triplet arrays must have equal length")
        if rows.size:
            if rows.min() < 0 or rows.max() >= shape[0]:
                raise StructureError.out_of_range("row index out of range")
            if cols.min() < 0 or cols.max() >= shape[1]:
                raise StructureError.out_of_range("col index out of range")
        m._rows = list(rows.tolist())
        m._cols = list(cols.tolist())
        m._data = list(data.tolist())
        return m

    # -- mutation ------------------------------------------------------------
    def add_triplet(self, row: int, col: int, val) -> None:
        if not (0 <= row < self.shape[0]):
            raise StructureError.out_of_range(f"row {row} out of range")
        if not (0 <= col < self.shape[1]):
            raise StructureError.out_of_range(f"col {col} out of range")
        self._rows.append(row)
        self._cols.append(col)
        self._data.append(val)

    def set_triplet(self, loc: int, row: int, col: int, val) -> None:
        """Overwrite the triplet at position ``loc`` (triplet.rs:313-323)."""
        self._rows[loc] = row
        self._cols[loc] = col
        self._data[loc] = val

    def find_locations(self, row: int, col: int):
        """All triplet positions matching (row, col) (triplet.rs:221-234)."""
        return [
            k
            for k, (r, c) in enumerate(zip(self._rows, self._cols))
            if r == row and c == col
        ]

    def reserve(self, additional: int) -> None:
        pass  # python lists grow automatically; kept for API parity

    # -- properties -------------------------------------------------------------
    @property
    def nnz(self) -> int:
        return len(self._rows)

    @property
    def rows(self) -> int:
        return self.shape[0]

    @property
    def cols(self) -> int:
        return self.shape[1]

    def row_inds(self) -> np.ndarray:
        return np.asarray(self._rows, dtype=np.int32)

    def col_inds(self) -> np.ndarray:
        return np.asarray(self._cols, dtype=np.int32)

    def data(self) -> np.ndarray:
        return np.asarray(self._data, dtype=self.dtype)

    def transpose_view(self) -> "TriMat":
        """O(1) transpose (triplet.rs:237-245)."""
        t = TriMat((self.shape[1], self.shape[0]), dtype=self.dtype)
        t._rows = self._cols
        t._cols = self._rows
        t._data = self._data
        return t

    # -- conversion -----------------------------------------------------------
    def _to_cs(self, storage: str, cap: Optional[int]) -> CsMat:
        n = max(self.nnz, 1)
        rows = np.zeros(n, np.int32)
        cols = np.zeros(n, np.int32)
        vals = np.zeros(n, self.dtype)
        rows[: self.nnz] = self.row_inds()
        cols[: self.nnz] = self.col_inds()
        vals[: self.nnz] = self.data()
        return coo_to_csmat(
            rows,
            cols,
            vals,
            self.shape,
            nnz=self.nnz,
            storage=storage,
            cap=cap,
        )

    def to_csr(self, cap: Optional[int] = None) -> CsMat:
        return self._to_cs(CSR, cap)

    def to_csc(self, cap: Optional[int] = None) -> CsMat:
        return self._to_cs(CSC, cap)

    def to_dense(self) -> np.ndarray:
        out = np.zeros(self.shape, dtype=self.dtype)
        for r, c, v in zip(self._rows, self._cols, self._data):
            out[r, c] += v
        return out

    def __repr__(self):
        return f"TriMat(shape={self.shape}, nnz={self.nnz}, dtype={self.dtype})"
