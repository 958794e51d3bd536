"""DIA (diagonal) sparse format — the zero-gather SpMV layout for banded
matrices.

The reference keeps banded matrices in CSR like everything else (its heat
example builds a pentadiagonal Laplacian into CSR,
/root/reference/sprs/examples/heat.rs:45-80).  On TPU, banded structure
deserves its own format: storing the k populated diagonals densely turns
SpMV into

    y[i] = Σ_d  data[d, i] * x[i + offset_d]

— k shifted reads of ``x`` (static slices!), k multiplies, k adds.  No
gather, no scatter, no segment ids: pure VPU streaming at HBM
bandwidth, the speed-of-light kernel for this structure.  The framework's
RCM ordering (sprs_tpu.linalg.ordering, mirroring ordering.rs:440-526)
exists precisely to *create* small bandwidth, so DIA is its natural
companion: RCM-permute, convert to DIA, solve.

Layout: ``offsets`` is a static tuple of diagonal offsets (col - row);
``data[d, i] = A[i, i + offsets[d]]`` (row-indexed convention, zero where
out of range).  Rows are padded to a multiple of 8.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import ShapeError
from .csmat import CSR, CsMat
from .util import INDEX_DTYPE, is_concrete


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DiaMat:
    """Diagonal-storage matrix.

    Leaves: ``data (n_diags, rows_pad)``.  Static: ``offsets`` (tuple of
    ints, col-row), ``shape``.
    """

    data: jax.Array
    offsets: Tuple[int, ...]
    shape: Tuple[int, int]

    def tree_flatten(self):
        return (self.data,), (self.offsets, self.shape)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        offsets, shape = aux
        (data,) = leaves
        return cls(data, offsets, shape)

    @property
    def rows(self) -> int:
        return self.shape[0]

    @property
    def cols(self) -> int:
        return self.shape[1]

    @property
    def rows_pad(self) -> int:
        return self.data.shape[1]

    @property
    def n_diags(self) -> int:
        return len(self.offsets)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def bandwidth(self) -> int:
        return max(abs(o) for o in self.offsets) if self.offsets else 0

    def to_dense(self) -> jax.Array:
        out = jnp.zeros(self.shape, self.data.dtype)
        r = jnp.arange(self.rows, dtype=INDEX_DTYPE)
        for d, off in enumerate(self.offsets):
            c = r + off
            ok = (c >= 0) & (c < self.cols)
            out = out.at[
                jnp.where(ok, r, 0), jnp.where(ok, c, 0)
            ].add(jnp.where(ok, self.data[d, : self.rows], 0))
        return out

    def __repr__(self):
        return (
            f"DiaMat(shape={self.shape}, n_diags={self.n_diags}, "
            f"bandwidth={self.bandwidth}, dtype={self.dtype})"
        )


def dia_from_csmat(
    mat: CsMat, *, max_diags: Optional[int] = None, row_align: int = 8
) -> DiaMat:
    """Host-side CSR → DIA conversion (concrete matrices only).

    Raises ShapeError when the matrix populates more than ``max_diags``
    distinct diagonals (the caller should stay in CSR/ELL then).
    """
    m = mat.to_csr()
    if not is_concrete(m.indptr):
        raise ShapeError("dia_from_csmat requires a concrete matrix")
    nnz = int(m.nnz)
    indptr = np.asarray(m.indptr)
    cols_arr = np.asarray(m.indices)[:nnz]
    data = np.asarray(m.data)[:nnz]
    rows_arr = np.repeat(
        np.arange(m.rows, dtype=np.int64), np.diff(indptr).astype(np.int64)
    )
    offs = np.unique(cols_arr.astype(np.int64) - rows_arr)
    if max_diags is not None and offs.size > max_diags:
        raise ShapeError(
            f"matrix has {offs.size} diagonals > max_diags={max_diags}"
        )
    rows_pad = _round_up(max(m.rows, 1), row_align)
    dia = np.zeros((max(offs.size, 1), rows_pad), dtype=data.dtype)
    dpos = np.searchsorted(offs, cols_arr.astype(np.int64) - rows_arr)
    dia[dpos, rows_arr] = data
    return DiaMat(
        jnp.asarray(dia),
        tuple(int(o) for o in offs) if offs.size else (0,),
        m.shape,
    )


def dia_to_csmat(dia: DiaMat) -> CsMat:
    """Host-side DIA → CSR conversion (structural entries = every
    in-bounds diagonal slot, matching ``dia_from_csmat``'s layout)."""
    import numpy as np

    from .csmat import csmat

    rows, cols = dia.shape
    data = np.asarray(dia.data)
    rs, cs, vs = [], [], []
    for d, off in enumerate(dia.offsets):
        r0 = max(0, -off)
        r1 = min(rows, cols - off)
        if r1 <= r0:
            continue
        rr = np.arange(r0, r1)
        rs.append(rr)
        cs.append(rr + off)
        vs.append(data[d, r0:r1])
    if rs:
        rr = np.concatenate(rs)
        cc = np.concatenate(cs)
        vv = np.concatenate(vs)
    else:
        rr = np.zeros(0, np.int64)
        cc = np.zeros(0, np.int64)
        vv = np.zeros(0, data.dtype)
    order = np.lexsort((cc, rr))
    rr, cc, vv = rr[order], cc[order], vv[order]
    indptr = np.zeros(rows + 1, np.int64)
    np.add.at(indptr, rr + 1, 1)
    indptr = np.cumsum(indptr)
    return csmat(
        (rows, cols),
        indptr.astype(np.int32),
        cc.astype(np.int32),
        vv,
        validate=False,
    )


def n_diags_of(mat: CsMat) -> int:
    """Number of populated diagonals (host-side dispatch heuristic)."""
    m = mat.to_csr()
    nnz = int(m.nnz)
    cols_arr = np.asarray(m.indices)[:nnz].astype(np.int64)
    rows_arr = np.repeat(
        np.arange(m.rows, dtype=np.int64),
        np.diff(np.asarray(m.indptr)).astype(np.int64),
    )
    return int(np.unique(cols_arr - rows_arr).size)


def _padded_x(dia: DiaMat, x: jax.Array):
    """Pad x so every shifted read is in range; return (xp, left_pad)."""
    min_off = min(dia.offsets)
    max_off = max(dia.offsets)
    left = max(0, -min_off)
    right = max(0, dia.rows_pad - 1 + max_off - (dia.cols - 1))
    xp = jnp.pad(x, (left, right))
    return xp, left


def dia_spmv(dia: DiaMat, x: jax.Array) -> jax.Array:
    """y = A @ x, XLA path: k shifted slices, fused multiply-add."""
    x = jnp.asarray(x)
    if x.shape != (dia.cols,):
        raise ShapeError(f"dia_spmv: A is {dia.shape}, x is {x.shape}")
    xp, left = _padded_x(dia, x)
    y = jnp.zeros((dia.rows_pad,), jnp.promote_types(dia.dtype, x.dtype))
    for d, off in enumerate(dia.offsets):
        xs = jax.lax.dynamic_slice(xp, (left + off,), (dia.rows_pad,))
        y = y + dia.data[d] * xs
    return y[: dia.rows]


def dia_spmm(dia: DiaMat, x: jax.Array) -> jax.Array:
    """Y = A @ X for dense X (cols, k): shifted row-block reads."""
    x = jnp.asarray(x)
    if x.ndim != 2 or x.shape[0] != dia.cols:
        raise ShapeError(f"dia_spmm: A is {dia.shape}, X is {x.shape}")
    k = x.shape[1]
    min_off = min(dia.offsets)
    max_off = max(dia.offsets)
    left = max(0, -min_off)
    right = max(0, dia.rows_pad - 1 + max_off - (dia.cols - 1))
    xp = jnp.pad(x, ((left, right), (0, 0)))
    y = jnp.zeros(
        (dia.rows_pad, k), jnp.promote_types(dia.dtype, x.dtype)
    )
    for d, off in enumerate(dia.offsets):
        xs = jax.lax.dynamic_slice(xp, (left + off, 0), (dia.rows_pad, k))
        y = y + dia.data[d][:, None] * xs
    return y[: dia.rows]
