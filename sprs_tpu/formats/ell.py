"""ELLPACK (padded-row) sparse format — the TPU-friendly SpMV layout.

The reference stores matrices only as CSR/CSC
(/root/reference/sprs/src/sparse.rs:94-129); its SpMV kernels are scalar
row sweeps (prod.rs:74-127).  On TPU the ragged CSR entry stream is the
enemy: the VPU wants rectangular (sublane × lane) tiles.  ELL pads every
row to a common ``width`` so that

* ``data``/``indices`` are dense ``(rows_pad, width)`` arrays that tile
  onto the 8×128 VPU registers with no ragged tail, and
* SpMV becomes ``sum(data * x[indices], axis=1)`` — one gather and one
  multiply-reduce, no segment ids, no scatter — which XLA compiles to a
  bandwidth-bound fused loop and which the Pallas kernel in
  ``sprs_tpu.ops.pallas`` pipelines block-by-block through VMEM.

Padding discipline: pad slots carry ``indices == 0`` (an always-valid
gather address) and ``data == 0`` (contributes nothing).  Rows are padded
to a multiple of ``row_align`` so row-blocked kernels never see a partial
tile.

ELL wastes memory when row lengths are skewed (width = max row nnz); the
dispatcher in ``sprs_tpu.ops.prod`` only chooses it when the padding
overhead is modest, mirroring how the reference picks kernels by shape
heuristics (csmat.rs:2002-2047).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..errors import ShapeError
from .csmat import CSR, CsMat
from .util import INDEX_DTYPE, is_concrete


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class EllMat:
    """Row-major ELLPACK matrix.

    Leaves: ``indices (rows_pad, width) i32``, ``data (rows_pad, width)``.
    Static: ``shape`` (logical, un-padded).  Rows beyond ``shape[0]`` are
    all-padding.
    """

    indices: jax.Array
    data: jax.Array
    shape: Tuple[int, int]

    def tree_flatten(self):
        return (self.indices, self.data), (self.shape,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        (shape,) = aux
        indices, data = leaves
        return cls(indices, data, shape)

    @property
    def rows(self) -> int:
        return self.shape[0]

    @property
    def cols(self) -> int:
        return self.shape[1]

    @property
    def rows_pad(self) -> int:
        return self.indices.shape[0]

    @property
    def width(self) -> int:
        return self.indices.shape[1]

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def nnz(self):
        """Count of structurally-live slots (data may still hold zeros)."""
        return jnp.sum((self.data != 0).astype(INDEX_DTYPE))

    def to_dense(self) -> jax.Array:
        out = jnp.zeros((self.rows_pad, self.cols), dtype=self.data.dtype)
        rows = jnp.repeat(
            jnp.arange(self.rows_pad, dtype=INDEX_DTYPE)[:, None],
            self.width,
            axis=1,
        )
        out = out.at[rows, self.indices].add(self.data)
        return out[: self.rows]

    def __repr__(self):
        return (
            f"EllMat(shape={self.shape}, width={self.width}, "
            f"rows_pad={self.rows_pad}, dtype={self.data.dtype})"
        )


def ell_from_csmat(
    mat: CsMat,
    *,
    width: Optional[int] = None,
    row_align: int = 8,
) -> EllMat:
    """Convert a CSR matrix to ELL.

    ``width`` must be >= the max row nnz; when omitted it is computed on
    the host (concrete matrices only — traced callers must pass it, the
    usual static-shape contract).  Jittable for a fixed ``width``.
    """
    if not mat.is_csr:
        mat = mat.to_csr()
    if width is None:
        if not is_concrete(mat.indptr):
            raise ShapeError(
                "ell_from_csmat under tracing requires an explicit width"
            )
        width = max(int(mat.max_outer_nnz()), 1)
    rows_pad = _round_up(max(mat.rows, 1), row_align)

    outer = mat.outer_ids()  # padding -> rows (out of range)
    # Slot within the row: entry position minus the row's start offset.
    starts = jnp.concatenate([mat.indptr, mat.indptr[-1:]])  # guard gather
    slot = jnp.arange(mat.cap, dtype=INDEX_DTYPE) - starts[
        jnp.minimum(outer, mat.rows)
    ]
    live = mat.live_mask() & (slot < width)
    r = jnp.where(live, outer, rows_pad)  # drop sentinel
    s = jnp.where(live, slot, 0)

    idx = jnp.zeros((rows_pad, width), dtype=INDEX_DTYPE)
    idx = idx.at[r, s].set(mat.indices, mode="drop")
    dat = jnp.zeros((rows_pad, width), dtype=mat.data.dtype)
    dat = dat.at[r, s].set(mat.data, mode="drop")
    return EllMat(idx, dat, mat.shape)


def ell_to_csmat(ell: EllMat, *, cap: Optional[int] = None) -> CsMat:
    """Back-convert to CSR, dropping explicit-zero pad slots."""
    live = ell.data != 0
    counts = jnp.sum(live.astype(INDEX_DTYPE), axis=1)[: ell.rows]
    indptr = jnp.concatenate(
        [jnp.zeros((1,), INDEX_DTYPE), jnp.cumsum(counts, dtype=INDEX_DTYPE)]
    )
    if cap is None:
        if is_concrete(ell.data):
            cap = max(int(jnp.sum(live)), 1)
        else:
            cap = ell.rows_pad * ell.width
    # Stable-compact live entries in row-major order.
    flat_live = live[: ell.rows].reshape(-1)
    order = jnp.argsort(~flat_live, stable=True)
    take = order[
        jnp.minimum(jnp.arange(cap, dtype=INDEX_DTYPE), order.shape[0] - 1)
    ]
    ok = jnp.arange(cap, dtype=INDEX_DTYPE) < indptr[-1]
    flat_idx = ell.indices[: ell.rows].reshape(-1)
    flat_dat = ell.data[: ell.rows].reshape(-1)
    indices = jnp.where(ok, flat_idx[take], 0)
    data = jnp.where(ok, flat_dat[take], jnp.zeros((), ell.data.dtype))
    return CsMat(indptr, indices, data, ell.shape, CSR)


def ell_spmv(ell: EllMat, x: jax.Array) -> jax.Array:
    """y = A @ x, pure-XLA ELL path (gather + row-reduce, no scatter)."""
    x = jnp.asarray(x)
    if x.shape != (ell.cols,):
        raise ShapeError(f"ell_spmv: A is {ell.shape}, x is {x.shape}")
    y = jnp.sum(ell.data * x[ell.indices], axis=1)
    return y[: ell.rows]


def ell_spmm(ell: EllMat, x: jax.Array) -> jax.Array:
    """Y = A @ X for dense X of shape (cols, k)."""
    x = jnp.asarray(x)
    if x.ndim != 2 or x.shape[0] != ell.cols:
        raise ShapeError(f"ell_spmm: A is {ell.shape}, X is {x.shape}")
    y = jnp.einsum("rw,rwk->rk", ell.data, x[ell.indices])
    return y[: ell.rows]


def ell_overhead(mat: CsMat) -> float:
    """Padding overhead ratio of converting ``mat`` to ELL: padded slots /
    live slots.  The dispatch heuristic keeps ELL when this is small."""
    nnz = max(int(mat.nnz), 1)
    width = max(int(mat.max_outer_nnz()), 1)
    rows_pad = _round_up(max(mat.rows, 1), 8)
    return rows_pad * width / nnz - 1.0
