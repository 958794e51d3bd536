"""Operation layer: kernels and operator dispatch.

Dispatch mirrors the reference's operator routing
(/root/reference/sprs/src/sparse/csmat.rs:1866-2159, vec.rs:1084-1131)
with Python conventions: ``@`` is the linear-algebra product, ``+``/``-``
are sparse merges, ``*`` is elementwise/scalar.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..errors import ShapeError
from ..formats.csmat import CsMat
from ..formats.csvec import CsVec
from ..formats.util import INDEX_DTYPE
from .binop import (
    add_dense,
    csmat_binop,
    maximum,
    minimum,
    mul_dense,
    mul_elementwise,
)
from .binop import add as _add_sparse
from .binop import sub as _sub_sparse
from .construct import block_diag, bmat, hstack, vstack
from .kron import kronecker_product
from .permutation import (
    Permutation,
    permute_cols,
    permute_rows,
    transform_mat_papt,
    transform_mat_paq,
)
from .prod import dense_matmul_sparse, prepare_spmm, prepare_spmv, spmm, spmv
from .spgemm import spgemm, spgemm_caps, spgemm_dense, spgemm_dense_bsr
from .symmetry import is_symmetric
from . import batch, pallas
from .batch import (
    BatchedCsMat,
    BatchedLdl,
    batch_spgemm,
    batch_spmm,
    batch_spmv,
)

__all__ = [
    "matmul",
    "rmatmul",
    "add",
    "sub",
    "elementwise_mul",
    "spmv",
    "spmm",
    "prepare_spmm",
    "prepare_spmv",
    "spgemm",
    "spgemm_caps",
    "spgemm_dense",
    "spgemm_dense_bsr",
    "dense_matmul_sparse",
    "csmat_binop",
    "mul_elementwise",
    "mul_dense",
    "add_dense",
    "maximum",
    "minimum",
    "kronecker_product",
    "vstack",
    "hstack",
    "block_diag",
    "bmat",
    "Permutation",
    "permute_rows",
    "permute_cols",
    "transform_mat_papt",
    "transform_mat_paq",
    "is_symmetric",
    "assign_to_dense",
    "BatchedCsMat",
    "BatchedLdl",
    "batch_spgemm",
    "batch_spmm",
    "batch_spmv",
]


def _mat_times_csvec(mat: CsMat, v: CsVec, **kw) -> CsVec:
    """A @ v for sparse v: SpGEMM against the n×1 column view, then the
    result column is reinterpreted as a CsVec (vec.rs:1104-1131)."""
    if mat.cols != v.dim:
        raise ShapeError(f"matmul: {mat.shape} @ ({v.dim},)")
    c = spgemm(mat.to_csr(), v.col_view().to_csr(), **kw).to_csr()
    outer = c.outer_ids()
    live = c.live_mask()
    return CsVec(
        jnp.where(live, jnp.minimum(outer, mat.rows - 1), 0).astype(
            INDEX_DTYPE
        ),
        c.data,
        c.indptr[-1].astype(INDEX_DTYPE),
        mat.rows,
    )


def _csvec_times_mat(v: CsVec, mat: CsMat, **kw) -> CsVec:
    """vᵀ @ A via the 1×n row view (vec.rs:1084-1101)."""
    if mat.rows != v.dim:
        raise ShapeError(f"matmul: ({v.dim},) @ {mat.shape}")
    c = spgemm(v.row_view(), mat.to_csr(), **kw).to_csr()
    return CsVec(
        c.indices, c.data, c.indptr[-1].astype(INDEX_DTYPE), mat.cols
    )


def matmul(lhs, rhs, **kw):
    """Linear-algebra product dispatch (``@`` operator).

    BSR operands stay in the MXU-native regime: BSR @ dense runs the
    grouped block matmul, and sparse products with a BSR side run the
    compaction-free dense route and RETURN BSR — chained products
    (e.g. ``(a @ b) @ c`` after ``spgemm(..., out_format='auto')``)
    never pay the per-element CSR scatter.

    BSR @ dense dispatches the pure-XLA kernel (safe for any block
    layout); on TPU, ``ops.pallas.bsr_spmm_pallas`` is the measured
    1.1-1.3x fast path for matrices holding the conversion invariants
    (every block row populated, blocks row-sorted — true for all
    ``bsr_from_*``/``spgemm_dense_bsr`` outputs, not guaranteed after
    ``slice_block_rows``).
    """
    from ..formats.bsr import BsrMat, bsr_spmm_xla

    if isinstance(lhs, BsrMat):
        if isinstance(rhs, (CsMat, BsrMat)):
            return spgemm_dense_bsr(
                lhs, rhs, block_size=lhs.block_size, **kw
            )
        rhs = jnp.asarray(rhs)
        if rhs.ndim == 1:
            return bsr_spmm_xla(lhs, rhs[:, None])[:, 0]
        if rhs.ndim == 2:
            return bsr_spmm_xla(lhs, rhs)
        raise ShapeError(f"matmul: rhs ndim {rhs.ndim} unsupported")
    if isinstance(lhs, CsMat):
        if isinstance(rhs, BsrMat):
            return spgemm_dense_bsr(
                lhs, rhs, block_size=rhs.block_size, **kw
            )
        if isinstance(rhs, CsMat):
            return spgemm(lhs, rhs, **kw)
        if isinstance(rhs, CsVec):
            return _mat_times_csvec(lhs, rhs, **kw)
        rhs = jnp.asarray(rhs)
        if rhs.ndim == 1:
            return spmv(lhs, rhs)
        if rhs.ndim == 2:
            return spmm(lhs, rhs)
        raise ShapeError(f"matmul: rhs ndim {rhs.ndim} unsupported")
    raise TypeError(f"matmul: unsupported lhs {type(lhs)}")


def rmatmul(lhs, rhs: CsMat):
    """lhs @ sparse-rhs for dense or CsVec lhs."""
    if isinstance(lhs, CsVec):
        return _csvec_times_mat(lhs, rhs)
    return dense_matmul_sparse(jnp.asarray(lhs), rhs)


def add(a, b, **kw):
    if isinstance(a, CsMat) and isinstance(b, CsMat):
        return _add_sparse(a, b, **kw)
    if isinstance(a, CsMat):
        return add_dense(a, b)
    return add_dense(b, a)


def sub(a, b, **kw):
    if isinstance(a, CsMat) and isinstance(b, CsMat):
        return _sub_sparse(a, b, **kw)
    if isinstance(a, CsMat):
        return a.to_dense() - jnp.asarray(b)
    return jnp.asarray(a) - b.to_dense()


def elementwise_mul(a, b, **kw):
    """``*`` operator: scalar scale, sparse∘sparse, or sparse∘dense."""
    if isinstance(a, CsMat) and isinstance(b, CsMat):
        return mul_elementwise(a, b, **kw)
    if isinstance(a, CsMat):
        b_arr = jnp.asarray(b)
        if b_arr.ndim == 0:
            return a.scale(b_arr)
        if b_arr.ndim == 2:
            return mul_dense(a, b_arr)
        raise ShapeError("elementwise mul: 1-D dense operand unsupported")
    return elementwise_mul(b, a, **kw)


def assign_to_dense(dense, mat: CsMat):
    """Scatter a sparse matrix's entries into a dense array, overwriting
    stored positions only (to_dense.rs:12-48: no pre-zeroing)."""
    dense = jnp.asarray(dense)
    if dense.shape != mat.shape:
        raise ShapeError(f"assign_to_dense: {dense.shape} vs {mat.shape}")
    rows, cols, vals = mat.coo_arrays()
    live = mat.live_mask()
    r = jnp.where(live, jnp.minimum(rows, mat.shape[0] - 1), mat.shape[0])
    c = jnp.minimum(cols, mat.shape[1] - 1)
    return dense.at[r, c].set(vals, mode="drop")
