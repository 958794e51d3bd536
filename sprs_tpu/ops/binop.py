"""Sparse binary operations (add/sub/elementwise) via merge-compress.

The reference merges two compressed matrices per outer dimension with a
two-pointer "nnz_or_zip" iterator into an nnz(A)+nnz(B)-capacity output
(/root/reference/sprs/src/sparse/binop.rs:178-271).  The TPU-native
formulation concatenates both operands' COO triples with *two value
channels* (lhs contributions ride channel 0, rhs channel 1), runs the
shared sort-compress once, and applies the binary op to the per-key
channel sums.  One sort replaces the per-row merge loops; the result is
CSR-sorted by construction.

Correctness contract, same as the reference (binop.rs:172): the operator
must satisfy ``op(0, 0) == 0``, because unstored entries are implicit
zeros.  Stored zeros produced by the op are kept (capacity discipline);
``CsMat.compact()`` prunes them like the reference's zero-dropping.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from ..errors import ShapeError
from ..formats.csmat import CsMat
from ..formats.util import compress_coo, is_concrete, valid_mask


def csmat_binop(
    a: CsMat,
    b: CsMat,
    op: Callable,
    *,
    out_cap: Optional[int] = None,
) -> CsMat:
    """Elementwise ``op`` over the union pattern of A and B.

    Result storage follows the lhs (rhs is reoriented if needed, matching
    binop.rs:52-64).  ``out_cap`` defaults to nnz(A)+nnz(B) — the exact
    union bound — tightened to the true union size on concrete inputs.
    """
    if a.shape != b.shape:
        raise ShapeError(f"binop: shape mismatch {a.shape} vs {b.shape}")
    if a.storage != b.storage:
        b = b.to_other_storage()

    cap = a.cap + b.cap
    outer = jnp.concatenate([a.outer_ids(), b.outer_ids()])
    inner = jnp.concatenate([a.indices, b.indices])
    va = jnp.concatenate([a.data, jnp.zeros((b.cap,), a.data.dtype)])
    vb = jnp.concatenate([jnp.zeros((a.cap,), b.data.dtype), b.data])
    # outer_ids already sentinel out-of-range for padding of each operand
    n_outer = a.outer_dims

    concrete = is_concrete(a.indptr, b.indptr)
    if out_cap is None:
        out_cap = max(
            (int(a.nnz) + int(b.nnz)) if concrete else cap, 1
        )
    res = compress_coo(
        rows=outer,
        cols=inner,
        value_channels=(va, vb),
        nvalid=cap,
        n_outer=n_outer,
        n_inner=a.inner_dims,
        out_cap=out_cap,
    )
    out = op(res.values[0], res.values[1])
    out = jnp.where(
        valid_mask(out_cap, res.nnz), out, jnp.zeros((), out.dtype)
    )
    c = CsMat(res.indptr, res.indices, out, a.shape, a.storage)
    if concrete:
        c = c.with_cap(max(int(res.required_nnz), 1))
    return c


def add(a: CsMat, b: CsMat, **kw) -> CsMat:
    return csmat_binop(a, b, jnp.add, **kw)


def sub(a: CsMat, b: CsMat, **kw) -> CsMat:
    return csmat_binop(a, b, jnp.subtract, **kw)


def mul_elementwise(a: CsMat, b: CsMat, **kw) -> CsMat:
    """Hadamard product over the union pattern (binop.rs:115-130)."""
    return csmat_binop(a, b, jnp.multiply, **kw)


def maximum(a: CsMat, b: CsMat, **kw) -> CsMat:
    return csmat_binop(a, b, jnp.maximum, **kw)


def minimum(a: CsMat, b: CsMat, **kw) -> CsMat:
    return csmat_binop(a, b, jnp.minimum, **kw)


def mul_dense(a: CsMat, dense) -> CsMat:
    """Hadamard product with a dense matrix: keeps A's pattern.

    (A ∘ D)_ij = a_ij · d_ij — only stored entries can be nonzero, so the
    result reuses A's structure with gathered dense factors.
    """
    dense = jnp.asarray(dense)
    if dense.shape != a.shape:
        raise ShapeError(f"mul_dense: {a.shape} vs {dense.shape}")
    rows, cols, _ = a.coo_arrays()
    r = jnp.minimum(rows, a.shape[0] - 1)
    c = jnp.minimum(cols, a.shape[1] - 1)
    factor = dense[r, c]
    return a.with_data(
        jnp.where(a.live_mask(), a.data * factor, jnp.zeros((), a.data.dtype))
    )


def add_dense(a: CsMat, dense) -> jnp.ndarray:
    """Sparse + dense densifies (binop.rs:279-433)."""
    dense = jnp.asarray(dense)
    if dense.shape != a.shape:
        raise ShapeError(f"add_dense: {a.shape} vs {dense.shape}")
    return a.to_dense() + dense
