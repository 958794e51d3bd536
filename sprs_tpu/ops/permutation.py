"""Permutations and permuted matrix transforms.

Reference: /root/reference/sprs/src/sparse/permutation.rs.  A
``Permutation`` stores both the forward map and its inverse
(permutation.rs:11-31); the identity variant is free.  Conventions match
the reference:

* ``perm @ x``      → y with y[i] = x[perm[i]]  (permutation.rs:255-293)
* ``permute_rows(A, p)``  → B with B[i, :] = A[p[i], :]
* ``permute_cols(A, p)``  → B with B[:, j] = A[:, p[j]]
* ``transform_mat_papt(A, p)`` → P·A·Pᵀ, i.e. B[i, j] = A[p[i], p[j]]
  (permutation.rs:439-494) — the symmetric-ordering transform used by
  fill-reducing orderings before LDLᵀ.
* ``transform_mat_paq(A, p, q)`` → B[i, j] = A[p[i], q[j]].

Matrix transforms relabel the COO coordinates through the inverse map
and re-establish CSR order with the shared sort-compress — outer
gather + inner relabel-and-resort in one pass (the reference does these
as two specialized loops, permutation.rs:296-404).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import ShapeError, StructureError
from ..formats.csmat import CsMat
from ..formats.util import INDEX_DTYPE, compress_coo, is_concrete


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Permutation:
    """Dense permutation with precomputed inverse."""

    perm: jax.Array  # forward map
    inv: jax.Array  # inverse map

    def tree_flatten(self):
        return (self.perm, self.inv), ()

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @classmethod
    def identity(cls, n: int) -> "Permutation":
        i = jnp.arange(n, dtype=INDEX_DTYPE)
        return cls(i, i)

    @classmethod
    def from_array(cls, perm, *, check: bool = True) -> "Permutation":
        perm = jnp.asarray(perm, dtype=INDEX_DTYPE)
        if check and is_concrete(perm):
            p = np.asarray(perm)
            if sorted(p.tolist()) != list(range(p.shape[0])):
                raise StructureError.out_of_range(
                    "not a permutation of 0..n"
                )
        n = perm.shape[0]
        inv = (
            jnp.zeros((n,), INDEX_DTYPE)
            .at[perm]
            .set(jnp.arange(n, dtype=INDEX_DTYPE))
        )
        return cls(perm, inv)

    @property
    def dim(self) -> int:
        return self.perm.shape[0]

    def inverse(self) -> "Permutation":
        return Permutation(self.inv, self.perm)

    def apply_vec(self, x: jax.Array) -> jax.Array:
        """y[i] = x[perm[i]]."""
        return jnp.asarray(x)[self.perm]

    def apply_inv_vec(self, x: jax.Array) -> jax.Array:
        return jnp.asarray(x)[self.inv]

    def __matmul__(self, x):
        return self.apply_vec(x)

    def compose(self, other: "Permutation") -> "Permutation":
        """(self ∘ other): apply ``other`` first, then ``self``."""
        return Permutation(other.perm[self.perm], self.inv[other.inv])

    def __repr__(self):
        return f"Permutation(dim={self.dim})"


def _relabel(mat: CsMat, row_map: Optional[jax.Array], col_map: Optional[jax.Array]) -> CsMat:
    """Relabel COO coordinates and re-sort into the original storage."""
    rows, cols, vals = mat.coo_arrays()
    live = mat.live_mask()
    rows = jnp.minimum(rows, mat.shape[0] - 1)
    cols = jnp.minimum(cols, mat.shape[1] - 1)
    if row_map is not None:
        rows = row_map[rows]
    if col_map is not None:
        cols = col_map[cols]
    outer, inner = (rows, cols) if mat.is_csr else (cols, rows)
    n_outer, n_inner = (
        (mat.shape[0], mat.shape[1]) if mat.is_csr else (mat.shape[1], mat.shape[0])
    )
    outer = jnp.where(live, outer, n_outer)
    res = compress_coo(
        rows=outer,
        cols=jnp.where(live, inner, 0),
        value_channels=(jnp.where(live, vals, jnp.zeros((), vals.dtype)),),
        nvalid=mat.cap,
        n_outer=n_outer,
        n_inner=n_inner,
        out_cap=mat.cap,
    )
    return CsMat(res.indptr, res.indices, res.values[0], mat.shape, mat.storage)


def permute_rows(mat: CsMat, perm: Permutation) -> CsMat:
    """B[i, :] = A[perm[i], :]  — row i of B comes from row perm[i] of A."""
    if perm.dim != mat.shape[0]:
        raise ShapeError("permute_rows: dimension mismatch")
    return _relabel(mat, perm.inv, None)


def permute_cols(mat: CsMat, perm: Permutation) -> CsMat:
    """B[:, j] = A[:, perm[j]]."""
    if perm.dim != mat.shape[1]:
        raise ShapeError("permute_cols: dimension mismatch")
    return _relabel(mat, None, perm.inv)


def transform_mat_papt(mat: CsMat, perm: Permutation) -> CsMat:
    """P·A·Pᵀ: B[i, j] = A[perm[i], perm[j]] (permutation.rs:439-494)."""
    if mat.shape[0] != mat.shape[1]:
        raise ShapeError("papt requires a square matrix")
    if perm.dim != mat.shape[0]:
        raise ShapeError("papt: dimension mismatch")
    return _relabel(mat, perm.inv, perm.inv)


def transform_mat_paq(mat: CsMat, p: Permutation, q: Permutation) -> CsMat:
    """B[i, j] = A[p[i], q[j]] (permutation.rs:496+)."""
    if p.dim != mat.shape[0] or q.dim != mat.shape[1]:
        raise ShapeError("paq: dimension mismatch")
    return _relabel(mat, p.inv, q.inv)
