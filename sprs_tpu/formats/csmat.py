"""Compressed sparse matrix (CSR/CSC) as a capacity-padded JAX pytree.

This is the TPU-native re-design of the reference's central ``CsMatBase``
type (/root/reference/sprs/src/sparse.rs:94-129 and sparse/csmat.rs).  Key
departures from the Rust design, driven by XLA's static-shape compilation
model:

* **Static capacity, dynamic nnz**: ``indices``/``data`` have a fixed
  capacity ``cap``; live entries occupy the first ``nnz = indptr[-1]``
  slots, padding is ``indices == 0, data == 0``.  All kernels are written
  so that padding contributes nothing (segment ids out of range, values
  zero), letting one compiled program serve any nnz up to ``cap``.
* **Functional**: no in-place mutation; ``map``/``scale`` return new
  matrices.  The reference's view/mut-view hierarchy collapses — JAX
  arrays are immutable and cheaply shared.
* **Transpose is metadata** (csmat.rs:966-991): flipping the storage flag
  transposes in O(1); one kernel family serves CSR and CSC through
  transpose identities.
* **Validation is host-side** (the analog of check_compressed_structure,
  sparse.rs:300-358): eager constructors validate by default; traced code
  skips validation (it cannot raise) and relies on constructors having
  established the invariants.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import ShapeError, StructureError
from .util import (
    INDEX_DTYPE,
    check_index_capacity,
    compress_coo,
    indptr_from_row_counts,
    is_concrete,
    row_ids_from_indptr,
    valid_mask,
)

CSR = "csr"
CSC = "csc"


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CsMat:
    """A CSR or CSC matrix.

    Leaves: ``indptr (n_outer+1,) i32``, ``indices (cap,) i32``,
    ``data (cap,) dtype``.  Static: ``shape``, ``storage``.
    """

    indptr: jax.Array
    indices: jax.Array
    data: jax.Array
    shape: Tuple[int, int]
    storage: str

    # -- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        return (self.indptr, self.indices, self.data), (self.shape, self.storage)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        shape, storage = aux
        indptr, indices, data = leaves
        return cls(indptr, indices, data, shape, storage)

    # -- basic properties ------------------------------------------------
    @property
    def rows(self) -> int:
        return self.shape[0]

    @property
    def cols(self) -> int:
        return self.shape[1]

    @property
    def is_csr(self) -> bool:
        return self.storage == CSR

    @property
    def is_csc(self) -> bool:
        return self.storage == CSC

    @property
    def outer_dims(self) -> int:
        return self.shape[0] if self.is_csr else self.shape[1]

    @property
    def inner_dims(self) -> int:
        return self.shape[1] if self.is_csr else self.shape[0]

    @property
    def cap(self) -> int:
        return self.indices.shape[0]

    @property
    def nnz(self):
        """Live entry count: a Python int when concrete, traced scalar under jit."""
        n = self.indptr[-1]
        if is_concrete(n):
            return int(n)
        return n

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def density(self) -> float:
        r, c = self.shape
        if r == 0 or c == 0:
            return 0.0
        return float(self.nnz) / (r * c)

    # -- structural helpers ----------------------------------------------
    def outer_ids(self) -> jax.Array:
        """Per-entry outer index (row id for CSR); padding maps out of range."""
        return row_ids_from_indptr(self.indptr, self.cap)

    def live_mask(self) -> jax.Array:
        return valid_mask(self.cap, self.indptr[-1])

    def coo_arrays(self):
        """(row_ids, col_ids, data) in matrix orientation (not storage)."""
        outer = self.outer_ids()
        # Clamp padding's outer id into range for use as plain data; callers
        # combine with live_mask when the sentinel matters.
        if self.is_csr:
            return outer, self.indices, self.data
        return self.indices, outer, self.data

    # -- transpose / storage conversion ----------------------------------
    @property
    def T(self) -> "CsMat":
        """O(1) transpose by flipping the storage flag (csmat.rs:966-991)."""
        return CsMat(
            self.indptr,
            self.indices,
            self.data,
            (self.shape[1], self.shape[0]),
            CSC if self.is_csr else CSR,
        )

    transpose_view = T

    def to_other_storage(self) -> "CsMat":
        """Re-sort entries into the opposite storage order.

        The reference uses a two-pass counting sort (csmat.rs:1782-1829);
        on TPU a multi-key ``lax.sort`` + segment compaction is the
        bandwidth-friendly equivalent.
        """
        outer = self.outer_ids()
        res = compress_coo(
            rows=self.indices,
            cols=outer,
            value_channels=(self.data,),
            nvalid=self.indptr[-1],
            n_outer=self.inner_dims,
            n_inner=self.outer_dims,
            out_cap=self.cap,
        )
        return CsMat(
            res.indptr,
            res.indices,
            res.values[0],
            self.shape,
            CSC if self.is_csr else CSR,
        )

    def to_csr(self) -> "CsMat":
        return self if self.is_csr else self.to_other_storage()

    def to_csc(self) -> "CsMat":
        return self if self.is_csc else self.to_other_storage()

    # -- densification ----------------------------------------------------
    def to_dense(self) -> jax.Array:
        out = jnp.zeros(
            (self.outer_dims, self.inner_dims), dtype=self.data.dtype
        )
        out = out.at[self.outer_ids(), self.indices].add(
            self.data, mode="drop"
        )
        return out if self.is_csr else out.T

    def to_ell(self, *, width: Optional[int] = None) -> "EllMat":
        """Convert to the TPU-friendly ELL layout (see formats/ell.py)."""
        from .ell import ell_from_csmat

        return ell_from_csmat(self.to_csr(), width=width)

    def to_bsr(self, block_size: int = 128) -> "BsrMat":
        """Convert to the MXU-native block-sparse layout (formats/bsr.py)."""
        from .bsr import bsr_from_csmat

        return bsr_from_csmat(self, block_size)

    def to_dia(self, *, max_diags: Optional[int] = None) -> "DiaMat":
        """Convert to diagonal storage for banded SpMV (formats/dia.py)."""
        from .dia import dia_from_csmat

        return dia_from_csmat(self, max_diags=max_diags)

    def to_scipy(self):
        """Host-side scipy.sparse twin (for tests/interop)."""
        import scipy.sparse as sp

        nnz = int(self.nnz)
        indptr = np.asarray(self.indptr)
        indices = np.asarray(self.indices)[:nnz]
        data = np.asarray(self.data)[:nnz]
        klass = sp.csr_matrix if self.is_csr else sp.csc_matrix
        return klass((data, indices, indptr), shape=self.shape)

    # -- elementwise ------------------------------------------------------
    def map(self, fn) -> "CsMat":
        """Apply fn to every live entry (padding stays zero).

        Note: like the reference's ``map`` (csmat.rs:1289-1303) this only
        touches stored entries; fn(0) != 0 does not densify.
        """
        new = fn(self.data)
        new = jnp.where(self.live_mask(), new, jnp.zeros((), new.dtype))
        return self.with_data(new)

    def with_data(self, data: jax.Array) -> "CsMat":
        if data.shape != self.data.shape:
            raise ShapeError(
                f"data must keep capacity {self.data.shape}, got {data.shape}"
            )
        return CsMat(self.indptr, self.indices, data, self.shape, self.storage)

    def astype(self, dtype) -> "CsMat":
        return self.with_data(self.data.astype(dtype))

    def scale(self, alpha) -> "CsMat":
        return self.map(lambda d: d * alpha)

    def __neg__(self) -> "CsMat":
        return self.map(jnp.negative)

    # -- queries -----------------------------------------------------------
    def degrees(self) -> jax.Array:
        """Per-outer-dim entry count excluding the diagonal (csmat.rs:1205-1216)."""
        outer = self.outer_ids()
        off_diag = (outer != self.indices) & self.live_mask()
        counts = jnp.zeros((self.outer_dims,), dtype=INDEX_DTYPE)
        return counts.at[outer].add(off_diag.astype(INDEX_DTYPE), mode="drop")

    def sum(self, axis: Optional[int] = None) -> jax.Array:
        """Sum of stored values: total (axis=None), per row (axis=1)
        or per column (axis=0).  Padding contributes zero (data==0
        discipline); jittable."""
        if axis is None:
            return jnp.sum(self.data)
        if axis not in (0, 1):
            raise ValueError(f"sum axis must be None, 0 or 1; got {axis}")
        # axis=1: reduce over columns -> group by ROW ids; axis=0: by col
        rows_like = self.outer_ids() if self.is_csr else self.indices
        cols_like = self.indices if self.is_csr else self.outer_ids()
        ids = rows_like if axis == 1 else cols_like
        n = self.rows if axis == 1 else self.cols
        out = jnp.zeros((n,), dtype=self.data.dtype)
        return out.at[ids].add(self.data, mode="drop")

    def mean(self, axis: Optional[int] = None) -> jax.Array:
        """Arithmetic mean over the FULL dense extent (scipy semantics:
        zeros count), per axis or total."""
        total = self.sum(axis)
        if axis is None:
            return total / (self.rows * self.cols)
        denom = self.cols if axis == 1 else self.rows
        return total / denom

    def outer_nnz(self) -> jax.Array:
        return self.indptr[1:] - self.indptr[:-1]

    def max_outer_nnz(self):
        m = jnp.max(self.outer_nnz()) if self.outer_dims > 0 else jnp.zeros((), INDEX_DTYPE)
        return int(m) if is_concrete(m) else m

    def diag(self) -> jax.Array:
        """Dense main diagonal of length min(rows, cols)."""
        k = min(self.shape)
        outer = self.outer_ids()
        on_diag = (outer == self.indices) & self.live_mask()
        idx = jnp.where(on_diag, outer, k)
        out = jnp.zeros((k,), dtype=self.data.dtype)
        return out.at[idx].add(self.data * on_diag, mode="drop")

    def to_inner_onehot(self) -> "CsMat":
        """One entry of value 1 per populated outer vector, at the inner
        index of that vector's maximum stored value (csmat.rs:1017-1056;
        NaNs ignored).  Ties pick the first maximum (the reference picks
        the last).  Jittable; output capacity = outer_dims.
        """
        n_outer = self.outer_dims
        outer = self.outer_ids()
        outer_c = jnp.minimum(outer, n_outer - 1)
        neg_inf = jnp.asarray(-jnp.inf, jnp.float32)
        ok = self.live_mask() & ~jnp.isnan(self.data)
        vals = jnp.where(ok, self.data.astype(jnp.float32), neg_inf)
        best = jnp.full((n_outer,), -jnp.inf, jnp.float32)
        best = best.at[outer].max(vals, mode="drop")
        pos = jnp.arange(self.cap, dtype=INDEX_DTYPE)
        is_best = ok & (vals == best[outer_c])
        first = jnp.full((n_outer,), self.cap, INDEX_DTYPE)
        first = first.at[outer].min(
            jnp.where(is_best, pos, self.cap), mode="drop"
        )
        has = first < self.cap
        first_c = jnp.minimum(first, self.cap - 1)
        hot_inner = jnp.where(has, self.indices[first_c], 0)
        counts = has.astype(INDEX_DTYPE)
        indptr = jnp.concatenate(
            [jnp.zeros((1,), INDEX_DTYPE), jnp.cumsum(counts)]
        )
        # compact populated rows to the front
        dst = jnp.where(has, indptr[:-1], n_outer)
        cap_out = max(n_outer, 1)
        new_indices = jnp.zeros((cap_out,), INDEX_DTYPE).at[dst].set(
            hot_inner, mode="drop"
        )
        new_data = jnp.zeros((cap_out,), self.data.dtype).at[dst].set(
            jnp.ones((n_outer,), self.data.dtype), mode="drop"
        )
        return CsMat(indptr, new_indices, new_data, self.shape, self.storage)

    def insert(self, row: int, col: int, value) -> "CsMat":
        """Functional entry insertion (csmat.rs:649-695): returns a new
        matrix with (row, col) set to ``value`` (overwriting an existing
        entry).  Host-only; capacity grows by one when the entry is new.
        """
        if not is_concrete(self.indptr, self.indices, self.data):
            raise StructureError.unsorted(
                "insert is a host-side constructor helper; build traced "
                "matrices through TriMat/coo pathways instead"
            )
        if not (0 <= row < self.shape[0] and 0 <= col < self.shape[1]):
            raise ShapeError(f"insert({row}, {col}) out of {self.shape}")
        o, i = (row, col) if self.is_csr else (col, row)
        indptr = np.asarray(self.indptr).copy()
        nnz = int(indptr[-1])
        indices = np.asarray(self.indices)[:nnz]
        data = np.asarray(self.data)[:nnz]
        lo, hi = int(indptr[o]), int(indptr[o + 1])
        pos = lo + int(np.searchsorted(indices[lo:hi], i))
        if pos < hi and indices[pos] == i:
            data = data.copy()
            data[pos] = value
        else:
            indices = np.insert(indices, pos, i)
            data = np.insert(data, pos, value)
            indptr[o + 1 :] += 1
        return csmat(
            self.shape,
            indptr,
            indices,
            data,
            storage=self.storage,
            validate=False,
        )

    def append_outer(self, dense_row) -> "CsMat":
        """Append one outer dimension from a dense vector
        (csmat.rs:552-638).  Host-only, functional."""
        if not is_concrete(self.indptr, self.indices, self.data):
            raise StructureError.unsorted("append_outer is host-only")
        dense_row = np.asarray(dense_row)
        if dense_row.shape != (self.inner_dims,):
            raise ShapeError(
                f"append_outer expects ({self.inner_dims},), got {dense_row.shape}"
            )
        nz = np.nonzero(dense_row)[0]
        indptr = np.asarray(self.indptr)
        nnz = int(indptr[-1])
        indices = np.concatenate([np.asarray(self.indices)[:nnz], nz])
        data = np.concatenate(
            [np.asarray(self.data)[:nnz], dense_row[nz]]
        )
        indptr = np.concatenate([indptr, [nnz + nz.size]])
        shape = (
            (self.shape[0] + 1, self.shape[1])
            if self.is_csr
            else (self.shape[0], self.shape[1] + 1)
        )
        return csmat(
            shape, indptr, indices, data, storage=self.storage, validate=False
        )

    def get(self, row: int, col: int):
        """Value at (row, col); 0 if not stored. O(log nnz_row) search."""
        i, j = (row, col) if self.is_csr else (col, row)
        start, stop = self.indptr[i], self.indptr[i + 1]
        # Masked reduction over the entry span — O(cap) but fully
        # vectorized, which beats a scalar binary search on TPU.
        pos = jnp.arange(self.cap)
        hit = (pos >= start) & (pos < stop) & (self.indices == j)
        val = jnp.sum(jnp.where(hit, self.data, jnp.zeros((), self.data.dtype)))
        return val

    def __getitem__(self, key):
        if isinstance(key, tuple) and len(key) == 2:
            return self.get(*key)
        raise TypeError("CsMat supports mat[i, j] indexing only")

    def nnz_index(self, row: int, col: int):
        """Storage slot of entry (row, col), or -1 if absent — the
        reference's NnzIndex handle (csmat.rs:2180-2244): resolve the
        position once, then read/write ``data[slot]`` repeatedly in
        O(1).  Vectorized masked reduction; jit-compatible."""
        i, j = (row, col) if self.is_csr else (col, row)
        start, stop = self.indptr[i], self.indptr[i + 1]
        pos = jnp.arange(self.cap, dtype=INDEX_DTYPE)
        hit = (pos >= start) & (pos < stop) & (self.indices == j)
        return jnp.where(
            jnp.any(hit),
            jnp.argmax(hit).astype(INDEX_DTYPE),
            jnp.asarray(-1, INDEX_DTYPE),
        )

    def structure_view(self) -> "CsMat":
        """Pattern-only twin with data = 1 (int8) — the reference's
        ``CsStructure`` alias (sparse.rs:94-129, ZST data for
        symbolic-only work).  Pattern algebra composes through the
        normal ops: ``add`` = pattern union, ``spgemm`` = structural
        product (values count contributing products)."""
        return CsMat(
            self.indptr,
            self.indices,
            self.live_mask().astype(jnp.int8),
            self.shape,
            self.storage,
        )

    def modify(self, fn) -> "CsMat":
        """Rebuild through ``fn(indptr, indices, data) -> (indptr,
        indices, data)`` and RE-VALIDATE the invariants — the
        reference's ``modify`` (csmat.rs:1705-1718), which exists so
        arbitrary edits can't silently break sortedness/bounds.
        Host-side: validation needs concrete arrays."""
        new_indptr, new_indices, new_data = fn(
            self.indptr, self.indices, self.data
        )
        out = CsMat(
            jnp.asarray(new_indptr, INDEX_DTYPE),
            jnp.asarray(new_indices, INDEX_DTYPE),
            jnp.asarray(new_data),
            self.shape,
            self.storage,
        )
        out.check_structure()
        return out

    # -- slicing ------------------------------------------------------------
    def slice_outer(self, start: int, stop: int) -> "CsMat":
        """Static outer-dimension slice (slicing.rs:17-89).

        Unlike the reference's zero-copy offset-indptr views
        (indptr.rs:206-219), XLA needs materialized arrays; we gather
        the slice into a fresh matrix.  On concrete (host) inputs the
        output capacity is tightened to the slice's own entry count
        (``indptr[stop] - indptr[start]``), so iterating
        ``outer_blocks`` over a large matrix does O(nnz) total work,
        not O(blocks × parent_cap).  Traced inputs keep the parent
        capacity (the only static bound available under jit).
        """
        if not (0 <= start <= stop <= self.outer_dims):
            raise ShapeError(
                f"slice [{start}:{stop}) out of range for {self.outer_dims}"
            )
        n_out = stop - start
        lo, hi = self.indptr[start], self.indptr[stop]
        new_nnz = hi - lo
        if is_concrete(self.indptr):
            out_cap = max(int(new_nnz), 1)
        else:
            out_cap = self.cap
        pos = jnp.arange(out_cap, dtype=INDEX_DTYPE)
        src = jnp.minimum(lo + pos, self.cap - 1)
        live = pos < new_nnz
        new_indices = jnp.where(live, self.indices[src], 0)
        new_data = jnp.where(
            live, self.data[src], jnp.zeros((), self.data.dtype)
        )
        new_indptr = (
            jax.lax.dynamic_slice(self.indptr, (start,), (n_out + 1,)) - lo
        )
        shape = (
            (n_out, self.shape[1]) if self.is_csr else (self.shape[0], n_out)
        )
        return CsMat(new_indptr, new_indices, new_data, shape, self.storage)

    # -- capacity management -------------------------------------------------
    def with_cap(self, new_cap: int) -> "CsMat":
        """Re-pad to a new capacity. Shrinking below nnz is a host error."""
        if new_cap == self.cap:
            return self
        if is_concrete(self.indptr):
            if new_cap < int(self.nnz):
                raise StructureError.size_mismatch(
                    f"cannot shrink cap below nnz={self.nnz}"
                )
        if new_cap > self.cap:
            pad = new_cap - self.cap
            indices = jnp.pad(self.indices, (0, pad))
            data = jnp.pad(self.data, (0, pad))
        else:
            indices = self.indices[:new_cap]
            data = self.data[:new_cap]
        return CsMat(self.indptr, indices, data, self.shape, self.storage)

    def compact(self, out_cap: Optional[int] = None) -> "CsMat":
        """Drop stored zeros (and tighten capacity on concrete inputs)."""
        keep = self.live_mask() & (self.data != 0)
        outer = jnp.where(keep, self.outer_ids(), self.outer_dims)
        order = jnp.argsort(~keep, stable=True)  # keepers first, order kept
        if out_cap is None:
            if is_concrete(self.data):
                out_cap = max(int(jnp.sum(keep)), 1)
            else:
                out_cap = self.cap
        take = jnp.minimum(
            jnp.arange(out_cap, dtype=INDEX_DTYPE), self.cap - 1
        )
        perm = order[take]
        new_nnz = jnp.sum(keep.astype(INDEX_DTYPE))
        live = jnp.arange(out_cap, dtype=INDEX_DTYPE) < new_nnz
        new_indices = jnp.where(live, self.indices[perm], 0)
        new_data = jnp.where(
            live, self.data[perm], jnp.zeros((), self.data.dtype)
        )
        counts = jnp.zeros((self.outer_dims,), dtype=INDEX_DTYPE)
        counts = counts.at[outer].add(
            keep.astype(INDEX_DTYPE), mode="drop"
        )
        indptr = jnp.concatenate(
            [jnp.zeros((1,), INDEX_DTYPE), jnp.cumsum(counts, dtype=INDEX_DTYPE)]
        )
        return CsMat(indptr, new_indices, new_data, self.shape, self.storage)

    # -- validation -----------------------------------------------------------
    def check_structure(self) -> "CsMat":
        """Host-side invariant check (sparse.rs:300-358 equivalent).

        Raises StructureError on violation; returns self for chaining.
        Only callable on concrete (non-traced) matrices.
        """
        if not is_concrete(self.indptr, self.indices, self.data):
            return self  # cannot validate traced values
        indptr = np.asarray(self.indptr)
        indices = np.asarray(self.indices)
        data = np.asarray(self.data)
        n_outer, n_inner = self.outer_dims, self.inner_dims
        if indptr.shape != (n_outer + 1,):
            raise StructureError.size_mismatch(
                f"indptr length {indptr.shape[0]} != outer_dims+1 {n_outer + 1}"
            )
        if indices.shape != data.shape:
            raise StructureError.size_mismatch(
                "indices and data capacity differ"
            )
        if indptr[0] != 0:
            raise StructureError.out_of_range("indptr[0] must be 0")
        if np.any(np.diff(indptr) < 0):
            raise StructureError.unsorted("indptr must be monotone")
        nnz = int(indptr[-1])
        if nnz > self.cap:
            raise StructureError.size_mismatch(
                f"nnz {nnz} exceeds capacity {self.cap}"
            )
        live_idx = indices[:nnz]
        if nnz and (live_idx.min() < 0 or live_idx.max() >= max(n_inner, 1)):
            raise StructureError.out_of_range(
                "inner index out of range"
            )
        for o in range(n_outer):
            row = live_idx[indptr[o] : indptr[o + 1]]
            if row.size > 1 and np.any(np.diff(row) <= 0):
                raise StructureError.unsorted(
                    f"indices in outer dim {o} not strictly increasing"
                )
        return self

    # -- operators (wired to ops lazily to avoid circular imports) -------------
    def __matmul__(self, other):
        from .. import ops

        return ops.matmul(self, other)

    def __rmatmul__(self, other):
        from .. import ops

        return ops.rmatmul(other, self)

    def __add__(self, other):
        from .. import ops

        return ops.add(self, other)

    def __radd__(self, other):
        from .. import ops

        return ops.add(self, other)

    def __sub__(self, other):
        from .. import ops

        return ops.sub(self, other)

    def __rsub__(self, other):
        from .. import ops

        return ops.sub(other, self)

    def __mul__(self, other):
        from .. import ops

        return ops.elementwise_mul(self, other)

    def __rmul__(self, other):
        from .. import ops

        return ops.elementwise_mul(self, other)

    def norm(self, ord="fro"):
        """Matrix norm over stored values (scipy.sparse.linalg.norm
        parity): 'fro', 1 (max column abs-sum), inf (max row abs-sum),
        or 'max' (largest |entry|).  Jittable; padding is zero."""
        import numpy as _np

        a = jnp.abs(self.data)
        if ord == "fro":
            return jnp.sqrt(jnp.sum(a * a))
        if ord == "max":
            return jnp.max(a)
        if ord in (1, _np.inf, "inf"):
            axis = 0 if ord == 1 else 1
            rows_like = self.outer_ids() if self.is_csr else self.indices
            cols_like = self.indices if self.is_csr else self.outer_ids()
            ids = rows_like if axis == 1 else cols_like
            n = self.rows if axis == 1 else self.cols
            sums = jnp.zeros((n,), a.dtype).at[ids].add(a, mode="drop")
            return jnp.max(sums)
        raise ValueError(f"unsupported norm ord {ord!r}")

    def tril(self, k: int = 0) -> "CsMat":
        """Lower triangle at and below diagonal ``k``
        (scipy.sparse.tril parity).  Jittable: entries above the
        diagonal become padding via the data==0 discipline (cap
        unchanged; live structure is re-counted on ``compact()``)."""
        return self._tri_filter(lower=True, k=k)

    def triu(self, k: int = 0) -> "CsMat":
        """Upper triangle at and above diagonal ``k``."""
        return self._tri_filter(lower=False, k=k)

    def _tri_filter(self, *, lower: bool, k: int) -> "CsMat":
        rows_like = self.outer_ids() if self.is_csr else self.indices
        cols_like = self.indices if self.is_csr else self.outer_ids()
        diagk = cols_like - rows_like
        keep = (diagk <= k) if lower else (diagk >= k)
        keep = keep & self.live_mask()
        from .util import compress_coo

        res = compress_coo(
            rows=jnp.where(keep, rows_like, self.rows),
            cols=jnp.where(keep, cols_like, 0),
            value_channels=(jnp.where(keep, self.data, 0),),
            nvalid=self.cap,
            n_outer=self.rows,
            n_inner=self.cols,
            out_cap=self.cap,
        )
        out = CsMat(
            res.indptr,
            res.indices,
            res.values[0],
            (self.rows, self.cols),
            CSR,
        )
        return out if self.is_csr else out.to_csc()

    def multiply(self, other) -> "CsMat":
        """Elementwise (Hadamard) product — the scipy.sparse name for
        what ``*`` already does here."""
        from .. import ops

        return ops.elementwise_mul(self, other)

    def maximum(self, other: "CsMat") -> "CsMat":
        """Elementwise maximum (scipy.sparse parity)."""
        from .. import ops

        return ops.maximum(self, other)

    def minimum(self, other: "CsMat") -> "CsMat":
        """Elementwise minimum (scipy.sparse parity)."""
        from .. import ops

        return ops.minimum(self, other)

    def __truediv__(self, other):
        if isinstance(other, CsMat):
            raise TypeError("sparse / sparse is not defined (densifies)")
        return self.map(lambda d: d / other)

    def allclose(self, other: "CsMat", *, rtol: float = 1e-7, atol: float = 1e-12) -> bool:
        """Approximate equality (the reference's `approx` feature,
        csmat.rs:3055-3204): same shape, dense values within tolerance
        regardless of storage/pattern differences.  Host-only."""
        import numpy as np

        if self.shape != other.shape:
            return False
        return bool(
            np.allclose(
                np.asarray(self.to_dense()),
                np.asarray(other.to_dense()),
                rtol=rtol,
                atol=atol,
            )
        )

    def row(self, i: int) -> "CsVec":
        """Row ``i`` as a sparse vector (scipy ``getrow`` parity;
        host-only, converts storage if needed)."""
        from .csvec import CsVec

        m = self.to_csr()
        if not (0 <= i < m.rows):
            raise ShapeError(f"row {i} out of range for {m.shape}")
        indptr = np.asarray(m.indptr)
        lo, hi = int(indptr[i]), int(indptr[i + 1])
        n = hi - lo
        idx = m.indices[lo:hi] if n else jnp.zeros((1,), INDEX_DTYPE)
        dat = m.data[lo:hi] if n else jnp.zeros((1,), m.data.dtype)
        return CsVec(idx, dat, jnp.asarray(n, INDEX_DTYPE), m.cols)

    def col(self, j: int) -> "CsVec":
        """Column ``j`` as a sparse vector (scipy ``getcol`` parity)."""
        return self.T.row(j)

    def outer_vectors(self):
        """Iterate (outer_index, CsVec) over outer dimensions — the
        reference's outer_iterator (csmat.rs:1150-1163).  Host-only
        generator; each vector is a zero-copy-ish view of one row/col.
        """
        from .csvec import CsVec

        indptr = np.asarray(self.indptr)
        for o in range(self.outer_dims):
            lo, hi = int(indptr[o]), int(indptr[o + 1])
            n = hi - lo
            idx = self.indices[lo:hi] if n else jnp.zeros((1,), INDEX_DTYPE)
            dat = (
                self.data[lo:hi]
                if n
                else jnp.zeros((1,), self.data.dtype)
            )
            yield o, CsVec(
                idx,
                dat,
                jnp.asarray(n, INDEX_DTYPE),
                self.inner_dims,
            )

    def outer_blocks(self, block_size: int):
        """Iterate (start, CsMat) outer-dimension chunks
        (outer_block_iter, csmat.rs:1272-1286).  Host-only generator."""
        for start in range(0, self.outer_dims, block_size):
            stop = min(start + block_size, self.outer_dims)
            yield start, self.slice_outer(start, stop)

    def __repr__(self):
        nnz = self.nnz
        nnz_s = str(nnz) if isinstance(nnz, int) else "<traced>"
        return (
            f"CsMat(shape={self.shape}, storage={self.storage}, "
            f"nnz={nnz_s}, cap={self.cap}, dtype={self.data.dtype})"
        )


# ---------------------------------------------------------------------------
# Constructors
# ---------------------------------------------------------------------------


def _pad_to_cap(arr, cap, dtype):
    arr = jnp.asarray(arr, dtype=dtype)
    n = arr.shape[0]
    if n > cap:
        raise StructureError.size_mismatch(f"nnz {n} exceeds cap {cap}")
    return jnp.pad(arr, (0, cap - n))


def csmat(
    shape: Tuple[int, int],
    indptr,
    indices,
    data,
    *,
    storage: str = CSR,
    cap: Optional[int] = None,
    validate: bool = True,
) -> CsMat:
    """Build a CsMat from raw compressed arrays (csmat.rs:207-216 analog).

    Arrays may be shorter than ``cap``; they are zero-padded.  With
    ``validate=True`` (default, host-only) the structural invariants are
    checked eagerly like the reference's checked constructors.
    """
    check_index_capacity(rows=shape[0], cols=shape[1], cap=cap)
    indices = jnp.asarray(indices, dtype=INDEX_DTYPE)
    data = jnp.asarray(data)
    if data.dtype == jnp.int64 or data.dtype == jnp.float64:
        # keep as provided; caller controls x64 mode
        pass
    if cap is None:
        cap = max(int(indices.shape[0]), 1)
    indptr = jnp.asarray(indptr, dtype=INDEX_DTYPE)
    m = CsMat(
        indptr,
        _pad_to_cap(indices, cap, INDEX_DTYPE),
        _pad_to_cap(data, cap, data.dtype),
        tuple(shape),
        storage,
    )
    if validate:
        m.check_structure()
    return m


def csr(shape, indptr, indices, data, **kw) -> CsMat:
    return csmat(shape, indptr, indices, data, storage=CSR, **kw)


def csc(shape, indptr, indices, data, **kw) -> CsMat:
    return csmat(shape, indptr, indices, data, storage=CSC, **kw)


def csmat_from_unsorted(
    shape, indptr, indices, data, *, storage: str = CSR, cap=None
) -> CsMat:
    """Constructor accepting unsorted per-row indices (csmat.rs:355-401).

    Duplicates are summed (stronger than the reference, which rejects
    them — summing matches the triplet pathway and is the useful choice).
    """
    raw = csmat(
        shape, indptr, indices, data, storage=storage, cap=cap, validate=False
    )
    res = compress_coo(
        rows=raw.outer_ids(),
        cols=raw.indices,
        value_channels=(raw.data,),
        nvalid=raw.indptr[-1],
        n_outer=raw.outer_dims,
        n_inner=raw.inner_dims,
        out_cap=raw.cap,
    )
    return CsMat(res.indptr, res.indices, res.values[0], raw.shape, storage)


def eye(n: int, dtype=jnp.float32, *, storage: str = CSR, cap=None) -> CsMat:
    check_index_capacity(n=n, cap=cap)
    cap = cap or max(n, 1)
    indptr = jnp.arange(n + 1, dtype=INDEX_DTYPE)
    idx = jnp.arange(cap, dtype=INDEX_DTYPE)
    indices = jnp.where(idx < n, idx, 0)
    data = jnp.where(idx < n, jnp.ones((), dtype), jnp.zeros((), dtype))
    return CsMat(indptr, indices, data, (n, n), storage)


def empty(shape: Tuple[int, int], dtype=jnp.float32, *, storage: str = CSR, cap: int = 1) -> CsMat:
    check_index_capacity(rows=shape[0], cols=shape[1], cap=cap)
    n_outer = shape[0] if storage == CSR else shape[1]
    return CsMat(
        jnp.zeros((n_outer + 1,), INDEX_DTYPE),
        jnp.zeros((cap,), INDEX_DTYPE),
        jnp.zeros((cap,), dtype),
        tuple(shape),
        storage,
    )


def diag_csmat(values, *, storage: str = CSR) -> CsMat:
    """Square diagonal matrix from a dense vector."""
    values = jnp.asarray(values)
    n = values.shape[0]
    m = eye(n, dtype=values.dtype, storage=storage)
    return m.with_data(values)


def diags(diagonals, offsets, shape=None, *, storage: str = CSR) -> CsMat:
    """Build a matrix from diagonals (scipy.sparse.diags parity).

    ``diagonals[k]`` fills diagonal ``offsets[k]``; each may be a
    scalar (broadcast along the whole diagonal) or a 1-D array exactly
    as long as its diagonal.  ``shape`` defaults to the square size
    implied by the longest main-ish diagonal.  Host-side construction.
    """
    import numpy as np

    offsets = [int(o) for o in np.atleast_1d(offsets)]
    diagonals = [np.atleast_1d(np.asarray(d)) for d in diagonals]
    if len(diagonals) != len(offsets):
        raise ShapeError(
            f"diags: {len(diagonals)} diagonals vs {len(offsets)} offsets"
        )
    if shape is None:
        n = max(
            d.shape[0] + abs(o) if d.shape[0] > 1 else abs(o) + 1
            for d, o in zip(diagonals, offsets)
        )
        shape = (n, n)
    rows_n, cols_n = shape
    rs, cs, vs = [], [], []
    for d, o in zip(diagonals, offsets):
        length = min(rows_n + min(o, 0), cols_n - max(o, 0))
        if length <= 0:
            raise ShapeError(
                f"diags: offset {o} out of range for shape {shape}"
            )
        if d.shape[0] == 1:
            vals = np.broadcast_to(d, (length,))
        elif d.shape[0] == length:
            vals = d
        else:
            raise ShapeError(
                f"diags: diagonal at offset {o} has length {d.shape[0]},"
                f" expected {length}"
            )
        r = np.arange(max(0, -o), max(0, -o) + length)
        rs.append(r)
        cs.append(r + o)
        vs.append(vals)
    rr = np.concatenate(rs)
    cc = np.concatenate(cs)
    vv = np.concatenate(vs)
    order = np.lexsort((cc, rr))
    rr, cc, vv = rr[order], cc[order], vv[order]
    indptr = np.zeros(rows_n + 1, np.int64)
    np.add.at(indptr, rr + 1, 1)
    indptr = np.cumsum(indptr)
    out = csmat(
        (rows_n, cols_n),
        indptr.astype(np.int32),
        cc.astype(np.int32),
        vv,
        validate=False,
    )
    return out if storage == CSR else out.to_csc()


def from_dense(arr, *, eps: float = 0.0, storage: str = CSR, cap=None) -> CsMat:
    """Densify threshold conversion (csr_from_dense, csmat.rs:502-549).

    Entries with |a_ij| > eps are kept.  On concrete inputs the capacity
    defaults to the exact nnz; traced inputs must pass ``cap``.

    Sort-free: a dense array is already in row-major (outer, inner)
    order, so the kept entries compact with one cumsum + one sorted
    scatter — no ``lax.sort``.  This matters at scale: a single device
    sort above ~10^8 elements crashes the TPU worker, while the cumsum
    path handles the 225M-element dense results of the densified-MXU
    SpGEMM route (ops/spgemm.py::spgemm_dense).

    >>> import numpy as np
    >>> from sprs_tpu import from_dense
    >>> m = from_dense(np.array([[0.0, 2.0], [3.0, 0.0]]))
    >>> m.nnz
    2
    >>> np.asarray(m.to_dense()).tolist()
    [[0.0, 2.0], [3.0, 0.0]]
    """
    arr = jnp.asarray(arr)
    if arr.ndim != 2:
        raise ShapeError("from_dense expects a 2-D array")
    r, c = arr.shape
    a = arr if storage == CSR else arr.T
    n_outer, n_inner = a.shape
    keep = jnp.abs(a) > eps
    if cap is None:
        if is_concrete(arr):
            cap = max(int(jnp.sum(keep)), 1)
        else:
            cap = max(n_outer * n_inner, 1)
    flat_keep = keep.reshape(-1)
    total = n_outer * n_inner
    if total == 0:
        # zero-dimension input: no elements to scan (gid[-1] below
        # would crash on the empty cumsum)
        return CsMat(
            jnp.zeros((n_outer + 1,), INDEX_DTYPE),
            jnp.zeros((cap,), INDEX_DTYPE),
            jnp.zeros((cap,), a.dtype),
            (r, c),
            storage,
        )
    # Flat row-major order is already (row, col)-sorted; compact kept
    # entries by destination slot (prefix count).  Every element
    # scatters (non-kept ones masked to zero contributions) so the
    # index stream stays non-decreasing: a non-kept element carries the
    # gid of the last kept element before it and adds 0 there; leading
    # non-kept elements clamp to slot 0 (also a 0-add no-op).  NB: the
    # clamp is required — JAX wraps negative scatter indices instead of
    # dropping them, so gid=-1 would write slot cap-1 and break the
    # ``indices_are_sorted`` contract.
    gid = jnp.cumsum(flat_keep.astype(INDEX_DTYPE)) - 1
    nnz = jnp.minimum(gid[-1] + 1, cap).astype(INDEX_DTYPE)
    gid = jnp.maximum(gid, 0)
    cols = jnp.arange(total, dtype=INDEX_DTYPE) % max(n_inner, 1)
    indices = (
        jnp.zeros((cap,), INDEX_DTYPE)
        .at[gid]
        .add(
            jnp.where(flat_keep, cols, 0),
            mode="drop",
            indices_are_sorted=True,
        )
    )
    data = (
        jnp.zeros((cap,), a.dtype)
        .at[gid]
        .add(
            jnp.where(flat_keep, a.reshape(-1), 0),
            mode="drop",
            indices_are_sorted=True,
        )
    )
    counts = jnp.sum(keep, axis=1, dtype=INDEX_DTYPE)
    indptr = jnp.minimum(indptr_from_row_counts(counts), nnz)
    return CsMat(indptr, indices, data, (r, c), storage)


def from_scipy(m, *, storage: Optional[str] = None, cap=None) -> CsMat:
    """Convert a scipy.sparse matrix (host interop)."""
    import scipy.sparse as sp

    if storage == CSC or (storage is None and sp.issparse(m) and m.format == "csc"):
        m = m.tocsc()
        st = CSC
    else:
        m = m.tocsr()
        st = CSR
    m.sort_indices()
    return csmat(
        m.shape,
        m.indptr.astype(np.int32),
        m.indices.astype(np.int32),
        m.data,
        storage=st,
        cap=cap,
        validate=False,
    )
