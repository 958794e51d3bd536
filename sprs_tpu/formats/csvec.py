"""Sparse vector with sorted indices, capacity-padded.

TPU-native counterpart of the reference ``CsVecBase``
(/root/reference/sprs/src/sparse.rs:165-182, sparse/vec.rs).  A CsVec is
format-compatible with one CSR row: ``row_view``/``col_view`` reinterpret
it as a 1×n / n×1 CsMat without copying data (vec.rs:747-784).

Padding discipline: live entries occupy slots [0, nnz); padding has
``indices == 0`` and ``data == 0``.  For binary searches the padding is
remapped on the fly to the out-of-range sentinel ``dim`` so the array
stays sorted end-to-end.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import ShapeError, StructureError
from .csmat import CSC, CSR, CsMat
from .util import INDEX_DTYPE, compress_coo, is_concrete, valid_mask


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CsVec:
    """Sparse vector: leaves ``indices (cap,) i32``, ``data (cap,)``,
    ``nnz () i32``; static ``dim``."""

    indices: jax.Array
    data: jax.Array
    nnz_arr: jax.Array
    dim: int

    def tree_flatten(self):
        return (self.indices, self.data, self.nnz_arr), (self.dim,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        (dim,) = aux
        return cls(*leaves, dim)

    # -- properties --------------------------------------------------------
    @property
    def nnz(self):
        if is_concrete(self.nnz_arr):
            return int(self.nnz_arr)
        return self.nnz_arr

    @property
    def cap(self) -> int:
        return self.indices.shape[0]

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def shape(self) -> Tuple[int]:
        return (self.dim,)

    def live_mask(self) -> jax.Array:
        return valid_mask(self.cap, self.nnz_arr)

    def search_indices(self) -> jax.Array:
        """Indices with padding remapped to ``dim`` (keeps array sorted)."""
        return jnp.where(self.live_mask(), self.indices, self.dim)

    # -- conversions ---------------------------------------------------------
    def to_dense(self) -> jax.Array:
        """Scatter into a dense vector (vec.rs:965-973)."""
        out = jnp.zeros((self.dim,), dtype=self.data.dtype)
        idx = jnp.where(self.live_mask(), self.indices, self.dim)
        return out.at[idx].add(self.data, mode="drop")

    scatter = to_dense

    def to_set(self):
        """Host-side dict {index: value} of live entries (vec.rs:976-985)."""
        import numpy as np

        n = int(self.nnz)
        idx = np.asarray(self.indices)[:n]
        val = np.asarray(self.data)[:n]
        return {int(i): v for i, v in zip(idx, val)}

    def items(self):
        """Host-side (index, value) iterator over live entries."""
        return iter(self.to_set().items())

    def row_view(self) -> CsMat:
        """Reinterpret as a 1×dim CSR matrix (vec.rs:770-784)."""
        indptr = jnp.stack(
            [jnp.zeros((), INDEX_DTYPE), self.nnz_arr.astype(INDEX_DTYPE)]
        )
        return CsMat(indptr, self.indices, self.data, (1, self.dim), CSR)

    def col_view(self) -> CsMat:
        """Reinterpret as a dim×1 CSC matrix (vec.rs:747-760)."""
        indptr = jnp.stack(
            [jnp.zeros((), INDEX_DTYPE), self.nnz_arr.astype(INDEX_DTYPE)]
        )
        return CsMat(indptr, self.indices, self.data, (self.dim, 1), CSC)

    # -- access ----------------------------------------------------------------
    def get(self, index: int):
        """Value at position ``index`` (0 if absent) via binary search
        (nnz_index, vec.rs:800-805)."""
        si = self.search_indices()
        pos = jnp.searchsorted(si, index)
        pos_c = jnp.minimum(pos, self.cap - 1)
        hit = si[pos_c] == index
        return jnp.where(hit, self.data[pos_c], jnp.zeros((), self.data.dtype))

    def __getitem__(self, index):
        return self.get(index)

    def nnz_index(self, index: int):
        """Storage slot of logical ``index``, or -1 if absent — the
        reference's NnzIndex handle for O(1) repeated access
        (vec.rs:800-805).  Device binary search; jit-compatible."""
        si = self.search_indices()
        pos = jnp.searchsorted(si, index)
        pos_c = jnp.minimum(pos, self.cap - 1)
        hit = si[pos_c] == index
        return jnp.where(
            hit,
            pos_c.astype(INDEX_DTYPE),
            jnp.asarray(-1, INDEX_DTYPE),
        )

    def iter_perm(self, perm):
        """Host-side (permuted_index, value) iteration — the
        reference's VectorIteratorPerm (vec.rs:1042-1046):  yields
        entries relabeled by ``perm`` (new_index = perm[old_index]),
        in stored order."""
        import numpy as np

        p = np.asarray(getattr(perm, "perm", perm))
        n = int(self.nnz)
        idx = np.asarray(self.indices)[:n]
        val = np.asarray(self.data)[:n]
        for i, v in zip(idx, val):
            yield int(p[int(i)]), v

    # -- elementwise --------------------------------------------------------------
    def map(self, fn) -> "CsVec":
        new = fn(self.data)
        new = jnp.where(self.live_mask(), new, jnp.zeros((), new.dtype))
        return CsVec(self.indices, new, self.nnz_arr, self.dim)

    def scale(self, alpha) -> "CsVec":
        return self.map(lambda d: d * alpha)

    def __neg__(self) -> "CsVec":
        return self.map(jnp.negative)

    # -- reductions (vec.rs:906-958) -------------------------------------------------
    def squared_l2_norm(self):
        return jnp.sum(self.data * self.data)

    def l2_norm(self):
        return jnp.sqrt(self.squared_l2_norm())

    def sum(self):
        """Sum of stored values (padding is zero)."""
        return jnp.sum(self.data)

    def mean(self):
        """Mean over the FULL dense extent (zeros count)."""
        return self.sum() / self.dim

    def l1_norm(self):
        return jnp.sum(jnp.abs(self.data))

    def norm(self, p: float):
        """p-norm incl. p=inf (max |x|), p=-inf (min |x| over stored),
        and the p=0 'norm' (nnz count), matching vec.rs:930-958."""
        a = jnp.abs(self.data)
        if p == np.inf:
            return jnp.max(a)
        if p == -np.inf:
            big = jnp.asarray(jnp.inf, dtype=a.dtype)
            return jnp.min(jnp.where(self.live_mask(), a, big))
        if p == 0:
            return jnp.sum((a != 0) & self.live_mask()).astype(a.dtype)
        return jnp.sum(a**p) ** (1.0 / p)

    def unit_normalize(self) -> "CsVec":
        n = self.l2_norm()
        safe = jnp.where(n == 0, jnp.ones((), n.dtype), n)
        return self.map(lambda d: d / safe)

    # -- products -------------------------------------------------------------
    def dot(self, other):
        """Sparse·sparse or sparse·dense dot product.

        Sparse·sparse uses vectorized binary search (the TPU analog of
        csvec_dot_by_binary_search, prod.rs:14-70): O(nnz_a log nnz_b),
        searching the smaller operand's entries in the larger one.
        """
        if isinstance(other, CsVec):
            if self.dim != other.dim:
                raise ShapeError("dot: dimension mismatch")
            a, b = (self, other) if self.cap <= other.cap else (other, self)
            bi = b.search_indices()
            pos = jnp.searchsorted(bi, a.search_indices())
            pos_c = jnp.minimum(pos, b.cap - 1)
            hit = bi[pos_c] == a.search_indices()
            return jnp.sum(
                jnp.where(hit, a.data * b.data[pos_c], 0).astype(self.data.dtype)
            )
        other = jnp.asarray(other)
        if other.shape != (self.dim,):
            raise ShapeError("dot: dimension mismatch")
        return self.dot_dense(other)

    def dot_dense(self, dense: jax.Array):
        """Gather-based sparse·dense dot (vec.rs:894-904)."""
        return jnp.sum(self.data * dense[self.indices] * self.live_mask())

    # -- ops via the shared merge machinery ------------------------------------
    def _binop(self, other: "CsVec", op, out_cap: Optional[int] = None) -> "CsVec":
        if self.dim != other.dim:
            raise ShapeError("binop: dimension mismatch")
        cap = self.cap + other.cap
        rows = jnp.zeros((cap,), dtype=INDEX_DTYPE)
        cols = jnp.concatenate([self.indices, other.indices])
        va = jnp.concatenate(
            [self.data, jnp.zeros((other.cap,), self.data.dtype)]
        )
        vb = jnp.concatenate(
            [jnp.zeros((self.cap,), other.data.dtype), other.data]
        )
        # mark padding of both operands invalid by pushing rows out of range
        live = jnp.concatenate([self.live_mask(), other.live_mask()])
        rows = jnp.where(live, rows, 1)
        if out_cap is None:
            if is_concrete(self.nnz_arr, other.nnz_arr):
                out_cap = max(int(self.nnz) + int(other.nnz), 1)
            else:
                out_cap = cap
        res = compress_coo(
            rows=rows,
            cols=cols,
            value_channels=(va, vb),
            nvalid=cap,
            n_outer=1,
            n_inner=self.dim,
            out_cap=out_cap,
        )
        if is_concrete(res.required_nnz) and int(res.required_nnz) > out_cap:
            from ..errors import CapacityError

            raise CapacityError(
                int(res.required_nnz),
                out_cap,
                f"CsVec binop union has {int(res.required_nnz)} entries "
                f"but out_cap={out_cap}; pass a larger out_cap",
            )
        out = op(res.values[0], res.values[1])
        out = jnp.where(
            valid_mask(out_cap, res.nnz), out, jnp.zeros((), out.dtype)
        )
        return CsVec(res.indices, out, res.nnz, self.dim)

    def __add__(self, other):
        if isinstance(other, CsVec):
            return self._binop(other, jnp.add)
        return self.to_dense() + jnp.asarray(other)

    def __sub__(self, other):
        if isinstance(other, CsVec):
            return self._binop(other, jnp.subtract)
        return self.to_dense() - jnp.asarray(other)

    def __mul__(self, other):
        if isinstance(other, CsVec):
            return self._binop(other, jnp.multiply)
        return self.scale(other)

    def __rmul__(self, alpha):
        return self.scale(alpha)

    def __truediv__(self, alpha):
        return self.map(lambda d: d / alpha)

    def __matmul__(self, other):
        from .. import ops

        if isinstance(other, CsVec):
            return self.dot(other)
        return ops.rmatmul(self, other)

    def __repr__(self):
        nnz = self.nnz
        nnz_s = str(nnz) if isinstance(nnz, int) else "<traced>"
        return (
            f"CsVec(dim={self.dim}, nnz={nnz_s}, cap={self.cap}, "
            f"dtype={self.data.dtype})"
        )


# ---------------------------------------------------------------------------
# Constructors
# ---------------------------------------------------------------------------


def csvec(
    dim: int, indices, data, *, cap: Optional[int] = None, validate: bool = True
) -> CsVec:
    """Build from sorted indices (vec.rs:430-460 analog)."""
    indices = jnp.asarray(indices, dtype=INDEX_DTYPE)
    data = jnp.asarray(data)
    n = indices.shape[0]
    cap = cap or max(n, 1)
    if n > cap:
        raise StructureError.size_mismatch(f"nnz {n} exceeds cap {cap}")
    if validate and is_concrete(indices):
        ih = np.asarray(indices)
        if ih.size and (ih.min() < 0 or ih.max() >= dim):
            raise StructureError.out_of_range("index out of range")
        if ih.size > 1 and np.any(np.diff(ih) <= 0):
            raise StructureError.unsorted("indices must be strictly increasing")
    v = CsVec(
        jnp.pad(indices, (0, cap - n)),
        jnp.pad(data, (0, cap - n)),
        jnp.asarray(n, dtype=INDEX_DTYPE),
        dim,
    )
    return v


def csvec_from_unsorted(dim: int, indices, data, *, cap=None) -> CsVec:
    """Sorts and sums duplicates (new_from_unsorted, vec.rs:520-557)."""
    indices = jnp.asarray(indices, dtype=INDEX_DTYPE)
    data = jnp.asarray(data)
    n = indices.shape[0]
    cap = cap or max(n, 1)
    res = compress_coo(
        rows=jnp.zeros((n,), INDEX_DTYPE),
        cols=indices,
        value_channels=(data,),
        nvalid=n,
        n_outer=1,
        n_inner=dim,
        out_cap=cap,
    )
    return CsVec(res.indices, res.values[0], res.nnz, dim)


def csvec_from_dense(x, *, eps: float = 0.0, cap=None) -> CsVec:
    x = jnp.asarray(x)
    (dim,) = x.shape
    keep = jnp.abs(x) > eps
    if cap is None:
        if is_concrete(x):
            cap = max(int(jnp.sum(keep)), 1)
        else:
            cap = dim
    idx = jnp.arange(dim, dtype=INDEX_DTYPE)
    res = compress_coo(
        rows=jnp.where(keep, 0, 1).astype(INDEX_DTYPE),
        cols=idx,
        value_channels=(jnp.where(keep, x, 0),),
        nvalid=dim,
        n_outer=1,
        n_inner=dim,
        out_cap=cap,
    )
    return CsVec(res.indices, res.values[0], res.nnz, dim)


def empty_csvec(dim: int, dtype=jnp.float32, *, cap: int = 1) -> CsVec:
    return CsVec(
        jnp.zeros((cap,), INDEX_DTYPE),
        jnp.zeros((cap,), dtype),
        jnp.zeros((), INDEX_DTYPE),
        dim,
    )
