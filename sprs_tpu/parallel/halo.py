"""Halo-exchange distributed SpMV for banded matrices.

SURVEY §5.8 / §7-hard-part-5: row-partitioned SpMV where each shard's
column accesses stay within a bounded window of its own row range (true
for grid Laplacians and anything RCM-ordered) needs no ``all_gather`` —
only the ``halo`` boundary columns from the left/right neighbor shards.
The exchange is two ``ppermute`` shifts over ICI, O(halo) bytes per
device instead of O(n): the difference between weak-scalable and not.

Shard layout (host-built by :func:`shard_csr_rows_halo`): shard ``s``
owns rows [s·rp, (s+1)·rp); its column ids are rebased to the local
window [s·rp − halo, (s+1)·rp + halo).  The device kernel ppermutes the
halo slices, concatenates ``[left | own | right]``, and runs the local
SpMV.  Requires a square matrix partitioned identically on rows/cols.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..errors import ShapeError
from ..formats.csmat import CSR, CsMat
from ..ops.prod import spmv


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class HaloCsMat:
    """Row-sharded CSR with window-local column ids and halo width."""

    indptr: jax.Array  # (S, rp+1)
    indices: jax.Array  # (S, cap) — local ids in [0, rp + 2*halo)
    data: jax.Array  # (S, cap)
    shape: Tuple[int, int]
    halo: int

    def tree_flatten(self):
        return (self.indptr, self.indices, self.data), (
            self.shape,
            self.halo,
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, aux[0], aux[1])

    @property
    def n_shards(self) -> int:
        return self.indptr.shape[0]

    @property
    def rows_per_shard(self) -> int:
        return self.indptr.shape[1] - 1


def shard_csr_rows_halo(mat: CsMat, n_shards: int) -> HaloCsMat:
    """Host-side partition; raises ShapeError when some entry reaches
    beyond one neighbor shard (bandwidth > rows_per_shard)."""
    csr = mat.to_csr()
    rows, cols = csr.shape
    if rows != cols:
        raise ShapeError("halo sharding needs a square matrix")
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices)
    data = np.asarray(csr.data)

    rp = _cdiv(max(rows, 1), n_shards)
    # halo = max reach of any entry outside its shard's own column range
    entry_rows = np.repeat(np.arange(rows, dtype=np.int64), np.diff(indptr))
    shard_of = entry_rows // rp
    lo = shard_of * rp
    hi = np.minimum(lo + rp, rows)
    nnz = int(indptr[-1])
    reach_left = np.maximum(lo - indices[:nnz], 0)
    reach_right = np.maximum(indices[:nnz] - (hi - 1), 0)
    halo = int(max(reach_left.max(initial=0), reach_right.max(initial=0)))
    if halo > rp:
        raise ShapeError(
            f"bandwidth {halo} exceeds rows_per_shard {rp}; use dist_spmv"
        )

    cap = 1
    for s in range(n_shards):
        a, b = min(s * rp, rows), min((s + 1) * rp, rows)
        cap = max(cap, int(indptr[b] - indptr[a]))
    ip = np.zeros((n_shards, rp + 1), dtype=np.int32)
    ix = np.zeros((n_shards, cap), dtype=np.int32)
    dt = np.zeros((n_shards, cap), dtype=data.dtype)
    for s in range(n_shards):
        a, b = min(s * rp, rows), min((s + 1) * rp, rows)
        base = indptr[a]
        local_ptr = indptr[a : b + 1] - base
        ip[s, : b - a + 1] = local_ptr
        ip[s, b - a + 1 :] = local_ptr[-1]
        k = int(local_ptr[-1])
        # rebase columns to the local window [s*rp - halo, ...)
        ix[s, :k] = indices[base : base + k] - (s * rp - halo)
        dt[s, :k] = data[base : base + k]
    return HaloCsMat(
        jnp.asarray(ip), jnp.asarray(ix), jnp.asarray(dt), (rows, cols), halo
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class HaloSplitCsMat:
    """Halo-sharded CSR split into interior and boundary parts.

    ``interior`` columns are shard-local row ids [0, rp); ``boundary``
    columns index the 2·halo-long halo buffer (left halo first).  The
    split lets the SpMV over interior entries run concurrently with the
    ppermute halo exchange — XLA schedules them in parallel because the
    interior product has no data dependency on the collective ("overlap
    halo exchange with interior compute", SURVEY §7 hard part 5).
    """

    int_indptr: jax.Array  # (S, rp+1)
    int_indices: jax.Array  # (S, cap_i)
    int_data: jax.Array
    bnd_indptr: jax.Array  # (S, rp+1)
    bnd_indices: jax.Array  # (S, cap_b) — into the halo buffer
    bnd_data: jax.Array
    shape: Tuple[int, int]
    halo: int

    def tree_flatten(self):
        return (
            self.int_indptr,
            self.int_indices,
            self.int_data,
            self.bnd_indptr,
            self.bnd_indices,
            self.bnd_data,
        ), (self.shape, self.halo)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, aux[0], aux[1])

    @property
    def n_shards(self) -> int:
        return self.int_indptr.shape[0]

    @property
    def rows_per_shard(self) -> int:
        return self.int_indptr.shape[1] - 1


def shard_csr_rows_halo_split(mat: CsMat, n_shards: int) -> HaloSplitCsMat:
    """Host-side partition into interior + boundary shard matrices."""
    base = shard_csr_rows_halo(mat, n_shards)
    rp = base.rows_per_shard
    halo = base.halo
    S = base.n_shards

    ii_p = np.zeros((S, rp + 1), np.int32)
    bi_p = np.zeros((S, rp + 1), np.int32)
    ii_x, ii_d, bi_x, bi_d = [], [], [], []
    for s in range(S):
        ip = np.asarray(base.indptr[s])
        nnz = int(ip[-1])
        idx = np.asarray(base.indices[s])[:nnz]  # window coords
        dat = np.asarray(base.data[s])[:nnz]
        rows = np.repeat(np.arange(rp), np.diff(ip))
        interior = (idx >= halo) & (idx < halo + rp)
        # interior: rebase to [0, rp); boundary: left halo -> [0, halo),
        # right halo -> [halo, 2*halo)
        i_idx = idx[interior] - halo
        b_raw = idx[~interior]
        b_idx = np.where(b_raw < halo, b_raw, b_raw - rp)
        ii_p[s, 1:] = np.cumsum(np.bincount(rows[interior], minlength=rp))
        bi_p[s, 1:] = np.cumsum(np.bincount(rows[~interior], minlength=rp))
        ii_x.append(i_idx)
        ii_d.append(dat[interior])
        bi_x.append(b_idx)
        bi_d.append(dat[~interior])
    cap_i = max(max((len(a) for a in ii_x), default=1), 1)
    cap_b = max(max((len(a) for a in bi_x), default=1), 1)
    dtype = np.asarray(base.data).dtype

    def pack(lst, cap, dt):
        out = np.zeros((S, cap), dt)
        for s, a in enumerate(lst):
            out[s, : len(a)] = a
        return jnp.asarray(out)

    return HaloSplitCsMat(
        jnp.asarray(ii_p),
        pack(ii_x, cap_i, np.int32),
        pack(ii_d, cap_i, dtype),
        jnp.asarray(bi_p),
        pack(bi_x, cap_b, np.int32),
        pack(bi_d, cap_b, dtype),
        base.shape,
        halo,
    )


def dist_spmv_halo_overlap(
    dmat: HaloSplitCsMat, x, mesh: Mesh, *, axis: str = "shards"
) -> jax.Array:
    """y = A @ x with the halo ppermute overlapped against the interior
    SpMV (independent dataflow; XLA schedules them concurrently)."""
    x = jnp.asarray(x)
    if x.shape[0] != dmat.shape[1]:
        raise ShapeError(f"dist_spmv_halo: A {dmat.shape}, x {x.shape}")
    S = dmat.n_shards
    rp = dmat.rows_per_shard
    halo = dmat.halo
    xp = jnp.pad(x, (0, S * rp - x.shape[0]))

    fwd = [(i, i + 1) for i in range(S - 1)]
    bwd = [(i + 1, i) for i in range(S - 1)]

    def kernel(iip, iix, iid, bip, bix, bid, xs):
        xs = xs.reshape(rp)
        interior = CsMat(iip[0], iix[0], iid[0], (rp, rp), CSR)
        y = spmv(interior, xs)  # no comms — overlaps with ppermute
        if halo > 0:
            from_left = jax.lax.ppermute(xs[rp - halo :], axis, perm=fwd)
            from_right = jax.lax.ppermute(xs[:halo], axis, perm=bwd)
            halo_x = jnp.concatenate([from_left, from_right])
            boundary = CsMat(
                bip[0], bix[0], bid[0], (rp, 2 * halo), CSR
            )
            y = y + spmv(boundary, halo_x)
        return y

    return jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(axis),) * 7,
        out_specs=P(axis),
    )(
        dmat.int_indptr,
        dmat.int_indices,
        dmat.int_data,
        dmat.bnd_indptr,
        dmat.bnd_indices,
        dmat.bnd_data,
        xp,
    )


def dist_spmv_halo(
    dmat: HaloCsMat, x, mesh: Mesh, *, axis: str = "shards"
) -> jax.Array:
    """y = A @ x with x row-sharded and only O(halo) communication.

    Two ``ppermute`` shifts exchange the boundary slices; edge shards
    receive zeros (ppermute's semantics for absent sources), which is
    correct because no entry reaches outside the matrix.  Output is
    row-sharded with the same padded length as the input.
    """
    x = jnp.asarray(x)
    if x.shape[0] != dmat.shape[1]:
        raise ShapeError(f"dist_spmv_halo: A {dmat.shape}, x {x.shape}")
    S = dmat.n_shards
    rp = dmat.rows_per_shard
    halo = dmat.halo
    xp = jnp.pad(x, (0, S * rp - x.shape[0]))
    cols_local = rp + 2 * halo

    fwd = [(i, i + 1) for i in range(S - 1)]  # send to right neighbor
    bwd = [(i + 1, i) for i in range(S - 1)]  # send to left neighbor

    def kernel(ip, ix, dt, xs):
        xs = xs.reshape(rp)
        if halo > 0:
            # my top `halo` rows go right; my bottom `halo` go left
            from_left = jax.lax.ppermute(xs[rp - halo :], axis, perm=fwd)
            from_right = jax.lax.ppermute(xs[:halo], axis, perm=bwd)
            x_win = jnp.concatenate([from_left, xs, from_right])
        else:
            x_win = xs
        local = CsMat(ip[0], ix[0], dt[0], (rp, cols_local), CSR)
        return spmv(local, x_win)

    return jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )(dmat.indptr, dmat.indices, dmat.data, xp)
