"""Distributed sparse kernels over a JAX device mesh.

The reference's only parallelism is rayon shared-memory row-chunking
inside SpGEMM (/root/reference/sprs/src/sparse/smmp.rs:26-58,196-416:
even row chunks for the symbolic pass, nnz-balanced re-chunking for the
numeric pass, fan-out/fan-in).  The TPU-native generalization distributes
over a device mesh with shard_map + XLA collectives:

* **Row partitioning (1-D)** — each device owns a contiguous row block
  of the CSR matrix (column indices stay global).  SpMV gathers the
  needed x (replicated or ``all_gather``-ed over ICI) and reduces
  locally; SpGEMM runs the ESC kernel on local rows against a replicated
  (or gathered) B, the direct analog of the reference's row-chunk
  fan-out.  ``balance="nnz"`` places block boundaries by cumulative nnz —
  exactly the reference's nnz-balanced chunking (smmp.rs:335-372) turned
  into a sharding spec.
* **2-D block partitioning** — mesh axes (rows × cols): device (i, j)
  owns block (i, j) with *local* column indices; x is sharded over the
  col axis, partial products are ``psum``-ed over it, y comes out
  row-sharded.  This is the sparse analog of tensor-parallel matmul and
  the layout that scales SpMV past one chip's HBM.

Everything here is jittable; shard counts and caps are static.  Tests
run on a virtual 8-device CPU mesh (XLA_FLAGS
--xla_force_host_platform_device_count), the analog of the reference's
fixed-thread-count determinism tests (smmp.rs:491-513).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..errors import ShapeError
from ..formats.csmat import CSR, CsMat
from ..formats.util import INDEX_DTYPE
from ..ops.prod import spmv
from ..ops.spgemm import spgemm


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# 1-D row partitioning
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DistCsMat:
    """Row-sharded CSR: leaves carry a leading shard axis.

    ``indptr (S, rows_per+1)``, ``indices/data (S, cap_per)``; rows are
    padded to ``S * rows_per`` (padding rows are empty).  Column indices
    are global.
    """

    indptr: jax.Array
    indices: jax.Array
    data: jax.Array
    row_ids: jax.Array  # (S, rows_per) global row of each local row;
    # padding rows carry the sentinel shape[0].  Needed because
    # nnz-balanced shards have ragged true row counts: the flat
    # row-sharded output is NOT globally contiguous (each shard pads at
    # its end) — assemble() undoes that.
    shape: Tuple[int, int]  # true (unpadded) global shape

    def tree_flatten(self):
        return (self.indptr, self.indices, self.data, self.row_ids), (
            self.shape,
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, aux[0])

    def assemble(self, y: jax.Array) -> jax.Array:
        """Map a flat row-sharded result (S*rows_per[, k]) back to global
        row order (shape[0][, k]).  Jittable."""
        rows = self.shape[0]
        ids = self.row_ids.reshape(-1)
        live = ids < rows
        idx = jnp.where(live, ids, 0)
        out_shape = (rows,) + tuple(y.shape[1:])
        zero = jnp.zeros((), y.dtype)
        contrib = jnp.where(
            live if y.ndim == 1 else live[:, None], y, zero
        )
        return jnp.zeros(out_shape, y.dtype).at[idx].add(contrib)

    @property
    def n_shards(self) -> int:
        return self.indptr.shape[0]

    @property
    def rows_per_shard(self) -> int:
        return self.indptr.shape[1] - 1

    @property
    def cap_per_shard(self) -> int:
        return self.indices.shape[1]

    @property
    def padded_rows(self) -> int:
        return self.n_shards * self.rows_per_shard

    def local_mat(self, s) -> CsMat:
        """The CsMat of one shard (shard-local row numbering)."""
        return CsMat(
            self.indptr[s],
            self.indices[s],
            self.data[s],
            (self.rows_per_shard, self.shape[1]),
            CSR,
        )

    def to_csmat(self) -> CsMat:
        """Gather back to a single (host-side) CsMat."""
        from ..ops.construct import vstack

        ids = np.asarray(self.row_ids)
        blocks = []
        for s in range(self.n_shards):
            true_rows = int((ids[s] < self.shape[0]).sum())
            blocks.append(self.local_mat(s).slice_outer(0, true_rows))
        return vstack(blocks)


def shard_csr_rows(
    mat: CsMat,
    n_shards: int,
    *,
    balance: str = "rows",
) -> DistCsMat:
    """Partition a CSR matrix into ``n_shards`` row blocks (host-side).

    ``balance="rows"``: equal row counts.  ``balance="nnz"``: boundaries
    chosen by cumulative nnz (smmp.rs:335-372 analog) — still materialized
    as equal-size padded blocks so shapes stay uniform, but the heavy
    rows spread evenly.
    """
    csr = mat.to_csr()
    rows, cols = csr.shape
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices)
    data = np.asarray(csr.data)
    nnz = int(csr.nnz)

    rows_per = _cdiv(max(rows, 1), n_shards)
    if balance == "rows":
        bounds = [min(s * rows_per, rows) for s in range(n_shards + 1)]
    elif balance == "nnz":
        target = np.linspace(0, nnz, n_shards + 1)
        bounds = [
            int(np.searchsorted(indptr, t, side="left")) for t in target
        ]
        bounds[0], bounds[-1] = 0, rows
        for s in range(1, n_shards + 1):  # keep monotone
            bounds[s] = max(bounds[s], bounds[s - 1])
        rows_per = max(
            max(bounds[s + 1] - bounds[s] for s in range(n_shards)), 1
        )
    else:
        raise ValueError(f"unknown balance {balance!r}")

    cap_per = max(
        max(
            (int(indptr[bounds[s + 1]] - indptr[bounds[s]]) for s in range(n_shards)),
            default=1,
        ),
        1,
    )
    ip = np.zeros((n_shards, rows_per + 1), dtype=np.int32)
    ix = np.zeros((n_shards, cap_per), dtype=np.int32)
    dt = np.zeros((n_shards, cap_per), dtype=data.dtype)
    rid = np.full((n_shards, rows_per), rows, dtype=np.int32)
    for s in range(n_shards):
        lo, hi = bounds[s], bounds[s + 1]
        nr = hi - lo
        base = indptr[lo]
        local_ptr = indptr[lo : hi + 1] - base
        ip[s, : nr + 1] = local_ptr
        ip[s, nr + 1 :] = local_ptr[-1]  # padding rows are empty
        rid[s, :nr] = np.arange(lo, hi, dtype=np.int32)
        k = int(local_ptr[-1])
        ix[s, :k] = indices[base : base + k]
        dt[s, :k] = data[base : base + k]
    return DistCsMat(
        jnp.asarray(ip),
        jnp.asarray(ix),
        jnp.asarray(dt),
        jnp.asarray(rid),
        (rows, cols),
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PreparedDistSpmv:
    """Routing decision + prepared shards for distributed SpMV.

    ``kind='halo'`` wraps a :class:`~sprs_tpu.parallel.halo.HaloSplitCsMat`
    and runs :func:`~sprs_tpu.parallel.halo.dist_spmv_halo_overlap`
    (O(halo) ppermute bytes per device, overlapped with the interior
    product); ``kind='allgather'`` wraps a :class:`DistCsMat` and
    all-gathers the sharded x (O(n) bytes).  Built by
    :func:`prepare_dist_spmv`.  The object is a pytree — pass it
    through jit as an argument.
    """

    kind: str
    dmat: object

    def tree_flatten(self):
        return (self.dmat,), (self.kind,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(aux[0], leaves[0])

    @property
    def n_shards(self) -> int:
        return self.dmat.n_shards

    @property
    def shape(self):
        return self.dmat.shape

    def __call__(self, x, mesh: Mesh, *, axis: str = "shards"):
        if self.kind == "halo":
            from .halo import dist_spmv_halo_overlap

            return dist_spmv_halo_overlap(self.dmat, x, mesh, axis=axis)
        return dist_spmv(self.dmat, x, mesh, axis=axis, x_sharded=True)


def prepare_dist_spmv(
    mat: CsMat,
    n_shards: int,
    *,
    halo_frac: float = 0.25,
) -> PreparedDistSpmv:
    """Host-side routing for distributed SpMV over a 1-D mesh axis.

    The byte model (results_scaling_virtual8.jsonl, round 4) says the
    all-gather path's weak-scaling efficiency decays to ~0.63 at 8
    devices (every device receives the full x) while the halo path
    holds ~0.999 (O(halo) ppermute bytes).  Routing rule: measure the
    partition's true halo width (max column reach outside each shard's
    own row window, O(nnz) host work) and take the halo path whenever
    it is feasible (halo <= rows_per_shard, square matrix) and the
    exchange is genuinely local (2*halo <= halo_frac * n) — banded /
    RCM-ordered / grid operators qualify, scattered column patterns
    fall back to all-gather.  Reference analog: the nnz-balanced row
    chunking that is SMMP's only distribution axis (smmp.rs:335-372)
    never needed the distinction — a shared-memory x is free.
    """
    csr = mat.to_csr()
    rows, cols = csr.shape
    if rows == cols:
        rp = _cdiv(max(rows, 1), n_shards)
        indptr = np.asarray(csr.indptr)
        nnz = int(indptr[-1])
        indices = np.asarray(csr.indices)[:nnz]
        entry_rows = np.repeat(
            np.arange(rows, dtype=np.int64), np.diff(indptr)
        )
        shard_of = entry_rows // rp
        lo = shard_of * rp
        hi = np.minimum(lo + rp, rows)
        reach_l = np.maximum(lo - indices, 0)
        reach_r = np.maximum(indices - (hi - 1), 0)
        halo = int(max(reach_l.max(initial=0), reach_r.max(initial=0)))
        if halo <= rp and 2 * halo <= halo_frac * cols:
            from .halo import shard_csr_rows_halo_split

            return PreparedDistSpmv(
                "halo", shard_csr_rows_halo_split(csr, n_shards)
            )
    return PreparedDistSpmv("allgather", shard_csr_rows(csr, n_shards))


def dist_spmv(
    dmat: DistCsMat,
    x,
    mesh: Mesh,
    *,
    axis: str = "shards",
    x_sharded: bool = False,
) -> jax.Array:
    """y = A @ x with A row-sharded over ``mesh[axis]``.

    With ``x_sharded=True`` the input x is sharded over the same axis
    and all-gathered over ICI inside the kernel (the halo-exchange path);
    otherwise x is replicated.  Output is row-sharded (padded length).
    """
    x = jnp.asarray(x)
    if x.shape[0] != dmat.shape[1]:
        raise ShapeError(f"dist_spmv: A {dmat.shape}, x {x.shape}")
    rows_per = dmat.rows_per_shard
    cols = dmat.shape[1]

    if x_sharded:
        pad = dmat.n_shards * _cdiv(cols, dmat.n_shards) - cols
        xp = jnp.pad(x, (0, pad))

        def kernel(ip, ix, dt, xs):
            xg = jax.lax.all_gather(xs, axis, tiled=True)[:cols]
            local = CsMat(ip[0], ix[0], dt[0], (rows_per, cols), CSR)
            return spmv(local, xg)

        return jax.shard_map(
            kernel,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=P(axis),
        )(dmat.indptr, dmat.indices, dmat.data, xp)

    def kernel(ip, ix, dt, xr):
        local = CsMat(ip[0], ix[0], dt[0], (rows_per, cols), CSR)
        return spmv(local, xr)

    return jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
    )(dmat.indptr, dmat.indices, dmat.data, x)


def dist_spmm(
    dmat: DistCsMat,
    x,
    mesh: Mesh,
    *,
    axis: str = "shards",
    x_sharded: bool = False,
) -> jax.Array:
    """Y = A @ X for a dense RHS ``X (cols, k)`` with A row-sharded.

    Multi-RHS twin of :func:`dist_spmv`: with ``x_sharded`` the RHS is
    row-sharded and all-gathered over ICI inside the kernel, otherwise
    replicated.  Output is row-sharded (padded length)."""
    from ..ops.prod import spmm

    x = jnp.asarray(x)
    if x.ndim != 2 or x.shape[0] != dmat.shape[1]:
        raise ShapeError(f"dist_spmm: A {dmat.shape}, X {x.shape}")
    rows_per = dmat.rows_per_shard
    cols = dmat.shape[1]

    if x_sharded:
        pad = dmat.n_shards * _cdiv(cols, dmat.n_shards) - cols
        xp = jnp.pad(x, ((0, pad), (0, 0)))

        def kernel(ip, ix, dt, xs):
            xg = jax.lax.all_gather(xs, axis, tiled=True)[:cols]
            local = CsMat(ip[0], ix[0], dt[0], (rows_per, cols), CSR)
            return spmm(local, xg)

        return jax.shard_map(
            kernel,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis, None)),
            out_specs=P(axis, None),
        )(dmat.indptr, dmat.indices, dmat.data, xp)

    def kernel(ip, ix, dt, xr):
        local = CsMat(ip[0], ix[0], dt[0], (rows_per, cols), CSR)
        return spmm(local, xr)

    return jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(None, None)),
        out_specs=P(axis, None),
    )(dmat.indptr, dmat.indices, dmat.data, x)


def dist_spgemm(
    dmat: DistCsMat,
    b: CsMat,
    mesh: Mesh,
    *,
    axis: str = "shards",
    prod_cap: Optional[int] = None,
    out_cap: Optional[int] = None,
) -> DistCsMat:
    """C = A @ B with A row-sharded, B replicated: each device runs the
    ESC SpGEMM on its row block (the smmp.rs row-chunk fan-out over
    devices instead of rayon threads)."""
    b = b.to_csr()
    if dmat.shape[1] != b.shape[0]:
        raise ShapeError(f"dist_spgemm: {dmat.shape} @ {b.shape}")
    rows_per = dmat.rows_per_shard
    if prod_cap is None:
        # host-computed exact per-shard bound, maxed across shards
        b_lens = np.diff(np.asarray(b.indptr))
        caps = []
        for s in range(dmat.n_shards):
            nnz_s = int(np.asarray(dmat.indptr)[s, -1])
            idx = np.asarray(dmat.indices)[s, :nnz_s]
            caps.append(int(b_lens[idx].sum()) if nnz_s else 0)
        prod_cap = max(max(caps), 1)
    if out_cap is None:
        out_cap = prod_cap

    def kernel(ip, ix, dt):
        local = CsMat(
            ip[0], ix[0], dt[0], (rows_per, dmat.shape[1]), CSR
        )
        c = spgemm(
            local,
            b,
            prod_cap=prod_cap,
            out_cap=out_cap,
            check_capacity=False,
        )
        return c.indptr[None], c.indices[None], c.data[None]

    cip, cix, cdt = jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
    )(dmat.indptr, dmat.indices, dmat.data)
    return DistCsMat(
        cip, cix, cdt, dmat.row_ids, (dmat.shape[0], b.shape[1])
    )


def dist_spgemm_bshard(
    da: DistCsMat,
    db: DistCsMat,
    mesh: Mesh,
    *,
    axis: str = "shards",
    prod_cap: Optional[int] = None,
    out_cap: Optional[int] = None,
) -> DistCsMat:
    """C = A @ B with BOTH operands row-sharded (SURVEY §5.8's
    "all-gather of remote B rows" schedule).

    Each device all-gathers B's shard arrays over ICI and runs the local
    ESC expand against the *gap-padded* concatenation: shard s's entries
    live at flat offsets [s·cap_B, s·cap_B + nnz_s), so row spans stay
    valid without compaction — the expand kernel only ever addresses
    entries inside a row's span (ops/spgemm._expand_from_rows).

    Requires ``db`` to be rows-balanced (equal contiguous blocks) so the
    global row id of B row r is simply r.
    """
    if da.shape[1] != db.shape[0]:
        raise ShapeError(f"dist_spgemm_bshard: {da.shape} @ {db.shape}")
    ids = np.asarray(db.row_ids)
    S = db.n_shards
    rp_b = db.rows_per_shard
    expect = np.arange(S * rp_b).reshape(S, rp_b)
    live_b = ids < db.shape[0]
    if not np.array_equal(ids[live_b], expect[live_b]):
        raise ShapeError(
            "dist_spgemm_bshard needs rows-balanced B shards "
            '(shard_csr_rows(..., balance="rows"))'
        )
    rows_per = da.rows_per_shard
    cap_b = db.cap_per_shard

    if prod_cap is None:
        # exact per-A-shard bound against global B row lengths (host)
        b_lens = np.zeros(db.shape[0] + 1, dtype=np.int64)
        for s in range(S):
            lip = np.asarray(db.indptr)[s]
            lens = np.diff(lip)
            r0 = s * rp_b
            take = min(rp_b, db.shape[0] - r0)
            if take > 0:
                b_lens[r0 : r0 + take] = lens[:take]
        caps = []
        for s in range(da.n_shards):
            nnz_s = int(np.asarray(da.indptr)[s, -1])
            idx = np.asarray(da.indices)[s, :nnz_s]
            caps.append(int(b_lens[idx].sum()) if nnz_s else 0)
        prod_cap = max(max(caps), 1)
    if out_cap is None:
        out_cap = prod_cap

    from ..formats.util import compress_coo
    from ..ops.spgemm import _expand_from_rows

    n_inner = db.shape[1]
    padded_b_rows = S * rp_b

    def kernel(aip, aix, adt, bip, bix, bdt):
        g_ip = jax.lax.all_gather(bip[0], axis)  # (S, rp_b+1)
        g_ix = jax.lax.all_gather(bix[0], axis).reshape(-1)
        g_dt = jax.lax.all_gather(bdt[0], axis).reshape(-1)
        offs = (
            jnp.arange(S, dtype=INDEX_DTYPE)[:, None] * cap_b
        )
        b_starts = (g_ip[:, :-1] + offs).reshape(-1)
        b_lens = (g_ip[:, 1:] - g_ip[:, :-1]).reshape(-1)

        local = CsMat(
            aip[0], aix[0], adt[0], (rows_per, padded_b_rows), CSR
        )
        rows, cols, vals, total = _expand_from_rows(
            local, b_starts, b_lens, g_ix, g_dt, prod_cap
        )
        res = compress_coo(
            rows=rows,
            cols=cols,
            value_channels=(vals,),
            nvalid=total,
            n_outer=rows_per,
            n_inner=n_inner,
            out_cap=out_cap,
        )
        return (
            res.indptr[None],
            res.indices[None],
            res.values[0][None],
        )

    cip, cix, cdt = jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(axis),) * 6,
        out_specs=(P(axis), P(axis), P(axis)),
    )(da.indptr, da.indices, da.data, db.indptr, db.indices, db.data)
    return DistCsMat(
        cip, cix, cdt, da.row_ids, (da.shape[0], db.shape[1])
    )


@dataclasses.dataclass(frozen=True)
class BGatherPlan:
    """Host-built schedule for :func:`dist_spgemm_bgather`.

    ``rounds`` ppermute rounds fetch, per device, only the B row blocks
    its local A columns reference (SURVEY §5.8's "gather referenced B
    rows" schedule at block granularity).  SPMD needs uniform shapes, so
    every device runs ``rounds`` = max referenced-block count; devices
    with fewer refs re-fetch their own block (a local copy, no ICI
    traffic for the self-pair).

    ``perms[k]`` is the (src, dst) pair list of round k — a valid XLA
    CollectivePermute (targets unique; sources may repeat = multicast).
    ``slot_of_block[i, g]`` is the round index at which device i received
    block g, or ``rounds`` if unreferenced.  ``comm_blocks``/
    ``full_blocks`` quantify the saving vs a full all-gather.
    """

    rounds: int  # ppermute rounds (edge-coloring colors)
    perms: Tuple[Tuple[Tuple[int, int], ...], ...]
    slot_of_block: np.ndarray  # (S, S) int32; slot 0 = own block
    comm_blocks: int  # max REMOTE blocks fetched by any device
    mean_blocks: float  # mean remote blocks per device
    full_blocks: int  # what all-gather would move (= S-1 remote)

    @property
    def comm_fraction(self) -> float:
        """Per-device remote B traffic relative to a full all-gather."""
        return self.comm_blocks / max(self.full_blocks, 1)


def plan_b_gather(da: DistCsMat, db: DistCsMat) -> BGatherPlan:
    """Build the referenced-block gather schedule (host-side, concrete).

    For each A shard i, the set of B row blocks {col // rp_b} touched by
    its column indices.  The reference's SMMP fan-out touches exactly the
    B rows named by A's columns (smmp.rs:129-145); this is that access
    pattern lifted to block granularity over a device mesh.

    Device i's own block is always available locally (slot 0, no
    traffic).  Remote demands form a bipartite multigraph (owner →
    requester); XLA's CollectivePermute needs unique sources AND
    targets per round, so the demand edges are greedily edge-colored
    into proper partial permutations — at most 2Δ−1 rounds for maximum
    degree Δ (König guarantees Δ exist; greedy is near enough and
    O(E·Δ)).  A popular block (dense column of A) degrades gracefully
    toward the all-gather schedule, which is its true traffic.
    """
    S = da.n_shards
    if db.n_shards != S:
        raise ShapeError(
            f"plan_b_gather: {S} A shards vs {db.n_shards} B shards"
        )
    rp_b = db.rows_per_shard
    refs = []
    ip = np.asarray(da.indptr)
    ix = np.asarray(da.indices)
    for i in range(S):
        nnz_i = int(ip[i, -1])
        blocks = (
            np.unique(ix[i, :nnz_i] // rp_b)
            if nnz_i
            else np.zeros((0,), np.int64)
        )
        refs.append([int(g) for g in blocks if g < S and g != i])
    mean_blocks = float(np.mean([len(r) for r in refs])) if S else 0.0
    max_blocks = max((len(r) for r in refs), default=0)

    # greedy proper edge coloring of the (owner, requester) edges
    src_used = [set() for _ in range(S)]  # colors busy at each source
    dst_used = [set() for _ in range(S)]
    color_of = {}
    for i in range(S):
        for g in refs[i]:
            c = 0
            while c in src_used[g] or c in dst_used[i]:
                c += 1
            color_of[(g, i)] = c
            src_used[g].add(c)
            dst_used[i].add(c)
    K = 1 + max(color_of.values()) if color_of else 0

    nslots = K + 1  # slot 0 = own block
    slot = np.full((S, S), nslots, dtype=np.int32)
    for i in range(S):
        slot[i, i] = 0
    perms = [[] for _ in range(K)]
    for (g, i), c in color_of.items():
        perms[c].append((g, i))
        slot[i, g] = 1 + c
    return BGatherPlan(
        rounds=K,
        perms=tuple(tuple(p) for p in perms),
        slot_of_block=slot,
        comm_blocks=max_blocks,
        mean_blocks=mean_blocks,
        full_blocks=max(S - 1, 1),
    )


def dist_spgemm_bgather(
    da: DistCsMat,
    db: DistCsMat,
    mesh: Mesh,
    *,
    axis: str = "shards",
    plan: Optional[BGatherPlan] = None,
    prod_cap: Optional[int] = None,
    out_cap: Optional[int] = None,
) -> DistCsMat:
    """C = A @ B, both row-sharded, fetching ONLY referenced B blocks.

    Where :func:`dist_spgemm_bshard` all-gathers every B shard to every
    device (O(nnz(B)) memory/traffic per device), this runs
    ``plan.rounds`` static ppermute rounds: round k delivers to device i
    the k-th B block its local A columns reference.  Per-device traffic
    and gathered memory are O(max_i refs_i · nnz(B)/S) — proportional to
    referenced rows, the SURVEY §5.8 schedule.  For banded/local
    matrices refs_i ≪ S and this rides ICI neighbor links.

    Requires ``db`` rows-balanced (``balance="rows"``) so block g owns
    rows [g·rp_b, (g+1)·rp_b).
    """
    if da.shape[1] != db.shape[0]:
        raise ShapeError(f"dist_spgemm_bgather: {da.shape} @ {db.shape}")
    ids = np.asarray(db.row_ids)
    S = db.n_shards
    rp_b = db.rows_per_shard
    expect = np.arange(S * rp_b).reshape(S, rp_b)
    live_b = ids < db.shape[0]
    if not np.array_equal(ids[live_b], expect[live_b]):
        raise ShapeError(
            "dist_spgemm_bgather needs rows-balanced B shards "
            '(shard_csr_rows(..., balance="rows"))'
        )
    if plan is None:
        plan = plan_b_gather(da, db)
    K = plan.rounds
    rows_per = da.rows_per_shard
    cap_b = db.cap_per_shard

    if prod_cap is None:
        b_lens_h = np.zeros(db.shape[0] + 1, dtype=np.int64)
        for s in range(S):
            lip = np.asarray(db.indptr)[s]
            lens = np.diff(lip)
            r0 = s * rp_b
            take = min(rp_b, db.shape[0] - r0)
            if take > 0:
                b_lens_h[r0 : r0 + take] = lens[:take]
        caps = []
        for s in range(da.n_shards):
            nnz_s = int(np.asarray(da.indptr)[s, -1])
            idx = np.asarray(da.indices)[s, :nnz_s]
            caps.append(int(b_lens_h[idx].sum()) if nnz_s else 0)
        prod_cap = max(max(caps), 1)
    if out_cap is None:
        out_cap = prod_cap

    from ..formats.util import compress_coo
    from ..ops.spgemm import _expand_from_rows

    n_inner = db.shape[1]
    padded_b_rows = S * rp_b
    slot_dev = jnp.asarray(plan.slot_of_block)  # (S, S)
    perms = plan.perms

    nslots = K + 1  # slot 0 = own block, local copy

    def kernel(aip, aix, adt, bip, bix, bdt, slot_row):
        # slot 0: own block; round k: the color-k partial permutation
        g_ip, g_ix, g_dt = [bip[0]], [bix[0]], [bdt[0]]
        for k in range(K):
            g_ip.append(jax.lax.ppermute(bip[0], axis, perms[k]))
            g_ix.append(jax.lax.ppermute(bix[0], axis, perms[k]))
            g_dt.append(jax.lax.ppermute(bdt[0], axis, perms[k]))
        g_ip = jnp.stack(g_ip)  # (nslots, rp_b+1)
        g_ix = jnp.concatenate(g_ix)  # (nslots*cap_b,)
        g_dt = jnp.concatenate(g_dt)

        # map global (padded) B row -> span in the gathered arrays
        r = jnp.arange(padded_b_rows, dtype=INDEX_DTYPE)
        g = r // rp_b
        lr = r - g * rp_b
        sl = slot_row[0][g]  # (padded_b_rows,)
        safe = jnp.minimum(sl, nslots - 1)
        start = safe * cap_b + g_ip[safe, lr]
        lens = jnp.where(
            sl < nslots, g_ip[safe, lr + 1] - g_ip[safe, lr], 0
        ).astype(INDEX_DTYPE)

        local = CsMat(
            aip[0], aix[0], adt[0], (rows_per, padded_b_rows), CSR
        )
        rows, cols, vals, total = _expand_from_rows(
            local, start.astype(INDEX_DTYPE), lens, g_ix, g_dt, prod_cap
        )
        res = compress_coo(
            rows=rows,
            cols=cols,
            value_channels=(vals,),
            nvalid=total,
            n_outer=rows_per,
            n_inner=n_inner,
            out_cap=out_cap,
        )
        return (
            res.indptr[None],
            res.indices[None],
            res.values[0][None],
        )

    cip, cix, cdt = jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(axis),) * 7,
        out_specs=(P(axis), P(axis), P(axis)),
    )(
        da.indptr,
        da.indices,
        da.data,
        db.indptr,
        db.indices,
        db.data,
        slot_dev,
    )
    return DistCsMat(
        cip, cix, cdt, da.row_ids, (da.shape[0], db.shape[1])
    )


# ---------------------------------------------------------------------------
# 2-D block partitioning
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Dist2DCsMat:
    """Block-partitioned CSR over an (R, C) mesh.

    Leaves have leading (R, C) axes; block (i, j) stores rows
    [i·rp, (i+1)·rp) × cols [j·cp, (j+1)·cp) with *local* column ids.
    """

    indptr: jax.Array  # (R, C, rp+1)
    indices: jax.Array  # (R, C, cap)
    data: jax.Array  # (R, C, cap)
    shape: Tuple[int, int]

    def tree_flatten(self):
        return (self.indptr, self.indices, self.data), (self.shape,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, aux[0])

    @property
    def grid(self) -> Tuple[int, int]:
        return self.indptr.shape[0], self.indptr.shape[1]

    @property
    def rows_per(self) -> int:
        return self.indptr.shape[2] - 1


def shard_csr_2d(mat: CsMat, grid: Tuple[int, int]) -> Tuple[Dist2DCsMat, int]:
    """Partition into an R×C block grid (host-side).

    Returns the distributed matrix and ``cols_per`` (the local column
    width each block uses).
    """
    csr = mat.to_csr()
    rows, cols = csr.shape
    R, C = grid
    rp = _cdiv(max(rows, 1), R)
    cp = _cdiv(max(cols, 1), C)
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices)
    data = np.asarray(csr.data)

    # bucket entries per block — fully vectorized numpy (a per-entry
    # Python loop here would be hopeless at 100M nnz)
    nnz = int(indptr[-1])
    rows_of = np.repeat(
        np.arange(rows, dtype=np.int64), np.diff(indptr).astype(np.int64)
    )
    cols_of = indices[:nnz].astype(np.int64)
    bi = rows_of // rp
    bj = cols_of // cp
    block = bi * C + bj
    # stable sort by block keeps the CSR (row, col) order inside each
    # block, so local indices stay sorted per local row
    order = np.argsort(block, kind="stable")
    sblock = block[order]
    bcount = np.bincount(sblock, minlength=R * C).astype(np.int64)
    cap = max(int(bcount.max()) if nnz else 1, 1)
    boffs = np.zeros(R * C + 1, dtype=np.int64)
    np.cumsum(bcount, out=boffs[1:])
    rank = np.arange(nnz, dtype=np.int64) - np.repeat(boffs[:-1], bcount)
    local_row = rows_of[order] - (sblock // C) * rp
    local_col = cols_of[order] - (sblock % C) * cp
    ix = np.zeros((R * C, cap), dtype=np.int32)
    dt = np.zeros((R * C, cap), dtype=data.dtype)
    ix[sblock, rank] = local_col
    dt[sblock, rank] = data[:nnz][order]
    # per-(block, local row) histogram -> local indptr
    lr_counts = np.bincount(
        block * rp + rows_of - bi * rp, minlength=R * C * rp
    ).reshape(R, C, rp)
    ip = np.zeros((R, C, rp + 1), dtype=np.int32)
    np.cumsum(lr_counts, axis=2, out=ip[:, :, 1:])
    ix = ix.reshape(R, C, cap)
    dt = dt.reshape(R, C, cap)
    d = Dist2DCsMat(
        jnp.asarray(ip), jnp.asarray(ix), jnp.asarray(dt), (rows, cols)
    )
    return d, cp


def dist_spmv_2d(
    dmat: Dist2DCsMat,
    cols_per: int,
    x,
    mesh: Mesh,
    *,
    row_axis: str = "r",
    col_axis: str = "c",
) -> jax.Array:
    """2-D SpMV: x sharded over the col axis, local block SpMV, psum over
    cols → y sharded over the row axis (tensor-parallel layout)."""
    x = jnp.asarray(x)
    if x.shape[0] != dmat.shape[1]:
        raise ShapeError(f"dist_spmv_2d: A {dmat.shape}, x {x.shape}")
    R, C = dmat.grid
    rp = dmat.rows_per
    xp = jnp.pad(x, (0, C * cols_per - x.shape[0]))

    def kernel(ip, ix, dt, xs):
        local = CsMat(
            ip[0, 0], ix[0, 0], dt[0, 0], (rp, cols_per), CSR
        )
        partial = spmv(local, xs)
        return jax.lax.psum(partial, col_axis)[None]

    y = jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(
            P(row_axis, col_axis),
            P(row_axis, col_axis),
            P(row_axis, col_axis),
            P(col_axis),
        ),
        out_specs=P(row_axis, None),
    )(dmat.indptr, dmat.indices, dmat.data, xp)
    return y.reshape(-1)
