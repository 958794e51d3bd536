"""Sparse triangular solves with dense and sparse right-hand sides.

Reference: /root/reference/sprs/src/sparse/linalg/trisolve.rs — four
dense-RHS kernels (CSR/CSC × lower/upper, trisolve.rs:30-262) and the
sparse-RHS Gilbert–Peierls solve (trisolve.rs:286-358).

TPU-native design — two device strategies plus a host path:

* ``method="scan"``: a ``lax.scan`` over rows/columns.  Sequential like
  the reference sweep, but jittable and shape-static: each step gathers a
  fixed-width window of the current row (width = max row nnz), masks the
  tail, and updates the solution functionally.  O(n · W) work.
* ``method="levels"``: the production path for repeated solves.  A
  host-side symbolic pass computes the dependency *level schedule* of the
  triangle (rows whose in-neighbors are all in earlier levels); the
  device then runs one batched, fully-parallel update per level.  This is
  the standard way to map sequential sparse triangular sweeps onto wide
  vector hardware — the symbolic cost amortizes exactly like the
  reference's LdlSymbolic/LdlNumeric split.

Singularity: on concrete inputs a zero structural/numeric diagonal
raises :class:`~sprs_tpu.errors.SingularMatrixError` (matching
trisolve.rs:64-69); under jit the solve NaN-poisons instead (XLA cannot
raise).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import NonSquareMatrixError, ShapeError, SingularMatrixError
from ..formats.csmat import CsMat
from ..formats.csvec import CsVec
from ..formats.util import INDEX_DTYPE, is_concrete


def _check_square(mat: CsMat):
    if mat.shape[0] != mat.shape[1]:
        raise NonSquareMatrixError(f"triangular solve needs square, got {mat.shape}")


def _check_rhs(mat: CsMat, b) -> jax.Array:
    b = jnp.asarray(b)
    if b.shape[0] != mat.shape[0]:
        raise ShapeError(f"rhs dim {b.shape} vs matrix {mat.shape}")
    return b


def _host_diag_check(mat: CsMat):
    """Host-only singularity check.  Pure numpy: even on concrete
    operands, jnp ops stage tracers when called inside an enclosing jit
    trace, so the device ``mat.diag()`` cannot be used here."""
    if not is_concrete(mat.indptr, mat.data):
        return
    indptr = np.asarray(mat.indptr)
    nnz = int(indptr[-1])
    indices = np.asarray(mat.indices)[:nnz]
    data = np.asarray(mat.data)[:nnz]
    outer = np.repeat(
        np.arange(mat.outer_dims, dtype=np.int64), np.diff(indptr)
    )
    k = min(mat.shape)
    diag = np.zeros(k, dtype=data.dtype)
    on_diag = (outer == indices) & (outer < k)
    np.add.at(diag, outer[on_diag], data[on_diag])
    if np.any(diag == 0):
        raise SingularMatrixError(
            f"zero diagonal at index {int(np.argmax(diag == 0))}"
        )


def diag_solve(mat: CsMat, b) -> jax.Array:
    """Solve D x = b for the diagonal of ``mat`` (linalg.rs:17-29)."""
    _check_square(mat)
    b = _check_rhs(mat, b)
    _host_diag_check(mat)
    d = mat.diag()
    if b.ndim == 2:
        return b / d[:, None]
    return b / d


def _row_window_width(mat: CsMat, window: Optional[int] = None) -> int:
    # pure numpy: jnp ops would stage tracers inside an enclosing trace
    # even on concrete arrays (cf. _host_diag_check)
    if window is not None:
        return max(min(window, mat.cap), 1)
    if is_concrete(mat.indptr):
        ip = np.asarray(mat.indptr)
        width = int(np.diff(ip).max()) if ip.shape[0] > 1 else 0
        return max(width, 1)
    return mat.cap


# ---------------------------------------------------------------------------
# scan kernels (outer-dim sweep, CSR gather / CSC scatter)
# ---------------------------------------------------------------------------


def _scan_solve_csr(
    mat: CsMat, b: jax.Array, lower: bool, window: Optional[int] = None
) -> jax.Array:
    """Row sweep: x[i] = (b[i] − Σ_{j≠i, stored, correct side} a_ij x_j)/a_ii.

    Entries on the wrong side of the diagonal are ignored, like the
    reference kernels (trisolve.rs:30-73 docs).  ``window`` statically
    bounds the per-row gather width under jit (otherwise the traced
    path must assume ``cap`` — O(n·cap) work); a row wider than the
    window NaN-poisons its solution component, consistent with the
    under-jit singularity contract.
    """
    n = mat.shape[0]
    w = _row_window_width(mat, window)
    indptr, indices, data = mat.indptr, mat.indices, mat.data
    cap = mat.cap

    def step(x, i):
        i = jnp.where(lower, i, n - 1 - i)
        start = indptr[i]
        ln = indptr[i + 1] - start
        start_c = jnp.minimum(start, jnp.maximum(cap - w, 0))
        off = start - start_c
        idx = jax.lax.dynamic_slice(indices, (start_c,), (w,))
        val = jax.lax.dynamic_slice(data, (start_c,), (w,))
        k = jnp.arange(w, dtype=INDEX_DTYPE)
        in_row = (k >= off) & (k < off + ln)
        side = (idx < i) if lower else (idx > i)
        contrib = jnp.where(in_row & side, val * x[idx], 0)
        diag = jnp.sum(jnp.where(in_row & (idx == i), val, 0))
        xi = (b[i] - jnp.sum(contrib)) / diag
        # row wider than the static window: poison, don't truncate
        xi = jnp.where(ln <= w, xi, jnp.asarray(jnp.nan, xi.dtype))
        return x.at[i].set(xi), None

    x0 = jnp.zeros_like(b)
    x, _ = jax.lax.scan(step, x0, jnp.arange(n, dtype=INDEX_DTYPE))
    return x


def _scan_solve_csc(
    mat: CsMat, b: jax.Array, lower: bool, window: Optional[int] = None
) -> jax.Array:
    """Column sweep (scatter form, trisolve.rs:85-149): after computing
    x[j], subtract x[j]·A[:, j] from the running rhs."""
    n = mat.shape[0]
    w = _row_window_width(mat, window)
    indptr, indices, data = mat.indptr, mat.indices, mat.data
    cap = mat.cap

    def step(carry, j):
        rhs, x = carry
        j = jnp.where(lower, j, n - 1 - j)
        start = indptr[j]
        ln = indptr[j + 1] - start
        start_c = jnp.minimum(start, jnp.maximum(cap - w, 0))
        off = start - start_c
        idx = jax.lax.dynamic_slice(indices, (start_c,), (w,))
        val = jax.lax.dynamic_slice(data, (start_c,), (w,))
        k = jnp.arange(w, dtype=INDEX_DTYPE)
        in_col = (k >= off) & (k < off + ln)
        diag = jnp.sum(jnp.where(in_col & (idx == j), val, 0))
        xj = rhs[j] / diag
        xj = jnp.where(ln <= w, xj, jnp.asarray(jnp.nan, xj.dtype))
        side = (idx > j) if lower else (idx < j)
        upd = jnp.where(in_col & side, val * xj, 0)
        rhs = rhs.at[idx].add(-upd, mode="drop")
        return (rhs, x.at[j].set(xj)), None

    (rhs, x), _ = jax.lax.scan(
        step,
        (b, jnp.zeros_like(b)),
        jnp.arange(n, dtype=INDEX_DTYPE),
    )
    return x


# ---------------------------------------------------------------------------
# level-scheduled kernel
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TriSchedule:
    """Host-computed dependency levels of a triangular matrix.

    Rows are stored sorted by level (``order``) with per-level extents
    (``offsets``) — O(n) memory.  A padded ``(n_levels, width)`` matrix
    was measured O(GBs) on fill-heavy factors (camd-ordered 10⁶-row
    Laplacian: width ~5·10⁵, thousands of levels); the device solve
    instead takes a static-``width`` ``dynamic_slice`` window per level.
    Built once per pattern; reusable for every numeric solve with that
    pattern (the LDLᵀ use case).
    """

    order: np.ndarray  # (n + width,) int32 rows by level, tail-padded n
    offsets: np.ndarray  # (n_levels + 1,) int64 level extents in order
    width: int  # max rows per level (static vmap width)
    n: int
    lower: bool

    @property
    def n_levels(self) -> int:
        return self.offsets.shape[0] - 1


def build_schedule(mat: CsMat, *, lower: bool = True) -> TriSchedule:
    """Compute the level schedule on the host (symbolic, O(nnz))."""
    _check_square(mat)
    csr = mat.to_csr()
    n = csr.shape[0]
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices)
    from .. import native

    fast = native.tri_levels(indptr, indices, n, lower=lower)
    if fast is not None:
        level, n_levels = fast
    else:
        level = np.zeros(n, dtype=np.int64)
        order = range(n) if lower else range(n - 1, -1, -1)
        for i in order:
            deps = indices[indptr[i] : indptr[i + 1]]
            deps = deps[deps < i] if lower else deps[deps > i]
            if deps.size:
                level[i] = level[deps].max() + 1
        n_levels = int(level.max()) + 1 if n else 1
    counts = np.bincount(level, minlength=n_levels)
    width = max(int(counts.max()), 1) if n else 1
    offsets = np.zeros(n_levels + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    order = np.argsort(level, kind="stable").astype(np.int32)
    order = np.concatenate([order, np.full(width, n, dtype=np.int32)])
    return TriSchedule(
        order=order, offsets=offsets, width=width, n=n, lower=lower
    )


def _level_solve_csr(
    mat: CsMat, b: jax.Array, sched: TriSchedule
) -> jax.Array:
    n = mat.shape[0]
    w = _row_window_width(mat)
    indptr, indices, data = mat.indptr, mat.indices, mat.data
    cap = mat.cap
    lower = sched.lower
    width = sched.width
    order = jnp.asarray(sched.order)
    offsets = jnp.asarray(sched.offsets)

    def solve_row(i, x):
        i_c = jnp.minimum(i, n - 1)
        start = indptr[i_c]
        ln = indptr[i_c + 1] - start
        start_c = jnp.minimum(start, jnp.maximum(cap - w, 0))
        off = start - start_c
        idx = jax.lax.dynamic_slice(indices, (start_c,), (w,))
        val = jax.lax.dynamic_slice(data, (start_c,), (w,))
        k = jnp.arange(w, dtype=INDEX_DTYPE)
        in_row = (k >= off) & (k < off + ln)
        side = (idx < i_c) if lower else (idx > i_c)
        contrib = jnp.sum(jnp.where(in_row & side, val * x[idx], 0))
        diag = jnp.sum(jnp.where(in_row & (idx == i_c), val, 0))
        return (b[i_c] - contrib) / diag

    def level_step(l, x):
        start = offsets[l]
        cnt = offsets[l + 1] - start
        # static-width window into the flat order (its width-sized pad
        # tail guarantees start+width stays in range); rows past this
        # level's extent mask to the sentinel n and drop on scatter
        rows = jax.lax.dynamic_slice(order, (start,), (width,))
        rows = jnp.where(
            jnp.arange(width, dtype=cnt.dtype) < cnt, rows, n
        )
        vals = jax.vmap(solve_row, in_axes=(0, None))(rows, x)
        return x.at[rows].set(vals, mode="drop")

    x0 = jnp.zeros_like(b)
    return jax.lax.fori_loop(0, sched.n_levels, level_step, x0)


# ---------------------------------------------------------------------------
# flat blocked level kernel — O(lnz) at any depth
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class FlatTriSchedule:
    """Entry-stream level schedule: O(lnz + n_levels·E) memory.

    ``_level_solve_csr`` does a (level_width, max_row_nnz) gather per
    level — at 65k rows of a camd factor that is a 239 GB HLO
    (BASELINE.md round-2): ``width`` reaches half the rows while
    ``max_row_nnz`` reaches the trailing dense-block width, and the
    padded product explodes on exactly the fill-heavy factors that
    need solving.  Here the OFF-DIAGONAL entries are streamed in
    (level, row) order and cut into static ``E``-entry blocks that
    never cross a level boundary; a row wider than a block spans
    several blocks (its dot-product accumulates in ``acc``), and each
    block finalizes the rows whose last entry it holds:
    ``x[r] = (b[r] − acc[r]) / diag[r]``.  Per-block work is E gathers
    + E scatter-adds + ≤E finalizes — independent of level shape, so
    the deep-level skew costs rounds, not memory.

    Pattern-only (positions into the matrix's data array), reusable
    across same-pattern numeric values like :class:`TriSchedule`.
    """

    n: int
    lower: bool
    E: int  # entries per block (static)
    nblocks: int
    # per-block entry streams, (nblocks, E); sentinel: row = n
    e_slot: np.ndarray  # position into mat.data (clamped for sentinel)
    e_col: np.ndarray  # column of the entry (clamped for sentinel)
    e_row: np.ndarray  # target row (n for padding)
    # per-block finalize streams, (nblocks, E); sentinel row = n
    f_row: np.ndarray
    f_dslot: np.ndarray  # diag position into mat.data

    # Registered pytree: the O(lnz) streams are LEAVES so schedules can
    # be passed to jitted solves as ARGUMENTS — closing over them embeds
    # ~5·lnz·4 B of HLO constants (the remote-compile payload cliff,
    # CLAUDE.md).
    def tree_flatten(self):
        return (
            (self.e_slot, self.e_col, self.e_row, self.f_row, self.f_dslot),
            (self.n, self.lower, self.E, self.nblocks),
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        n, lower, E, nblocks = aux
        es, ec, er, fr, fd = leaves
        return cls(
            n=n,
            lower=lower,
            E=E,
            nblocks=nblocks,
            e_slot=es,
            e_col=ec,
            e_row=er,
            f_row=fr,
            f_dslot=fd,
        )


def build_flat_schedule(
    mat: CsMat, *, lower: bool = True, block_entries: int = 2048
) -> FlatTriSchedule:
    """Host symbolic pass for the flat blocked level solve."""
    _check_square(mat)
    csr = mat.to_csr()
    n = csr.shape[0]
    indptr = np.asarray(csr.indptr).astype(np.int64)
    nnz = int(indptr[-1])
    indices = np.asarray(csr.indices)[:nnz].astype(np.int64)
    from .. import native

    fast = native.tri_levels(indptr, indices, n, lower=lower)
    if fast is not None:
        level, n_levels = fast
    else:
        level = np.zeros(n, dtype=np.int64)
        order = range(n) if lower else range(n - 1, -1, -1)
        for i in order:
            deps = indices[indptr[i] : indptr[i + 1]]
            deps = deps[deps < i] if lower else deps[deps > i]
            if deps.size:
                level[i] = level[deps].max() + 1
        n_levels = int(level.max()) + 1 if n else 1

    rows_all = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    side = (indices < rows_all) if lower else (indices > rows_all)
    on_diag = indices == rows_all
    # diag slot per row (first stored diagonal entry)
    dslot = np.full(n, nnz, dtype=np.int64)
    pos_d = np.nonzero(on_diag)[0]
    # keep the FIRST diag slot per row (reverse so earlier wins)
    dslot[rows_all[pos_d][::-1]] = pos_d[::-1]
    if np.any(dslot == nnz):
        missing = int(np.argmax(dslot == nnz))
        raise SingularMatrixError(f"zero diagonal at index {missing}")

    # off-diag entries sorted by (level of their row, row)
    pos_e = np.nonzero(side)[0]
    erow = rows_all[pos_e]
    order_e = np.argsort(level[erow] * np.int64(n) + erow, kind="stable")
    pos_e = pos_e[order_e]
    erow = erow[order_e]
    ecol = indices[pos_e]
    elvl = level[erow]

    E = int(block_entries)
    # block cuts: every E entries, plus at every level boundary; rows
    # never straddle a LEVEL boundary so correctness only needs cuts
    # there — a row may straddle an E-cut (partial sums accumulate).
    ne = pos_e.shape[0]
    lvl_starts = np.nonzero(
        np.concatenate([[True], elvl[1:] != elvl[:-1]])
    )[0] if ne else np.zeros(0, np.int64)
    cuts = {0, ne}
    for s in lvl_starts:
        cuts.add(int(s))
    cuts = sorted(cuts)
    blocks = []  # (estart, eend) half-open entry ranges
    for a, bnd in zip(cuts[:-1], cuts[1:]):
        p = a
        while p < bnd:
            q = min(p + E, bnd)
            blocks.append((p, q))
            p = q
    # levels with NO off-diag entries still need their rows finalized:
    # those rows (level-0 or pure-diagonal rows) finalize in block 0 —
    # their acc is untouched (0), so any block at/after their level
    # works, and level-sorted rows with no entries are level 0 only
    # ... except pure-diagonal rows at higher levels cannot exist:
    # a row's level > 0 requires an off-diag entry.  Safe.
    if not blocks:
        blocks = [(0, 0)]
    nb = len(blocks)

    e_slot = np.full((nb, E), 0, dtype=np.int64)
    e_col = np.full((nb, E), 0, dtype=np.int64)
    e_row = np.full((nb, E), n, dtype=np.int64)
    for bi, (a, bnd) in enumerate(blocks):
        k = bnd - a
        e_slot[bi, :k] = pos_e[a:bnd]
        e_col[bi, :k] = ecol[a:bnd]
        e_row[bi, :k] = erow[a:bnd]

    # finalize rows at the START of the block AFTER their last entry
    # (one extra entry-empty tail block): each step finalizes before it
    # accumulates, so block k's entries read columns finalized in
    # blocks <= k — a dependency's last entry lives in a strictly
    # earlier LEVEL block, hence its finalize block is <= k.  Rows with
    # no off-diagonal entries (level 0) finalize at the start of block
    # 0, before any entry ever reads them.
    nb_f = nb + 1
    fin_block = np.zeros(n, dtype=np.int64)
    if ne:
        # last entry position per row in the sorted stream
        last_of_row = np.full(n, -1, dtype=np.int64)
        last_of_row[erow] = np.arange(ne, dtype=np.int64)
        bstart = np.asarray([a for a, _ in blocks], dtype=np.int64)
        has = last_of_row >= 0
        fin_block[has] = np.searchsorted(
            bstart, last_of_row[has], side="right"
        )  # == block_of_last_entry + 1
    fcount = np.bincount(fin_block, minlength=nb_f)
    F = max(int(fcount.max()), 1) if n else 1
    f_row = np.full((nb_f, F), n, dtype=np.int64)
    f_dslot = np.full((nb_f, F), max(nnz - 1, 0), dtype=np.int64)
    order_r = np.argsort(fin_block, kind="stable")
    fb_sorted = fin_block[order_r]
    foffs = np.zeros(nb_f + 1, dtype=np.int64)
    np.cumsum(fcount, out=foffs[1:])
    rank = np.arange(n, dtype=np.int64) - foffs[fb_sorted]
    f_row[fb_sorted, rank] = order_r
    f_dslot[fb_sorted, rank] = dslot[order_r]

    # entry streams get an empty tail block to match
    pad_e = np.zeros((1, E), dtype=np.int64)
    e_slot = np.concatenate([e_slot, pad_e])
    e_col = np.concatenate([e_col, pad_e])
    e_row = np.concatenate([e_row, np.full((1, E), n, dtype=np.int64)])

    return FlatTriSchedule(
        n=n,
        lower=lower,
        E=E,
        nblocks=nb_f,
        e_slot=e_slot.astype(np.int32),
        e_col=e_col.astype(np.int32),
        e_row=e_row.astype(np.int32),
        f_row=f_row.astype(np.int32),
        f_dslot=f_dslot.astype(np.int32),
    )


def _flat_solve_csr(
    mat: CsMat, b: jax.Array, sched: FlatTriSchedule, *, unroll: int = 4
) -> jax.Array:
    """``unroll`` groups consecutive blocks into one ``lax.scan``
    iteration (the round-5 short-level-merge experiment).  Measured
    verdict (results_r5/flat_unroll.json, 65k nd, same process):
    4 is mildly best (0.73 s vs 0.80 s at 1; 32 regresses) — the
    ~0.55 ms/block floor is NOT while-loop iteration overhead, so the
    level-bound fallback stays ~12x behind the panel solve by design.
    Semantics are identical for any value (block order preserved)."""
    n = sched.n
    data = mat.data

    e_slot = jnp.asarray(sched.e_slot, INDEX_DTYPE)
    e_col = jnp.asarray(sched.e_col, INDEX_DTYPE)
    e_row = jnp.asarray(sched.e_row, INDEX_DTYPE)
    f_row = jnp.asarray(sched.f_row, INDEX_DTYPE)
    f_dslot = jnp.asarray(sched.f_dslot, INDEX_DTYPE)

    def step(carry, xs):
        x, acc = carry
        es, ec, er, fr, fd = xs
        # finalize FIRST: rows scheduled here had their last entry in
        # an earlier block; this block's entries may read them
        fr_c = jnp.minimum(fr, n - 1)
        xf = (b[fr_c] - acc[fr_c]) / data[fd]
        x = x.at[jnp.where(fr < n, fr, n)].set(xf, mode="drop")
        live = er < n
        vals = jnp.where(live, data[es], 0)
        contrib = vals * x[jnp.minimum(ec, n - 1)]
        acc = acc.at[er].add(contrib, mode="drop")
        return (x, acc), None

    x0 = jnp.zeros_like(b)
    acc0 = jnp.zeros_like(b)
    (x, _), _ = jax.lax.scan(
        step,
        (x0, acc0),
        (e_slot, e_col, e_row, f_row, f_dslot),
        unroll=max(int(unroll), 1),
    )
    return x


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def lsolve(
    mat: CsMat,
    b,
    *,
    method: str = "auto",
    schedule: Optional[TriSchedule] = None,
    window: Optional[int] = None,
) -> jax.Array:
    """Solve L x = b using the lower-triangular part of ``mat``.

    Covers lsolve_csr_dense_rhs / lsolve_csc_dense_rhs
    (trisolve.rs:30-149).  ``method``: "scan", "levels", "flat", or
    "auto" (a level method when a schedule is given or the input is
    concrete; "flat" — the O(lnz)-memory blocked stream — once the
    padded level kernel's (level_width × max_row_nnz) gather would
    explode).  ``window`` statically bounds the scan method's per-row
    width under jit (without it a traced input costs O(n·cap)); rows
    wider than the window NaN-poison their component.

    >>> import numpy as np
    >>> import sprs_tpu as st
    >>> from sprs_tpu.linalg import lsolve
    >>> l = st.from_dense(np.array([[2.0, 0.0], [1.0, 4.0]]))
    >>> np.asarray(lsolve(l, np.array([2.0, 9.0]))).tolist()
    [1.0, 2.0]
    """
    return _trisolve(
        mat, b, lower=True, method=method, schedule=schedule, window=window
    )


def usolve(
    mat: CsMat,
    b,
    *,
    method: str = "auto",
    schedule: Optional[TriSchedule] = None,
    window: Optional[int] = None,
) -> jax.Array:
    """Solve U x = b using the upper-triangular part of ``mat``
    (usolve_csr/usolve_csc, trisolve.rs:161-262)."""
    return _trisolve(
        mat, b, lower=False, method=method, schedule=schedule, window=window
    )


def _trisolve(mat, b, *, lower, method, schedule, window=None):
    _check_square(mat)
    b = _check_rhs(mat, b)
    # numpy-style promotion: an f64 matrix with an f32 rhs solves in
    # f64 (the sweeps otherwise scatter-downcast f64 values into the
    # f32 carry — a future JAX error)
    b = b.astype(jnp.result_type(mat.data.dtype, b.dtype))
    _host_diag_check(mat)
    if b.ndim == 2:
        solve1 = lambda col: _trisolve(  # noqa: E731
            mat,
            col,
            lower=lower,
            method=method,
            schedule=schedule,
            window=window,
        )
        return jax.vmap(solve1, in_axes=1, out_axes=1)(b)

    if method == "auto":
        if schedule is not None:
            method = (
                "flat"
                if isinstance(schedule, FlatTriSchedule)
                else "levels"
            )
        elif is_concrete(mat.indptr):
            # the padded level kernel's per-level gather is
            # (level_width × max_row_nnz) — switch to the flat blocked
            # kernel before that product explodes (239 GB HLO at 65k
            # rows of a camd factor)
            method = "levels"
            ip = np.asarray(mat.indptr)
            w = int(np.diff(ip).max()) if ip.shape[0] > 1 else 1
            if mat.shape[0] * w > 1 << 24:
                method = "flat"
        else:
            method = "scan"

    if method == "levels":
        if schedule is None:
            schedule = build_schedule(mat, lower=lower)
        if schedule.lower != lower:
            raise ValueError("schedule direction mismatch")
        return _level_solve_csr(mat.to_csr(), b, schedule)
    if method == "flat":
        if schedule is None or not isinstance(schedule, FlatTriSchedule):
            schedule = build_flat_schedule(mat, lower=lower)
        if schedule.lower != lower:
            raise ValueError("schedule direction mismatch")
        return _flat_solve_csr(mat.to_csr(), b, schedule)
    if method == "scan":
        if mat.is_csr:
            return _scan_solve_csr(mat, b, lower, window)
        return _scan_solve_csc(mat, b, lower, window)
    raise ValueError(f"unknown trisolve method {method!r}")


def lsolve_csc_sparse_rhs(l_mat: CsMat, b: CsVec) -> CsVec:
    """Sparse-RHS lower solve via Gilbert–Peierls reach
    (trisolve.rs:286-358).

    Host-side: the solution's pattern is the graph reach of the rhs
    pattern through L's DAG (computed by DFS), then only reached columns
    are solved.  Used by up-looking factorizations; device batching of
    this path comes with the level-scheduled LDL numeric.
    """
    _check_square(l_mat)
    if l_mat.shape[0] != b.dim:
        raise ShapeError("sparse rhs dim mismatch")
    csc = l_mat.to_csc()
    n = csc.shape[0]
    indptr = np.asarray(csc.indptr)
    indices = np.asarray(csc.indices)
    data = np.asarray(csc.data)
    b_idx = np.asarray(b.indices)[: int(b.nnz)]
    b_val = np.asarray(b.data)[: int(b.nnz)]

    # DFS reach from rhs pattern (Enter/Exit double-stack in the
    # reference, stack.rs; a plain recursion-free DFS here).
    visited = np.zeros(n, dtype=bool)
    topo: list = []
    for s in b_idx:
        if visited[s]:
            continue
        stack = [(int(s), indptr[s])]
        visited[s] = True
        while stack:
            node, it = stack.pop()
            pushed = False
            while it < indptr[node + 1]:
                nxt = indices[it]
                it += 1
                if nxt > node and not visited[nxt]:
                    visited[nxt] = True
                    stack.append((node, it))
                    stack.append((int(nxt), indptr[nxt]))
                    pushed = True
                    break
            if not pushed:
                topo.append(node)
    topo.reverse()  # topological order of the reach

    x = np.zeros(n, dtype=np.asarray(b.data).dtype)
    x[b_idx] = b_val
    for j in topo:
        lo, hi = indptr[j], indptr[j + 1]
        col_idx = indices[lo:hi]
        col_val = data[lo:hi]
        dmask = col_idx == j
        if not dmask.any() or col_val[dmask][0] == 0:
            raise SingularMatrixError(f"zero diagonal at column {j}")
        x[j] /= col_val[dmask][0]
        below = col_idx > j
        x[col_idx[below]] -= col_val[below] * x[j]

    from ..formats.csvec import csvec

    pattern = np.sort(np.asarray(topo, dtype=np.int64))
    return csvec(n, pattern.astype(np.int32), x[pattern])
