"""Shared structural primitives for capacity-padded sparse formats.

The TPU-native representation discipline: every sparse container carries
statically-shaped arrays of capacity ``cap >= nnz``; entries at positions
``>= nnz`` are padding with ``indices == 0`` and ``data == 0``.  The live
count is always derivable from traced data (``indptr[-1]`` for matrices, an
explicit scalar for vectors/COO), so the same code path works both eagerly
and under ``jax.jit`` with dynamic nnz.

The central primitive here is :func:`compress_coo`: a multi-key
``lax.sort`` followed by a segmented duplicate-sum.  It is the TPU
equivalent of the reference's triplet compression
(/root/reference/sprs/src/sparse/triplet_iter.rs:127-224 — lexicographic
sort + linear duplicate-summing scan) and also powers CSR<->CSC conversion
(counting sort in the reference, csmat.rs:1782-1829), sparse binary ops,
and the numeric phase of ESC SpGEMM.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

INDEX_DTYPE = jnp.int32

# Largest value representable by the hardware-native i32 index type.
# Dims and capacities must stay <= this; the packed-key sort inside
# compress_coo additionally needs (n_outer+1)*n_inner to fit i32/i64,
# which it checks itself (falling back to a 2-key sort).
MAX_INDEX = 2**31 - 1


def check_index_capacity(**named_sizes) -> None:
    """Eager guard that every named size fits the i32 index type.

    The TPU-native analog of the reference's "Index type is not large
    enough" panic (sprs/tests/gh374.rs:10-33): instead of silently
    wrapping i32 indices/indptr values, constructors raise a typed
    StructureError at the boundary.
    """
    from ..errors import StructureError

    for name, v in named_sizes.items():
        if v is not None and int(v) > MAX_INDEX:
            raise StructureError.index_overflow(
                f"{name}={int(v)} exceeds the i32 index limit "
                f"{MAX_INDEX}; the i32 index type is not large enough"
            )


def positions(cap: int) -> jax.Array:
    """[0, 1, ..., cap-1] as the index dtype."""
    return jnp.arange(cap, dtype=INDEX_DTYPE)


def valid_mask(cap: int, nnz) -> jax.Array:
    """Boolean mask of live (non-padding) entry slots."""
    return positions(cap) < nnz


def row_ids_from_indptr(indptr: jax.Array, cap: int) -> jax.Array:
    """Per-entry outer (row) id for a compressed matrix.

    Padding positions (>= indptr[-1]) map to ``n_outer`` which is out of
    range for every segment op with ``num_segments == n_outer`` and is
    therefore dropped — this is what makes padding free in segment-sum
    kernels.

    Implemented as scatter-ones + cumsum rather than ``searchsorted``:
    a binary search is ~log2(n) rounds of random gathers, which measured
    ~7x slower on TPU for the SpGEMM expand stage.  Scattering a 1 at
    each row's start and prefix-summing gives the same "index of the
    last row whose start <= t" (empty rows collide at one position and
    the cumsum skips them correctly).
    """
    pos = positions(cap)
    starts = indptr[:-1].astype(INDEX_DTYPE)
    seg = jnp.zeros((cap,), INDEX_DTYPE).at[starts].add(1, mode="drop")
    ids = jnp.cumsum(seg) - 1
    n_outer = indptr.shape[0] - 1
    return jnp.where(pos < indptr[-1], ids, n_outer).astype(INDEX_DTYPE)


def indptr_from_row_counts(row_counts: jax.Array) -> jax.Array:
    """Exclusive-scan a per-row count vector into an indptr of length n+1."""
    z = jnp.zeros((1,), dtype=INDEX_DTYPE)
    return jnp.concatenate([z, jnp.cumsum(row_counts, dtype=INDEX_DTYPE)])


def indptr_from_rows(
    rows: jax.Array,
    unique_valid: jax.Array,
    n_outer: int,
    *,
    rows_sorted: bool = False,
) -> jax.Array:
    """Build indptr by histogramming row ids of live unique entries.

    ``rows`` may contain the sentinel ``n_outer`` for padding; those are
    dropped by the scatter.  Pass ``rows_sorted=True`` ONLY when rows
    are non-decreasing (XLA treats the sortedness hint as
    correctness-relevant).
    """
    counts = jnp.zeros((n_outer,), dtype=INDEX_DTYPE)
    counts = counts.at[rows].add(
        unique_valid.astype(INDEX_DTYPE),
        mode="drop",
        indices_are_sorted=rows_sorted,
    )
    return indptr_from_row_counts(counts)


class CompressedCoo(NamedTuple):
    """Result of :func:`compress_coo`.

    ``required_nnz`` is the number of unique live entries the input
    contained; if it exceeds ``out_cap`` the output silently dropped the
    tail and the caller should re-run with a larger capacity (host paths
    raise :class:`~sprs_tpu.errors.CapacityError` instead).
    """

    indptr: jax.Array
    indices: jax.Array
    values: Tuple[jax.Array, ...]
    nnz: jax.Array
    required_nnz: jax.Array


def _sorted_key_vals(key, svals, sort_batches, pad_key):
    """Sort (key, *svals) by key — flat, or batched per host-declared
    segment (see :func:`compress_coo` ``sort_batches``).  Returns
    (sorted key, sorted vals, first-of-group flags, interspersed_pads).
    """
    if sort_batches is None:
        sorted_ops = jax.lax.sort(
            (key, *svals), num_keys=1, is_stable=False
        )
        k = sorted_ops[0]
        first = jnp.concatenate(
            [jnp.ones((1,), dtype=bool), k[1:] != k[:-1]]
        )
        return k, sorted_ops[1:], first, False

    import numpy as np

    starts, lens = sort_batches
    starts = np.asarray(starts, dtype=np.int64)
    lens = np.asarray(lens, dtype=np.int64)
    C = starts.shape[0]
    L = int(lens.max()) if C else 1
    L = max(L, 1)
    starts_d = jnp.asarray(starts, dtype=INDEX_DTYPE)
    lens_d = jnp.asarray(lens, dtype=INDEX_DTYPE)

    def seg_slice(arr, fill):
        ext = jnp.concatenate(
            [arr, jnp.full((L,), fill, dtype=arr.dtype)]
        )
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(ext, (s,), (L,))
        )(starts_d)

    pad = jnp.arange(L, dtype=INDEX_DTYPE)[None, :] >= lens_d[:, None]
    key2 = jnp.where(pad, pad_key, seg_slice(key, pad_key))
    val2 = [
        jnp.where(pad, jnp.zeros((), v.dtype), seg_slice(v, 0))
        for v in svals
    ]
    sorted_ops = jax.lax.sort(
        (key2, *val2), num_keys=1, is_stable=False, dimension=1
    )
    k = sorted_ops[0].reshape(-1)
    vs = [s.reshape(-1) for s in sorted_ops[1:]]
    first = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), k[1:] != k[:-1]]
    )
    return k, vs, first, True


def _compress_from_sorted_key(k, svals, first, n_outer, n_inner_c, out_cap):
    """Compress a SORTED packed-key stream into CSR arrays.

    One cap-sized scatter carries the packed KEY per duplicate group
    (scatter-min at the group id); the column indices, row ids, and the
    indptr histogram are all recovered from the compacted ``out_cap``
    keys afterwards.  Compared with scattering columns and histogramming
    rows from the cap-sized stream, this deletes one full cap-sized
    scatter pass and moves the row histogram to ``out_cap``-sized work
    (``out_cap`` << cap in SpGEMM, where duplicates are the point).

    Correctness of the key scatter without masking pads: sentinel rows
    pack to ``n_outer*n_inner`` and batched-segment pads to INT-MAX —
    both >= every live key — and pads never start a group (``unique``
    requires liveness), so a pad's min-write into the preceding live
    group always loses.  Leading pads clamp to gid=0 (NOT -1: JAX
    wraps negative scatter indices numpy-style instead of dropping
    them, so -1 would write slot out_cap-1 and break sortedness); a
    clamped pad's min-write at slot 0 still loses to the true group-0
    key (live keys sort below every pad key) and its value add is 0 by
    the padding convention.  The compacted keys are non-decreasing
    (groups ascend, untouched slots keep INT-MAX), so every downstream
    scatter keeps the ``indices_are_sorted`` fast path regardless of
    batched-sort pad interspersal.
    """
    sentinel = jnp.asarray(n_outer * n_inner_c, k.dtype)
    live_sorted = k < sentinel
    unique = first & live_sorted
    gid = jnp.cumsum(unique.astype(INDEX_DTYPE)) - 1
    required = gid[-1] + 1
    gid = jnp.maximum(gid, 0)
    fill = jnp.iinfo(k.dtype).max
    key_out = (
        jnp.full((out_cap,), fill, dtype=k.dtype)
        .at[gid]
        .min(k, mode="drop", indices_are_sorted=True)
    )
    nnz = jnp.minimum(required, out_cap).astype(INDEX_DTYPE)
    r_out = key_out // n_inner_c  # >= n_outer for INT-MAX fill slots
    c_out = (key_out - r_out * n_inner_c).astype(INDEX_DTYPE)
    out_indices = jnp.where(positions(out_cap) < nnz, c_out, 0)
    out_vals = tuple(
        jnp.zeros((out_cap,), dtype=v.dtype)
        .at[gid]
        .add(v, mode="drop", indices_are_sorted=True)
        for v in svals
    )
    counts = (
        jnp.zeros((n_outer,), dtype=INDEX_DTYPE)
        .at[r_out]
        .add(1, mode="drop", indices_are_sorted=True)
    )
    return CompressedCoo(
        indptr=indptr_from_row_counts(counts),
        indices=out_indices,
        values=out_vals,
        nnz=nnz,
        required_nnz=required,
    )


def compress_coo(
    rows: jax.Array,
    cols: jax.Array,
    value_channels: Sequence[jax.Array],
    nvalid,
    n_outer: int,
    n_inner: int,
    out_cap: int,
    sort_batches=None,
) -> CompressedCoo:
    """Sort-and-deduplicate COO entries into CSR-ordered arrays.

    Entries at positions >= ``nvalid`` are padding and ignored.  Duplicate
    (row, col) pairs are **summed** per value channel (matching the
    reference triplet semantics, triplet_iter.rs:166-184).  Output entries
    are sorted by (row, col): each row's column indices come out sorted,
    which is the CSR structural invariant (sparse.rs:300-358).

    Multiple value channels ride the same sort so callers (e.g. binary
    ops) can segregate lhs/rhs contributions in one pass.

    ``sort_batches``: optional host-side ``(starts, lens)`` int arrays
    describing C contiguous input segments such that no (row, col) key
    appears in two segments (e.g. SpGEMM product chunks split at A-row
    boundaries).  The sort then runs as ONE batched (C, L) ``lax.sort``
    over independently sorted segments — a bitonic network over length-L
    rows is ~(log L / log N)^2 of the comparator depth of one flat
    length-N sort.  Segment pads sort to each segment's end, so the
    flattened result has interspersed padding; the compaction scatters
    below are pad-tolerant (min/add with zeroed pad contributions).
    Only honored on the packed-key paths; ignored for the 2-key
    fallback.
    """
    cap = rows.shape[0]
    n_ch = len(value_channels)
    if cap == 0:
        zero_idx = jnp.zeros((out_cap,), dtype=INDEX_DTYPE)
        return CompressedCoo(
            indptr=jnp.zeros((n_outer + 1,), dtype=INDEX_DTYPE),
            indices=zero_idx,
            values=tuple(
                jnp.zeros((out_cap,), dtype=v.dtype) for v in value_channels
            ),
            nnz=jnp.zeros((), dtype=INDEX_DTYPE),
            required_nnz=jnp.zeros((), dtype=INDEX_DTYPE),
        )

    live = valid_mask(cap, nvalid)
    # Sentinel row n_outer pushes padding to the end of the sort and out of
    # range of every scatter below (mode="drop").
    srows = jnp.where(live, rows.astype(INDEX_DTYPE), n_outer)
    scols = jnp.where(live, cols.astype(INDEX_DTYPE), 0)
    svals = [
        jnp.where(live, v, jnp.zeros((), dtype=v.dtype))
        for v in value_channels
    ]

    # Sorts are UNSTABLE (is_stable=False): stability would only fix
    # the relative order of equal (row, col) keys, and every consumer
    # reduces equal keys by a commutative duplicate-sum — the only
    # observable difference is fp summation order among >=3 duplicates.
    # A stable TPU sort pays for an extra tie-break iota operand.
    # Pack (row, col) into one integer key when the index space fits:
    # a 1-key sort carries fewer operands through the network, and the
    # halves are recovered with a divide-by-constant (multiply-shift
    # under XLA).  Sentinel rows pack to keys >= n_outer*n_inner, which
    # still sort last.  i32 when (n_outer+1)*n_inner < 2^31, else i64;
    # 3-operand 2-key sort as the >2^63 fallback.
    n_inner_c = max(n_inner, 1)
    if (n_outer + 1) * n_inner_c < 2**31:
        key = srows * jnp.int32(n_inner_c) + scols
        key, svals, first, _ = _sorted_key_vals(
            key, svals, sort_batches, jnp.int32(2**31 - 1)
        )
        return _compress_from_sorted_key(
            key, svals, first, n_outer, n_inner_c, out_cap
        )
    if (n_outer + 1) * n_inner_c < 2**63 and jax.config.jax_enable_x64:
        # without x64, astype(int64) silently truncates to i32 and the
        # packed key would alias — use the 2-key sort instead
        key = srows.astype(jnp.int64) * n_inner_c + scols.astype(
            jnp.int64
        )
        key, svals, first, _ = _sorted_key_vals(
            key, svals, sort_batches, jnp.int64(2**63 - 1)
        )
        return _compress_from_sorted_key(
            key, svals, first, n_outer, n_inner_c, out_cap
        )
    first = None
    interspersed = False
    sorted_ops = jax.lax.sort(
        (srows, scols, *svals), num_keys=2, is_stable=False
    )
    r, c = sorted_ops[0], sorted_ops[1]
    vs = sorted_ops[2:]

    live_sorted = r < n_outer
    if first is None:
        first = jnp.concatenate(
            [
                jnp.ones((1,), dtype=bool),
                (r[1:] != r[:-1]) | (c[1:] != c[:-1]),
            ]
        )
    unique = first & live_sorted
    # Group id of each sorted entry; padding inherits the last group but
    # contributes zero (values were zeroed pre-sort).
    gid = jnp.cumsum(unique.astype(INDEX_DTYPE)) - 1
    # the unique count falls out of the cumsum's last element — no
    # second reduction pass over the array
    required = gid[-1] + 1

    # Every LIVE entry writes its column at its group slot via a
    # scatter-MIN at gid: duplicates of a group share the column, pads
    # contribute INT-MAX (a no-op against any live write), and gid is
    # non-decreasing for EVERY entry — live or pad, flat or batched —
    # so the sortedness hint always holds (the old where(live, gid,
    # sentinel) + set form lost it for batched sorts, whose pads are
    # interspersed at segment ends).
    out_indices = (
        jnp.full((out_cap,), 2**31 - 1, dtype=INDEX_DTYPE)
        .at[gid]
        .min(
            jnp.where(live_sorted, c, jnp.int32(2**31 - 1)),
            mode="drop",
            indices_are_sorted=True,
        )
    )
    nnz = jnp.minimum(required, out_cap).astype(INDEX_DTYPE)
    out_indices = jnp.where(
        positions(out_cap) < nnz, out_indices, 0
    )
    out_vals = tuple(
        jnp.zeros((out_cap,), dtype=v.dtype)
        .at[gid]
        .add(v, mode="drop", indices_are_sorted=True)
        for v in vs
    )
    # Entries whose group id overflowed out_cap were dropped above; the
    # reported nnz (clamped above) reflects that.
    indptr = indptr_from_rows(
        r,
        unique & (gid < out_cap),
        n_outer,
        rows_sorted=not interspersed,
    )
    return CompressedCoo(
        indptr=indptr,
        indices=out_indices,
        values=out_vals,
        nnz=nnz,
        required_nnz=required,
    )


def prune_channel(values: jax.Array, nnz, *, pad_value=0) -> jax.Array:
    """Zero out padding positions of a capacity-padded channel."""
    live = valid_mask(values.shape[0], nnz)
    return jnp.where(live, values, jnp.asarray(pad_value, dtype=values.dtype))


def is_concrete(*arrays) -> bool:
    """True when no operand is a JAX tracer (host/eager path allowed)."""
    return not any(isinstance(a, jax.core.Tracer) for a in arrays)
