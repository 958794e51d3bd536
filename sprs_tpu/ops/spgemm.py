"""Sparse×sparse product (SpGEMM) by Expand–Sort–Compress.

The reference implements SpGEMM with the SMMP two-phase algorithm: a
symbolic pass building the output pattern with a dense `seen` scatter mask
followed by a numeric pass with a dense accumulator row
(/root/reference/sprs/src/sparse/smmp.rs:81-189).  Dense per-row scatter
masks are a poor fit for the TPU's vector units; the TPU-native design is
**ESC (expand–sort–compress)**:

1. *Expand*: enumerate every partial product a_ik·b_kj as a COO triple.
   The mapping from a flat product index t to its (A-entry, B-entry) pair
   is a vectorized ``searchsorted`` over the cumulative B-row lengths —
   no data-dependent control flow, fully MXU/VPU-friendly.
2. *Sort*: multi-key ``lax.sort`` by (row, col).
3. *Compress*: segmented duplicate-sum (shared with triplet compression).

Capacity discipline: the number of partial products (``prod_cap``) and
output nonzeros (``out_cap``) must be static under jit.  On concrete
inputs both are computed exactly; traced callers pass bounds and can
check ``required_nnz``.  This mirrors the reference's grow-and-retry
bound nnz(A)+nnz(B) (smmp.rs:92-93) turned into an explicit contract.

All four storage combinations reduce to CSR×CSR via transpose identities
(csmat.rs:1933-1948); the result storage follows the lhs.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..errors import CapacityError, ShapeError
from ..formats.csmat import CsMat
from ..formats.util import INDEX_DTYPE, compress_coo, is_concrete


def _expand_products(a: CsMat, b: CsMat, prod_cap: int):
    """Enumerate partial products of CSR a × CSR b as padded COO arrays.

    Per-product work is TWO random gathers (B's index and value; the
    A-side per-product values ride exact delta-broadcasts, see
    _seg_broadcast_exact) plus scatter+cumsum passes.  Ownership maps
    (which A-row produced flat product t) use the scatter-ones +
    prefix-sum trick instead of searchsorted — a binary search is
    log2(n) rounds of random gathers and measured ~7x slower on TPU at
    5.6M products.
    """
    return _expand_from_rows(
        a,
        b.indptr[:-1],
        b.indptr[1:] - b.indptr[:-1],
        b.indices,
        b.data,
        prod_cap,
    )


def _seg_broadcast_exact(vals, tgt, prod_cap: int):
    """Broadcast per-segment values to per-product slots WITHOUT a
    random gather: scatter the wrapping-integer DELTA of each value's
    bit pattern at its segment start, then prefix-sum.  Telescoping
    holds exactly in modular arithmetic, so the result is bit-identical
    to ``vals[p]`` for any dtype — including floats — at scatter+cumsum
    cost instead of a prod_cap-sized random gather (~50M lookups/s flat
    on TPU; measured 171 → 117 ms on the 3.5M-product expand).

    Zero-length segments collide at the next segment's start; their
    deltas sum (mod 2^w), and the running total after that slot is still
    the next live value — the same property the ownership-map trick
    relies on.

    A custom VJP is REQUIRED: the bitcast trick has zero gradient, so
    without it grad-through-SpGEMM silently returned zeros for the
    A-side values.  Mathematically this op is ``out[p] =
    vals[owner(p)]`` — a linear gather — so the cotangent is a
    segment-sum of the product cotangents back onto the entries.
    Integer inputs (the q-base ``adj`` map) skip the custom-VJP wrapper
    — their cotangent type is float0 and no gradient flows anyway.
    """
    if jnp.issubdtype(vals.dtype, jnp.integer):
        return _seg_broadcast_impl(vals, tgt, prod_cap)
    return _seg_broadcast_float(vals, tgt, prod_cap)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _seg_broadcast_float(vals, tgt, prod_cap: int):
    return _seg_broadcast_impl(vals, tgt, prod_cap)


def _seg_broadcast_impl(vals, tgt, prod_cap: int):
    if jnp.issubdtype(vals.dtype, jnp.complexfloating):
        re = _seg_broadcast_impl(jnp.real(vals), tgt, prod_cap)
        im = _seg_broadcast_impl(jnp.imag(vals), tgt, prod_cap)
        return jax.lax.complex(re, im)
    itemsize = vals.dtype.itemsize
    if itemsize >= 4:
        bits = jax.lax.bitcast_convert_type(vals, jnp.int32)
    else:
        bits = jax.lax.bitcast_convert_type(
            vals, jnp.int16 if itemsize == 2 else jnp.int8
        )
    d = jnp.concatenate([bits[:1], bits[1:] - bits[:-1]])
    buf = jnp.zeros((prod_cap,) + bits.shape[1:], bits.dtype).at[
        tgt
    ].add(d, mode="drop")
    out_bits = jnp.cumsum(buf, axis=0, dtype=bits.dtype)
    return jax.lax.bitcast_convert_type(out_bits, vals.dtype)


def _seg_broadcast_fwd(vals, tgt, prod_cap: int):
    return _seg_broadcast_impl(vals, tgt, prod_cap), (
        tgt,
        vals.shape[0],
    )


def _seg_broadcast_bwd(prod_cap, res, g):
    tgt, n_entries = res
    # owner(p) = index of the last segment starting at or before p
    # (scatter-ones + prefix-sum; empty segments own no products)
    rseg = jnp.zeros((prod_cap,), INDEX_DTYPE).at[tgt].add(
        1, mode="drop"
    )
    owner = jnp.cumsum(rseg) - 1
    owner = jnp.where(owner < 0, n_entries, owner)  # pre-segment slots
    dvals = jax.ops.segment_sum(g, owner, num_segments=n_entries)
    return dvals, jnp.zeros(tgt.shape, dtype=jax.dtypes.float0)


_seg_broadcast_float.defvjp(_seg_broadcast_fwd, _seg_broadcast_bwd)


def _expand_from_rows(
    a: CsMat, b_starts, b_lens, b_indices, b_data, prod_cap: int
):
    """Expand against explicit B row spans.

    ``b_starts[r]``/``b_lens[r]`` give row r's entry range inside
    ``b_indices``/``b_data``; the entry arrays may contain padding gaps
    between rows (a gathered, shard-concatenated B uses this — the
    distributed SpGEMM path).
    """
    b_rows = b_starts.shape[0]
    b_cap = b_indices.shape[0]
    cap_a = a.cap
    a_live = a.live_mask()
    k = jnp.minimum(a.indices, b_rows - 1)  # B row hit by each A entry
    b_len = jnp.where(a_live, b_lens[k], 0)
    offsets = jnp.cumsum(b_len)  # inclusive scan, (cap_a,)
    total = offsets[-1] if cap_a > 0 else jnp.zeros((), INDEX_DTYPE)
    starts_all = offsets - b_len  # per A-entry start of its range
    # per-entry "q-base": q = adj_p + t with no per-product A gathers
    adj = b_starts[k] - starts_all

    t = jnp.arange(prod_cap, dtype=INDEX_DTYPE)
    tgt = jnp.where(a_live, starts_all, prod_cap)
    # Per-product A-side values via exact delta-broadcast (see
    # _seg_broadcast_exact) — the A-entry ownership map p and its two
    # gathers adj[p]/a.data[p] are gone entirely.
    adj_p = _seg_broadcast_exact(adj, tgt, prod_cap)
    aval_p = _seg_broadcast_exact(a.data, tgt, prod_cap)
    # A-row ownership: scatter a 1 at each row's first product,
    # prefix-sum (saves the a_outer[p] gather).
    first_entry = jnp.minimum(a.indptr[:-1], cap_a - 1)
    row_start = starts_all[first_entry]
    empty_tail = a.indptr[:-1] >= a.indptr[-1]
    rseg = jnp.zeros((prod_cap,), INDEX_DTYPE).at[
        jnp.where(empty_tail, prod_cap, row_start)
    ].add(1, mode="drop")
    rows_raw = jnp.cumsum(rseg) - 1

    valid = t < total
    rows = jnp.where(valid, rows_raw, a.rows).astype(INDEX_DTYPE)
    # NB: packing B's (idx, val) pairs into complex64 to halve the two
    # remaining gather passes measured FASTER in isolation (144 vs 176
    # ms at 5.6M lookups) but SLOWER end-to-end (753 vs 467 ms) — XLA
    # overlaps the separate gathers better than it fuses the complex
    # pack/unpack.  Keep the straightforward form.
    q_c = jnp.minimum(adj_p + t, b_cap - 1)
    cols = jnp.where(valid, b_indices[q_c], 0)
    vals = jnp.where(
        valid, aval_p * b_data[q_c], jnp.zeros((), a.data.dtype)
    )
    return rows, cols, vals, total


def _exact_prod_count(a: CsMat, b: CsMat) -> int:
    import numpy as np

    a_idx = np.asarray(a.indices)[: int(a.nnz)]
    b_lens = np.diff(np.asarray(b.indptr))
    return int(b_lens[a_idx].sum()) if a_idx.size else 0


def spgemm_caps(a: CsMat, b: CsMat) -> tuple:
    """Exact ``(prod_cap, out_cap)`` for ``C = A @ B``'s sparsity
    pattern (host-side symbolic pass).

    The jit contract requires static capacities: a traced ``spgemm``
    call cannot size its own output (the reference grows the
    allocation on overflow instead, smmp.rs:81-131).  For pipelines
    whose PATTERN is fixed while values change (refactorization-style
    workloads), compute the caps ONCE from concrete pattern arrays,
    then run ``spgemm(..., prod_cap=p, out_cap=o)`` under jit with
    impunity — the result is exact, never truncated.

    Uses the native C++ Gustavson count phase when available, with a
    numpy unique-key fallback (row-chunked to bound host memory).

    >>> import numpy as np
    >>> import sprs_tpu as st
    >>> a = st.from_dense(np.array([[1.0, 2.0], [0.0, 3.0]]))
    >>> st.spgemm_caps(a, a)
    (4, 3)
    """
    import numpy as np

    from .. import native

    a = a.to_csr()
    b = b.to_csr()
    if a.cols != b.rows:
        raise ShapeError(f"spgemm_caps: {a.shape} @ {b.shape}")
    if not is_concrete(a.indptr, a.indices, b.indptr, b.indices):
        raise ValueError(
            "spgemm_caps is the host-side symbolic pass: call it on "
            "concrete pattern arrays outside jit, then pass the caps in"
        )
    prod = _exact_prod_count(a, b)
    ap = np.asarray(a.indptr, np.int64)
    ai = np.asarray(a.indices, np.int64)[: int(ap[-1])]
    bp = np.asarray(b.indptr, np.int64)
    bi = np.asarray(b.indices, np.int64)[: int(bp[-1])]
    lib = native.get_lib()
    if lib is not None:
        cp = np.zeros(a.rows + 1, np.int32)
        out = int(
            lib.sprs_spgemm_count(
                np.ascontiguousarray(ap, np.int32),
                np.ascontiguousarray(ai, np.int32),
                a.rows,
                np.ascontiguousarray(bp, np.int32),
                np.ascontiguousarray(bi, np.int32),
                b.cols,
                cp,
            )
        )
        return prod, out
    # numpy fallback: unique (row, col) keys of the expanded products,
    # chunked at A-row boundaries (no key straddles a chunk, so the
    # per-chunk unique counts sum exactly)
    if prod == 0:
        return 0, 0
    b_lens = np.diff(bp)
    lens = b_lens[ai]  # per-A-entry product count
    ent_cum = np.zeros(ai.size + 1, np.int64)
    np.cumsum(lens, out=ent_cum[1:])
    row_of_ent = np.repeat(np.arange(a.rows, dtype=np.int64), np.diff(ap))
    budget = 1 << 26
    out = 0
    e0 = 0
    while e0 < ai.size:
        # extend to the last row whose products still fit the budget
        e_hi = int(
            np.searchsorted(ent_cum, ent_cum[e0] + budget, side="right") - 1
        )
        e_hi = max(e_hi, e0 + 1)
        r_end = row_of_ent[min(e_hi, ai.size) - 1] + 1
        e1 = int(ap[r_end])
        cnt = lens[e0:e1]
        total = int(ent_cum[e1] - ent_cum[e0])
        rr = np.repeat(row_of_ent[e0:e1], cnt)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            ent_cum[e0:e1] - ent_cum[e0], cnt
        )
        cc = bi[np.repeat(bp[ai[e0:e1]], cnt) + within]
        out += np.unique(rr * np.int64(b.cols) + cc).size
        e0 = e1
    return prod, int(out)


# One lax.sort above ~10^8 elements crashes the TPU worker (observed at
# 140M); row-chunking keeps each device sort safely under that while
# reusing the whole single-shot path per chunk — the sequential-device
# analog of the reference's nnz-balanced row chunking (smmp.rs:335-372).
CHUNK_PRODUCT_BUDGET = 32 * 1024 * 1024

# Batched segment sort (compress_coo sort_batches): split the product
# array at A-row boundaries into ~SORT_BATCH_TARGET-sized segments and
# sort them as one (C, L) batched lax.sort — the comparator-network
# depth scales (log L)^2 instead of (log N)^2.  Only worth it past a
# minimum size.
SORT_BATCH_MIN = 1 << 21
SORT_BATCH_TARGET = 1 << 19


def spgemm_sort_batches(a: CsMat, b: CsMat, target: int = None):
    """Host-side (starts, lens) product segments for the batched sort.

    Segments are split at A-row product boundaries (so no (row, col)
    key straddles two segments) and balanced by product count.  Returns
    None when the product count is too small to benefit.  Pass the
    result to :func:`spgemm` as a static argument when calling under
    jit (the host arrays embed as constants).
    """
    import numpy as np

    if target is None:
        target = SORT_BATCH_TARGET
    nnz_a = int(a.nnz)
    indptr = np.asarray(a.indptr)
    idx = np.asarray(a.indices)[:nnz_a]
    b_lens = np.diff(np.asarray(b.to_csr().indptr))
    per_entry = b_lens[idx] if nnz_a else np.zeros((0,), np.int64)
    entry_prefix = np.concatenate([[0], np.cumsum(per_entry)])
    row_prefix = entry_prefix[np.minimum(indptr, nnz_a)]
    total = int(row_prefix[-1])
    if total < SORT_BATCH_MIN:
        return None
    starts, r0 = [], 0
    n_rows = a.rows
    while r0 < n_rows:
        starts.append(int(row_prefix[r0]))
        r1 = int(
            np.searchsorted(row_prefix, row_prefix[r0] + target, "right")
            - 1
        )
        r0 = min(max(r1, r0 + 1), n_rows)
    starts = np.asarray(starts, np.int64)
    lens = np.diff(np.concatenate([starts, [total]]))
    return starts, lens


def _spgemm_chunked(a: CsMat, b: CsMat, budget: int) -> CsMat:
    """Row-chunked ESC SpGEMM for product counts beyond one sort's
    budget.  Host (concrete) path only for the BOUNDARIES: chunk limits
    are chosen on the host so every chunk's expansion fits ``budget``
    products, then everything else stays device-resident — chunk inputs
    are ``dynamic_slice``s of A's device arrays inside one compiled
    executable, chunk outputs are sliced/stitched as device arrays, and
    the only per-chunk tunnel traffic is four index scalars up and one
    nnz scalar down.  (Round 1 round-tripped every chunk's full result
    through the host: 133 s vs scipy's 7.8 s at 140M products.)  The
    sequential-device analog of the reference's nnz-balanced row
    chunking (smmp.rs:335-372)."""
    import numpy as np

    nnz_a = int(a.nnz)
    indptr = np.asarray(a.indptr)
    idx = np.asarray(a.indices)[:nnz_a]
    b_lens = np.diff(np.asarray(b.indptr))
    per_entry = b_lens[idx] if nnz_a else np.zeros((0,), np.int64)
    entry_prefix = np.concatenate([[0], np.cumsum(per_entry)])
    row_prefix = entry_prefix[np.minimum(indptr, nnz_a)]

    n_rows = a.rows
    chunks = []
    r0 = 0
    while r0 < n_rows:
        r1 = int(
            np.searchsorted(row_prefix, row_prefix[r0] + budget, "right")
            - 1
        )
        r1 = max(r1, r0 + 1)  # a single over-budget row still advances
        r1 = min(r1, n_rows)
        chunks.append((r0, r1))
        r0 = r1

    # Uniform chunk shapes (rows padded with trailing empty rows, entry
    # arrays capacity-padded) so ONE compiled executable serves every
    # chunk.
    max_rows = max(r1 - r0 for r0, r1 in chunks)
    max_ents = max(
        int(indptr[r1] - indptr[r0]) for r0, r1 in chunks
    )
    max_ents = max(max_ents, 1)
    chunk_prod_cap = int(
        max(
            row_prefix[r1] - row_prefix[r0] for r0, r1 in chunks
        )
    )
    chunk_prod_cap = max(chunk_prod_cap, 1)

    # A's arrays padded with slack so in-jit dynamic_slice never clamps.
    a_idx_pad = jnp.concatenate(
        [a.indices, jnp.zeros((max_ents,), a.indices.dtype)]
    )
    a_dat_pad = jnp.concatenate(
        [a.data, jnp.zeros((max_ents,), a.data.dtype)]
    )
    a_ip_pad = jnp.concatenate(
        [
            a.indptr,
            jnp.full((max_rows,), a.indptr[-1], a.indptr.dtype),
        ]
    )
    ncols = a.cols

    @jax.jit
    def run_chunk(aidx, adat, aip, bmat, r0, lo, nents):
        # rows [r0, r0+max_rows) of A with entries [lo, lo+nents);
        # rows past the chunk end clamp to empty via the nents clip.
        ipfull = jax.lax.dynamic_slice(aip, (r0,), (max_rows + 1,))
        ip = jnp.clip(ipfull - lo, 0, nents).astype(INDEX_DTYPE)
        sub = CsMat(
            ip,
            jax.lax.dynamic_slice(aidx, (lo,), (max_ents,)),
            jax.lax.dynamic_slice(adat, (lo,), (max_ents,)),
            (max_rows, ncols),
            "csr",
        )
        c = spgemm(
            sub,
            bmat,
            prod_cap=chunk_prod_cap,
            out_cap=chunk_prod_cap,
            check_capacity=False,
        )
        return c.indptr, c.indices, c.data

    parts_indptr = [jnp.zeros((1,), jnp.int64)]
    parts_indices = []
    parts_data = []
    base = 0
    for r0, r1 in chunks:
        lo, hi = int(indptr[r0]), int(indptr[r1])
        cipr, cidx, cdat = run_chunk(
            a_idx_pad,
            a_dat_pad,
            a_ip_pad,
            b,
            jnp.int32(r0),
            jnp.int32(lo),
            jnp.int32(hi - lo),
        )
        c_nnz = int(cipr[r1 - r0])  # one scalar down the tunnel
        parts_indptr.append(
            cipr[1 : r1 - r0 + 1].astype(jnp.int64) + base
        )
        parts_indices.append(jax.lax.slice(cidx, (0,), (c_nnz,)))
        parts_data.append(jax.lax.slice(cdat, (0,), (c_nnz,)))
        base += c_nnz
    cap = max(base, 1)
    pad = cap - base
    out_indices = jnp.concatenate(
        parts_indices + [jnp.zeros((pad,), INDEX_DTYPE)]
    )
    out_data = jnp.concatenate(
        parts_data + [jnp.zeros((pad,), a.data.dtype)]
    )
    out_indptr = jnp.concatenate(parts_indptr)
    if base < 2**31:
        out_indptr = out_indptr.astype(INDEX_DTYPE)
    return CsMat(
        out_indptr,
        out_indices.astype(INDEX_DTYPE),
        out_data,
        (a.rows, b.cols),
        "csr",
    )


# Dense-regime switch for method="auto" (concrete inputs): measured ESC
# rate ~3.5e7 products/s vs MXU ~1e13 MAC/s gives break-even near
# products ~ 1.5e-6 * m*k*n; 3e-6 adds margin for densify/convert cost.
AUTO_DENSE_PRODUCTS_PER_MAC = 3e-6


def spgemm(
    a: CsMat,
    b: CsMat,
    *,
    out_cap: Optional[int] = None,
    prod_cap: Optional[int] = None,
    check_capacity: bool = True,
    sort_batches=None,
    method: str = "esc",
    precision: str = "highest",
    out_format: str = "csr",
):
    """C = A @ B for sparse A, B.

    On concrete inputs, capacities default to exact values and the result
    is tightly packed.  Under jit, ``prod_cap`` (and optionally
    ``out_cap``, defaulting to ``prod_cap``) must be given; overflow
    truncates and is reported via host check when ``check_capacity``.
    ``sort_batches``: host segments from :func:`spgemm_sort_batches`
    (auto-computed on large concrete inputs) — batches the ESC sort.

    ``method``: ``'esc'`` (default) keeps the structural output pattern;
    ``'dense'`` forces the densified-MXU path (:func:`spgemm_dense`);
    ``'auto'`` (concrete inputs only) picks dense when the
    partial-product count clears the measured MXU break-even and the
    dense temporaries fit — NOTE the dense path's pattern is the
    numerical nonzero pattern (exact-cancellation entries dropped).

    ``precision`` (dense/auto-dense path only): ``'highest'`` keeps
    f32 MXU passes; ``'default'`` allows bf16 passes — measured 5x on
    the bare matmul (407→81 ms, 139 TFLOP/s at the 140M-product
    shape) at ~2.4e-3 relative error (results_r4/dense_prec.json).

    ``out_format``: ``'csr'`` (default) always returns a
    :class:`CsMat`.  ``'auto'`` lets the dense regime return a
    :class:`~sprs_tpu.formats.bsr.BsrMat` instead — the dense path's
    wall is the per-element CSR compaction (~2 s at 104M nnz, the
    scatter-unit ceiling) while block extraction runs at HBM bandwidth
    (97x measured, BASELINE.md round 4); chained products consume the
    BSR directly (``matmul`` dispatches it).  ``'bsr'`` forces a BSR
    result on any path (concrete inputs only; the ESC route converts
    via ``bsr_from_csmat``).

    >>> import numpy as np
    >>> import sprs_tpu as st
    >>> a = st.from_dense(np.array([[1.0, 0.0], [2.0, 3.0]]))
    >>> b = st.from_dense(np.array([[0.0, 4.0], [5.0, 0.0]]))
    >>> np.asarray(st.spgemm(a, b).to_dense()).tolist()
    [[0.0, 4.0], [15.0, 8.0]]
    """
    if a.cols != b.rows:
        raise ShapeError(f"spgemm: {a.shape} @ {b.shape}")
    if out_format not in ("csr", "auto", "bsr"):
        raise ValueError(f"unknown spgemm out_format {out_format!r}")
    if method == "dense":
        if out_format in ("auto", "bsr"):
            return spgemm_dense_bsr(a, b, precision=precision)
        return spgemm_dense(a, b, out_cap=out_cap, precision=precision)
    if method not in ("esc", "auto"):
        raise ValueError(f"unknown spgemm method {method!r}")
    if out_format == "bsr":
        from ..formats.bsr import bsr_from_csmat

        c = spgemm(
            a,
            b,
            out_cap=out_cap,
            prod_cap=prod_cap,
            check_capacity=check_capacity,
            sort_batches=sort_batches,
            method=method,
            precision=precision,
            out_format="auto",
        )
        return c if not isinstance(c, CsMat) else bsr_from_csmat(c.to_csr())
    if a.is_csc:
        # (A·B) = (Bᵀ·Aᵀ)ᵀ — runs the CSR kernel, returns CSC.
        # (out_format='auto' degrades to CSR here: the transposed
        # result would need a BSR transpose; callers wanting BSR from
        # CSC inputs convert the lhs to CSR first.)
        return spgemm(
            b.T.to_csr(),
            a.T.to_csr(),
            out_cap=out_cap,
            prod_cap=prod_cap,
            check_capacity=check_capacity,
            method=method,
            precision=precision,
        ).T
    b = b.to_csr()

    concrete = is_concrete(a.indptr, a.indices, b.indptr)
    if prod_cap is None:
        if not concrete:
            raise ValueError(
                "spgemm under jit requires a static prod_cap bound"
            )
        exact = _exact_prod_count(a, b)
        if method == "auto":
            m, k = a.shape
            n = b.cols
            itemsize = jnp.result_type(
                a.data.dtype, b.data.dtype
            ).itemsize
            fits = (
                (m * k + k * n + m * n) * itemsize
                <= DENSE_BYTES_BUDGET
            )
            if fits and exact >= AUTO_DENSE_PRODUCTS_PER_MAC * (
                float(m) * k * n
            ):
                if out_format == "auto":
                    return spgemm_dense_bsr(a, b, precision=precision)
                return spgemm_dense(
                    a, b, out_cap=out_cap, precision=precision
                )
        if exact > CHUNK_PRODUCT_BUDGET:
            return _spgemm_chunked(a, b, CHUNK_PRODUCT_BUDGET)
        prod_cap = max(exact, 1)
        if sort_batches is None and exact >= SORT_BATCH_MIN:
            sort_batches = spgemm_sort_batches(a, b)
    from ..formats.util import MAX_INDEX

    if prod_cap > MAX_INDEX:
        # i32 positions index the padded product arrays: a larger cap
        # would silently wrap (reference analog: SpIndex's "index type
        # is not large enough" panic, sprs/src/indexing.rs:18-46);
        # concrete inputs chunk automatically well before this.
        raise CapacityError.index_limit(
            "prod_cap",
            prod_cap,
            hint="pass concrete inputs (the host path row-chunks any "
            "product count automatically, each chunk under the i32 "
            "budget), or partition A's rows with slice_outer and "
            "stitch per-block results (docs/SCALE.md recipe)",
        )
    if out_cap is not None and out_cap > MAX_INDEX:
        raise CapacityError.index_limit(
            "out_cap",
            out_cap,
            hint="a single CsMat holds at most 2^31-1 entries; keep "
            "row-block products as separate matrices via slice_outer "
            "(docs/SCALE.md recipe)",
        )
    rows, cols, vals, total = _expand_products(a, b, prod_cap)

    cap0 = out_cap if out_cap is not None else prod_cap
    res = compress_coo(
        rows=rows,
        cols=cols,
        value_channels=(vals,),
        nvalid=prod_cap,
        n_outer=a.rows,
        n_inner=b.cols,
        out_cap=cap0,
        sort_batches=sort_batches,
    )
    c = CsMat(res.indptr, res.indices, res.values[0], (a.rows, b.cols), "csr")
    if concrete and check_capacity:
        required = int(res.required_nnz)
        if int(total) > prod_cap:
            raise CapacityError(int(total), prod_cap)
        if required > cap0:
            raise CapacityError(required, cap0)
        if out_cap is None:
            # tighten to the exact nnz for eager callers
            c = c.with_cap(max(required, 1))
    return c


# ---------------------------------------------------------------------------
# densified MXU path
# ---------------------------------------------------------------------------

# Dense temporaries budget for the one-shot densified product; beyond it
# A (and C) are row-chunked.  Leaves headroom on a 16 GB-HBM chip.
DENSE_BYTES_BUDGET = 6 << 30


def _with_cap_truncating(c: CsMat, cap: int) -> CsMat:
    """Re-cap matching ``from_dense``'s contract: keep the FIRST ``cap``
    entries with valid structure (indptr clipped, dead tail zeroed).
    ``CsMat.with_cap`` raises on shrink-below-nnz, which made
    ``spgemm_dense(out_cap=...)`` truncate or crash depending on
    whether the workload crossed the chunking budget."""
    ip = jnp.minimum(c.indptr, cap).astype(INDEX_DTYPE)
    if cap > c.cap:
        idx = jnp.pad(c.indices, (0, cap - c.cap))
        dat = jnp.pad(c.data, (0, cap - c.cap))
    else:
        idx = c.indices[:cap]
        dat = c.data[:cap]
    live = jnp.arange(cap, dtype=INDEX_DTYPE) < ip[-1]
    return CsMat(
        ip,
        jnp.where(live, idx, 0),
        jnp.where(live, dat, jnp.zeros((), dat.dtype)),
        c.shape,
        c.storage,
    )


def spgemm_dense(
    a: CsMat,
    b: CsMat,
    *,
    eps: float = 0.0,
    out_cap: Optional[int] = None,
    precision: str = "highest",
) -> CsMat:
    """C = A @ B via densified matmul on the MXU.

    TPU-first fast path for the high-density regime.  ESC's cost scales
    with the partial-product count and is gather/sort-bound (~3.5e7
    products/s measured on this chip); the MXU multiplies dense tiles at
    ~1e13 MAC/s.  Break-even is therefore around ``products >= 1.5e-6 *
    m*k*n`` — e.g. the reference bench point (15000,25000) @ d=5e-3
    (140M products, 5.6e12 dense MACs) sits ~20x past it.  The reference
    has no analog: SMMP (smmp.rs:196-416) is always sparse on CPU; on
    TPU the systolic array flips the economics at bench densities.

    Structural caveat: the output pattern is the NUMERICAL nonzero
    pattern (``|c_ij| > eps``) — entries whose partial products cancel
    to exactly zero are dropped, where ESC/SMMP would keep them
    structurally.  Callers needing the structural pattern must use
    :func:`spgemm`.

    ``precision='highest'`` (default) keeps f32 MXU passes for parity
    with the f32 ESC path; pass ``'default'`` to allow bf16 passes
    (faster, ~1e-2 relative error).

    On concrete inputs the result is tightly packed (exact nnz, one
    scalar fetch); under jit pass ``out_cap``.  Inputs whose dense
    temporaries exceed ``DENSE_BYTES_BUDGET`` are chunked — over B's
    columns first when dense B alone dominates the budget, then over
    A's rows — with one dispatch per chunk.
    """
    if a.cols != b.rows:
        raise ShapeError(f"spgemm_dense: {a.shape} @ {b.shape}")
    a = a.to_csr()  # chunking slices ROWS — a CSC outer slice would
    # cut columns; normalize before any branch
    m, k = a.shape
    n = b.cols
    itemsize = jnp.result_type(a.data.dtype, b.data.dtype).itemsize
    concrete = is_concrete(a.indptr, a.indices, b.indptr)
    dense_bytes = (m * k + k * n + m * n) * itemsize
    # Chunk bounds floor at 128 to keep MXU tiles sane; when even a
    # 128-wide chunk exceeds the budget the splits below make no
    # progress, so each branch only fires if it genuinely subdivides
    # (guards against infinite recursion — the one-shot product then
    # runs over budget rather than recursing forever).
    if concrete and k * n * itemsize > DENSE_BYTES_BUDGET // 2:
        # dense B alone dominates: chunk its columns (csc outer
        # slices), recurse (each chunk may still row-chunk A), hstack
        cols_per = max(
            int((DENSE_BYTES_BUDGET // 2) // (k * itemsize)), 128
        )
        if cols_per < n:
            from .construct import hstack

            bc = b.to_csc()
            parts = [
                spgemm_dense(
                    a,
                    bc.slice_outer(c0, min(c0 + cols_per, n)),
                    eps=eps,
                    precision=precision,
                )
                for c0 in range(0, n, cols_per)
            ]
            out = hstack(parts).to_csr()
            return (
                out
                if out_cap is None
                else _with_cap_truncating(out, out_cap)
            )
    if concrete and dense_bytes > DENSE_BYTES_BUDGET:
        fixed = k * n * itemsize
        rows_per = max(
            int((DENSE_BYTES_BUDGET - fixed) // ((k + n) * itemsize)),
            128,
        )
        if rows_per < m:
            from .construct import vstack

            parts = [
                spgemm_dense(
                    a.slice_outer(r0, min(r0 + rows_per, m)),
                    b,
                    eps=eps,
                    precision=precision,
                )
                for r0 in range(0, m, rows_per)
            ]
            out = vstack(parts)
            return (
                out
                if out_cap is None
                else _with_cap_truncating(out, out_cap)
            )

    c = _dense_prod(a, b, prec=precision)
    from ..formats.csmat import from_dense

    return from_dense(c, eps=eps, cap=out_cap)


def _densify_operand(op):
    """Dense array of a CsMat or BsrMat operand (trace-safe)."""
    from ..formats.bsr import BsrMat

    if isinstance(op, BsrMat):
        return op.to_dense()  # contiguous block scatter, HBM-rate
    return op.to_csr().to_dense()


@functools.partial(jax.jit, static_argnames=("prec",))
def _dense_prod(am, bm, *, prec):
    # module-level jit: repeated spgemm_dense calls reuse the executable.
    # preferred_element_type pins f32-or-wider ACCUMULATION even when
    # precision='default' lets the MXU run bf16 input passes.
    ad, bd = _densify_operand(am), _densify_operand(bm)
    out = jnp.result_type(ad, bd)
    acc = (
        jnp.float32
        if jnp.issubdtype(out, jnp.floating)
        and jnp.finfo(out).bits < 32
        else out
    )
    return jnp.matmul(
        ad, bd, precision=prec, preferred_element_type=acc
    ).astype(out)


def spgemm_dense_bsr(
    a: CsMat,
    b: CsMat,
    *,
    block_size: int = 128,
    eps: float = 0.0,
    precision: str = "highest",
) -> "BsrMat":
    """C = A @ B on the MXU with a BLOCK-SPARSE result — the
    compaction-free dense route.

    ``spgemm_dense``'s wall is `from_dense`: per-element CSR placement
    at the ~50M elem/s scatter-unit rate (2.0 s for the 104M-nnz
    140M-product bench point, BASELINE.md round 4).  Emitting
    :class:`BsrMat` instead needs no per-element placement at all —
    the block mask is a reduction and block extraction is one
    contiguous-slice gather — so the whole product runs at
    matmul + bandwidth cost.  The result plugs straight into the
    MXU SpMM kernels (``bsr_spmm_xla`` / the Pallas grouped matmul)
    for chained products.

    Pattern semantics match ``spgemm_dense`` (numerical-nonzero, at
    block granularity: a block survives iff it has any |entry| > eps).
    Concrete-only (block list is fetched to fix static shapes).
    A-row chunking (aligned to ``block_size``) keeps the dense
    temporaries under ``DENSE_BYTES_BUDGET``; a k·n dense B beyond the
    budget is rejected — use ``spgemm``'s ESC/chunked path there.

    Either operand may be a :class:`BsrMat` (a prior dense-regime
    product): densification is a contiguous block scatter, so chained
    products never touch per-element CSR compaction.
    """
    import numpy as np

    from ..formats.bsr import BsrMat, bsr_from_dense_device

    if a.cols != b.rows:
        raise ShapeError(f"spgemm_dense_bsr: {a.shape} @ {b.shape}")
    if isinstance(a, CsMat):
        a = a.to_csr()
    m, k = a.shape
    n = b.cols
    leaves = jax.tree_util.tree_leaves((a, b))
    if not is_concrete(*leaves):
        raise ValueError("spgemm_dense_bsr requires concrete inputs")
    itemsize = jnp.result_type(a.dtype, b.dtype).itemsize
    if k * n * itemsize > DENSE_BYTES_BUDGET // 2:
        raise CapacityError(
            int(k * n * itemsize),
            DENSE_BYTES_BUDGET // 2,
            "spgemm_dense_bsr: dense B alone exceeds the byte budget; "
            "use spgemm (ESC/chunked) or chunk B's columns by hand",
        )
    dense_bytes = (m * k + k * n + m * n) * itemsize
    if dense_bytes > DENSE_BYTES_BUDGET:
        fixed = k * n * itemsize
        rows_per = max(
            int((DENSE_BYTES_BUDGET - fixed) // ((k + n) * itemsize)),
            block_size,
        )
        align = block_size
        if isinstance(a, BsrMat):
            align = int(np.lcm(block_size, a.block_size))
        rows_per -= rows_per % align
        rows_per = max(rows_per, align)
        if rows_per < m:

            def _rows(mat, r0, r1):
                if isinstance(mat, BsrMat):
                    return mat.slice_block_rows(r0, r1)
                return mat.slice_outer(r0, r1)

            parts = [
                spgemm_dense_bsr(
                    _rows(a, r0, min(r0 + rows_per, m)),
                    b,
                    block_size=block_size,
                    eps=eps,
                    precision=precision,
                )
                for r0 in range(0, m, rows_per)
            ]
            # vstack of BSR: block rows offset by each part's extent
            brows, bcols, blocks = [], [], []
            off = 0
            for p, r0 in zip(parts, range(0, m, rows_per)):
                nb = p.n_blocks
                brows.append(np.asarray(p.brows)[:nb] + off)
                bcols.append(np.asarray(p.bcols)[:nb])
                blocks.append(p.blocks[:nb])
                off += -(-p.shape[0] // block_size)
            return BsrMat(
                jnp.asarray(np.concatenate(brows), INDEX_DTYPE),
                jnp.asarray(np.concatenate(bcols), INDEX_DTYPE),
                jnp.concatenate(blocks, axis=0),
                (m, n),
                int(sum(p.n_blocks for p in parts)),
            )
    c = _dense_prod(a, b, prec=precision)
    return bsr_from_dense_device(c, block_size, eps=eps)
