"""Supernodal left-looking LDLᵀ numeric — dense frontal GEMMs on the MXU.

Executes docs/SUPERNODAL_PLAN.md step 2.  The reference's numeric is an
up-looking row recurrence (/root/reference/sprs-ldl/src/lib.rs:502-593);
the TPU-native answer is a CHOLMOD-class supernodal schedule: columns of
L are partitioned into supernodes (shared below-diagonal row structure,
see ``supernodes.py``), each factored as one dense trapezoidal panel,
with inter-supernode Schur updates expressed as (MR×W)·(W×W) matmuls —
exactly the shape the MXU wants, instead of the row scan's length-wc
scalar-ish updates.

Why this is exact (not an approximation):

* Supernode s spans columns ``[c0, c1)``; every column j is padded to
  the structure ``[j+1..c1) ∪ rows(s)`` where ``rows(s)`` is the UNION
  of the member columns' below-c1 structures
  (``supernodes.amalgamate_union``).  Containment is then true BY
  CONSTRUCTION for any contiguous column partition — the zeros budget
  and ``max_width`` are pure efficiency knobs, not correctness rules.
* Entries introduced by padding are EXACTLY 0.0 in floating point: for
  a position outside the simplicial pattern, every update term carries
  a factor that is itself a padded (exactly-zero) entry — by induction,
  and because IEEE gives 0·x = 0 and 0−0 = 0 exactly — so gathering the
  simplicial CSC slots out of the panels reproduces the row-scan
  factorization up to summation order.

Memory layout: panels are stored back-to-back in one flat array with a
fixed row stride of W (the max supernode width); panel s occupies
``off[s] + r*W + c`` for row-slot r < rows[s].  Row slots: the first
w[s] are the diagonal-block rows c0..c1−1, the rest are rows(s) in
ascending order.  Reads are contiguous ``dynamic_slice``s of MR·W (the
flat array carries MR·W slack at the end so slices never clamp), writes
are contiguous ``dynamic_update_slice``s that restore overhang rows —
there is no scatter anywhere in the hot loop, because TPU scatter
throughput (~50M elem/s) would dominate everything else.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..errors import LinalgError
from ..formats.util import INDEX_DTYPE
from .supernodes import amalgamate_subtree, amalgamate_union


class SupernodalPlanError(LinalgError):
    """Raised when a supernodal plan would be infeasible (memory) —
    callers fall back to the row-scan numeric."""


def _ceil8(x: int) -> int:
    return max(8, (int(x) + 7) & ~7)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SuperPlan:
    """Static supernodal factorization schedule (host-precomputed)."""

    n: int
    S: int  # number of supernodes
    W: int  # max supernode width, padded to a multiple of 8
    MR: int  # max panel rows (width + below-rows), padded, >= W
    P: int  # flat panel array length (includes MR*W read slack)
    # per-supernode geometry
    c0: np.ndarray  # (S,) first column
    w: np.ndarray  # (S,) width
    rows: np.ndarray  # (S,) valid panel rows (w + |below|)
    off: np.ndarray  # (S,) flat panel offsets
    # assembly: scatter A's lower-triangle values into the panels
    asm_src: np.ndarray  # (nnz_low,) positions into the input data array
    asm_dst: np.ndarray  # (nnz_low,) flat panel positions
    # task schedule: per-target updates (type 0) then its factor (type 1)
    t_type: np.ndarray  # (T,)
    t_src: np.ndarray  # (T,) descendant supernode (== snode for factor)
    t_dst: np.ndarray  # (T,) target supernode
    t_rmap: np.ndarray  # (T, MR) target row-slot -> source panel row-slot
    #   (MR = "no shared row": gathers the zero pad row)
    # extraction: CSC slot -> flat panel position
    csc_gather: np.ndarray  # (lnz,)
    # below-row structure (for the panel solves): supernode s's below
    # rows are below_flat[below_ptr[s]:below_ptr[s+1]], ascending;
    # below_flat carries an MR-sized sentinel (n) tail so static-width
    # dynamic_slices never clamp.
    below_ptr: np.ndarray  # (S+1,)
    below_flat: np.ndarray  # (total_below + MR,)

    @property
    def n_tasks(self) -> int:
        return self.t_type.shape[0]

    # Registered as a pytree so callers can pass the plan THROUGH jit
    # boundaries as an argument: the index maps are O(lnz)-scale
    # (t_rmap alone is 450 MB at 262k rows) and closing over them
    # embeds HLO constants — ballooning the remote-compile payload past
    # the tunnel's ~500 MB HTTP cliff.  As pytree leaves they transfer
    # once as device buffers instead.
    def tree_flatten(self):
        leaves = (
            self.c0,
            self.w,
            self.rows,
            self.off,
            self.asm_src,
            self.asm_dst,
            self.t_type,
            self.t_src,
            self.t_dst,
            self.t_rmap,
            self.csc_gather,
            self.below_ptr,
            self.below_flat,
        )
        return leaves, (self.n, self.S, self.W, self.MR, self.P)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        n, S, W, MR, P = aux
        return cls(n, S, W, MR, P, *leaves)


@dataclasses.dataclass
class _Prelude:
    """Shared host-side plan machinery: supernode geometry, membership
    queries, assembly/extraction maps, and the update-pair list.  Built
    once and consumed by both the left-looking ``build_super_plan`` and
    the multifrontal-lite ``ldl_mf.build_mf_plan``."""

    n: int
    S: int
    W: int
    MR: int
    P: int
    of: np.ndarray  # (n,) column -> supernode
    c0: np.ndarray
    c1: np.ndarray
    w: np.ndarray
    rows: np.ndarray
    off: np.ndarray  # (S+1,)
    below_ptr: np.ndarray
    below_flat: np.ndarray
    total_below: int
    below_owner: np.ndarray
    asm_src: np.ndarray
    asm_dst: np.ndarray
    pair_d: np.ndarray
    pair_t: np.ndarray
    csc_gather: np.ndarray
    member_slot: object  # vectorized (snode, g) -> (slot, found)


def _build_prelude(
    sym,
    *,
    max_width: int,
    max_zeros: int,
    rel_zeros: float,
    panel_limit: int,
    align: str = "subtree",
) -> _Prelude:
    n = sym.n
    if n == 0:
        raise SupernodalPlanError("empty matrix")
    lp = np.asarray(sym.l_indptr, dtype=np.int64)
    li = np.asarray(sym.l_indices, dtype=np.int64)
    col_size = np.diff(lp)
    # union-structure relaxed amalgamation (CHOLMOD-class): every
    # contiguous partition is exact, so bushy (AMD+postorder) etrees
    # merge into MXU-sized panels too — the chain-rule variant left
    # them at width ~1-2.  below structure comes back as the union
    # lists (ascending per supernode).  align='subtree' cuts along
    # complete etree subtrees instead — required by the level-batched
    # numeric, whose critical path the union merges otherwise weld
    # into a chain (see supernodes.amalgamate_subtree).
    amalgamate_fn = (
        amalgamate_subtree if align == "subtree" else amalgamate_union
    )
    sn, below_ptr, below_flat = amalgamate_fn(
        lp,
        li,
        np.asarray(sym.parent),
        col_size,
        max_zeros=max_zeros,
        max_width=max_width,
        rel_zeros=rel_zeros,
    )
    ptr = sn.ptr
    of = sn.of
    S = sn.n_snodes
    c0 = ptr[:-1].astype(np.int64)
    c1 = ptr[1:].astype(np.int64)
    w = c1 - c0
    W = _ceil8(int(w.max()))
    counts = np.diff(below_ptr)
    total_below = int(below_ptr[-1])
    rows = w + counts
    MR = max(_ceil8(int(rows.max())), W)
    off = np.zeros(S + 1, dtype=np.int64)
    np.cumsum(rows * W, out=off[1:])
    P = int(off[-1]) + MR * W
    if P > panel_limit:
        raise SupernodalPlanError(
            f"panel storage {P} elements exceeds limit {panel_limit}"
        )
    if P + MR * W >= 2**31:
        # int32 panel positions (incl. the OOB sentinel region) — holds
        # for any panel_limit a caller might raise
        raise SupernodalPlanError(
            f"panel positions {P + MR * W} exceed int32 range"
        )

    # sorted membership key: (owner supernode, global row) — owners
    # ascend and rows ascend within an owner, so the concatenation is
    # globally sorted and one searchsorted answers membership queries.
    below_owner = np.repeat(np.arange(S, dtype=np.int64), counts)
    below_key = below_owner * np.int64(n) + below_flat

    def member_slot(snode: np.ndarray, g: np.ndarray):
        """Panel row-slot of global row g inside supernode ``snode``
        (vectorized); returns (slot, found) with found=False where g is
        not in the supernode's below structure."""
        qk = snode * np.int64(n) + g
        if total_below:
            pos = np.searchsorted(below_key, qk)
            posc = np.minimum(pos, total_below - 1)
            found = (g >= 0) & (below_key[posc] == qk)
            slot = w[snode] + (posc - below_ptr[snode])
        else:
            found = np.zeros(qk.shape, dtype=bool)
            slot = np.zeros(qk.shape, dtype=np.int64)
        return slot, found

    # --- assembly map: A lower-triangle entries -> panel positions -----
    wa = sym.a_pos.shape[1]
    live = np.asarray(sym.a_live).ravel()
    k_ent = np.repeat(np.arange(n, dtype=np.int64), wa)[live]
    j_ent = np.asarray(sym.a_col, dtype=np.int64).ravel()[live]
    asm_src = np.asarray(sym.a_pos, dtype=np.int64).ravel()[live]
    s_ent = of[j_ent]
    in_diag = k_ent < c1[s_ent]
    bslot, bfound = member_slot(s_ent, k_ent)
    if not np.all(in_diag | bfound):
        raise SupernodalPlanError(
            "matrix entry outside the symbolic L pattern"
        )
    rslot = np.where(in_diag, k_ent - c0[s_ent], bslot)
    asm_dst = off[s_ent] + rslot * W + (j_ent - c0[s_ent])

    # --- update pairs: descendant d touches target t iff a below-row of
    # d lands in t's columns.  (owner, of[row]) keys are sorted already.
    if total_below:
        t_of_below = of[below_flat]
        pair_key = below_owner * np.int64(S) + t_of_below
        uniq = np.unique(pair_key)
        pair_d = uniq // S
        pair_t = uniq % S
    else:
        pair_d = pair_t = np.zeros(0, dtype=np.int64)

    # --- extraction: CSC slot -> panel position ------------------------
    colj = np.repeat(np.arange(n, dtype=np.int64), col_size)
    s_c = of[colj]
    r = li
    in_diag3 = r < c1[s_c]
    bslot3, bfound3 = member_slot(s_c, r)
    if not np.all(in_diag3 | bfound3):
        raise SupernodalPlanError("L pattern row outside supernode structure")
    rslot3 = np.where(in_diag3, r - c0[s_c], bslot3)
    csc_gather = off[s_c] + rslot3 * W + (colj - c0[s_c])

    return _Prelude(
        n=n,
        S=S,
        W=W,
        MR=MR,
        P=P,
        of=of,
        c0=c0,
        c1=c1,
        w=w,
        rows=rows,
        off=off,
        below_ptr=below_ptr,
        below_flat=below_flat,
        total_below=total_below,
        below_owner=below_owner,
        asm_src=asm_src,
        asm_dst=asm_dst,
        pair_d=pair_d,
        pair_t=pair_t,
        csc_gather=csc_gather,
        member_slot=member_slot,
    )


def _pair_rmap(pre: _Prelude, pair_d, pair_t):
    """(npairs, MR) target row-slot -> descendant panel row-slot table
    (sentinel MR where the target slot has no shared row)."""
    from .. import native

    npairs = pair_d.shape[0]
    if not npairs:
        return np.zeros((0, pre.MR), dtype=np.int32)
    rmap = native.super_rmap(
        pair_d, pair_t, pre.c0, pre.w, pre.below_ptr, pre.below_flat,
        pre.MR,
    )
    # keep int32 end-to-end: the (npairs, MR) table is 450 MB at
    # 262k rows and every widening/copy pass costs seconds
    if rmap is not None:
        return rmap
    # numpy fallback: broadcast (npairs, MR) membership queries —
    # measured 32 s vs <1 s for the C++ merges at 262k rows
    MR = pre.MR
    w, rows, c0 = pre.w, pre.rows, pre.c0
    below_ptr, below_flat = pre.below_ptr, pre.below_flat
    slots = np.arange(MR, dtype=np.int64)
    tw = w[pair_t][:, None]
    trows = rows[pair_t][:, None]
    g_diag = c0[pair_t][:, None] + slots[None, :]
    bidx = below_ptr[pair_t][:, None] + (slots[None, :] - tw)
    in_diag_slot = slots[None, :] < tw
    in_below_slot = (slots[None, :] >= tw) & (slots[None, :] < trows)
    bidx_c = np.clip(bidx, 0, max(pre.total_below - 1, 0))
    g = np.where(
        in_diag_slot,
        g_diag,
        np.where(in_below_slot, below_flat[bidx_c], -1),
    )
    dslot, dfound = pre.member_slot(
        np.broadcast_to(pair_d[:, None], g.shape), g
    )
    return np.where(dfound, dslot, MR).astype(np.int32)


def build_super_plan(
    sym,
    *,
    max_width: int = 128,
    max_zeros: int = 32,
    rel_zeros: float = 0.65,
    panel_limit: int = 1 << 28,
    map_limit: int = 1 << 27,
    align: str = "subtree",
) -> SuperPlan:
    """Build the supernodal schedule from an ``LdlSymbolic``.

    ``panel_limit`` bounds the flat panel array length (elements); it
    must stay < 2^29 so int32 position arithmetic (with the OOB
    sentinel P) cannot overflow.  ``map_limit`` bounds the (T, MR)
    row-map table.  Exceeding either raises ``SupernodalPlanError``.
    ``align='subtree'`` cuts supernodes along complete etree subtrees
    (short critical path for the level-batched numeric).
    """
    pre = _build_prelude(
        sym,
        max_width=max_width,
        max_zeros=max_zeros,
        rel_zeros=rel_zeros,
        panel_limit=panel_limit,
        align=align,
    )
    n, S, W, MR, P = pre.n, pre.S, pre.W, pre.MR, pre.P
    pair_d, pair_t = pre.pair_d, pre.pair_t
    npairs = pair_d.shape[0]
    T = npairs + S
    if T * MR > map_limit:
        raise SupernodalPlanError(
            f"row-map table {T}x{MR} exceeds limit {map_limit}"
        )
    rmap = _pair_rmap(pre, pair_d, pair_t)

    # --- task schedule: for each target s ascending, its updates
    # (descendants ascending) then its factor step -----------------------
    upd_cnt = np.bincount(pair_t, minlength=S) if npairs else np.zeros(S, np.int64)
    task_ptr = np.zeros(S + 1, dtype=np.int64)
    np.cumsum(upd_cnt + 1, out=task_ptr[1:])
    t_type = np.zeros(T, dtype=np.int32)
    t_src = np.zeros(T, dtype=np.int64)
    t_dst = np.zeros(T, dtype=np.int64)
    t_rmap = np.full((T, MR), MR, dtype=np.int32)
    if npairs:
        order = np.lexsort((pair_d, pair_t))
        pt_sorted = pair_t[order]
        # rank of each pair within its target group
        grp_first = np.zeros(npairs, dtype=np.int64)
        newgrp = np.ones(npairs, dtype=bool)
        newgrp[1:] = pt_sorted[1:] != pt_sorted[:-1]
        grp_first[newgrp] = np.nonzero(newgrp)[0]
        grp_first = np.maximum.accumulate(grp_first)
        rank = np.arange(npairs, dtype=np.int64) - grp_first
        upd_idx = task_ptr[pt_sorted] + rank
        t_src[upd_idx] = pair_d[order]
        t_dst[upd_idx] = pt_sorted
        t_rmap[upd_idx] = rmap[order]
    fact_idx = task_ptr[1:] - 1
    t_type[fact_idx] = 1
    t_src[fact_idx] = np.arange(S)
    t_dst[fact_idx] = np.arange(S)

    c0, below_ptr, below_flat = pre.c0, pre.below_ptr, pre.below_flat
    w, rows, off = pre.w, pre.rows, pre.off
    asm_src, asm_dst, csc_gather = pre.asm_src, pre.asm_dst, pre.csc_gather

    # int32 storage throughout (panel_limit < 2^29 and map widths < 2^31
    # guarantee the ranges): the plan arrays embed as HLO constants when
    # the numeric/solve are traced, so width matters for the remote
    # compile payload (asm/csc maps are O(lnz)).
    return SuperPlan(
        n=n,
        S=S,
        W=W,
        MR=MR,
        P=P,
        c0=c0.astype(np.int32),
        w=w.astype(np.int32),
        rows=rows.astype(np.int32),
        off=off[:-1].astype(np.int32),
        asm_src=asm_src.astype(np.int32),
        asm_dst=asm_dst.astype(np.int32),
        t_type=t_type,
        t_src=t_src.astype(np.int32),
        t_dst=t_dst.astype(np.int32),
        t_rmap=np.asarray(t_rmap, dtype=np.int32),
        csc_gather=csc_gather.astype(np.int32),
        below_ptr=below_ptr,
        below_flat=np.concatenate(
            [below_flat, np.full(MR, n, dtype=np.int64)]
        ).astype(np.int32),
    )


def _panel_kernels(off_a, c0_a, w_a, rows_a, W: int, MR: int, dtype):
    """The two per-task device kernels shared by the left-looking
    (``numeric_supernodal``) and multifrontal-lite
    (``ldl_mf.numeric_multifrontal``) numerics: a pairwise Schur
    update and a dense panel factorization."""
    PB = MR - W
    colsW = jnp.arange(W, dtype=INDEX_DTYPE)

    def _update(Lp, dext, src, dst, rmap):
        # Schur update: target[r, c] -= sum_k Ld[rmap[r], k] * D[k] *
        # Ld[colmap[c], k] — one (MR, W) @ (W, W) matmul, no scatter.
        Pd = lax.dynamic_slice(Lp, (off_a[src],), (MR * W,)).reshape(MR, W)
        Pdpad = jnp.concatenate([Pd, jnp.zeros((1, W), dtype)], axis=0)
        Dd = lax.dynamic_slice(dext, (c0_a[src],), (W,))
        Dd = jnp.where(colsW < w_a[src], Dd, 0)
        B = Pdpad[rmap, :]  # (MR, W) rows shared with the target
        colmap = jnp.where(colsW < w_a[dst], rmap[:W], MR)
        G = Pdpad[colmap, :] * Dd[None, :]  # (W, W)
        U = B @ G.T  # (MR, W), already in target row/col slots
        Pt = lax.dynamic_slice(Lp, (off_a[dst],), (MR * W,)).reshape(MR, W)
        Lp = lax.dynamic_update_slice(
            Lp, (Pt - U).reshape(-1), (off_a[dst],)
        )
        return Lp, dext

    def _factor(Lp, dext, s):
        off_s = off_a[s]
        ws = w_a[s]
        rs = rows_a[s]
        panel = lax.dynamic_slice(Lp, (off_s,), (MR * W,)).reshape(MR, W)
        live_col = colsW < ws
        top = jnp.where(live_col[None, :], panel[:W, :], 0)
        top = top.at[colsW, colsW].set(
            jnp.where(live_col, jnp.diagonal(top), 1)
        )
        # blocked right-looking factor of the W×W top (shared with the
        # level-batched numeric; the old rank-1 fori_loop rewrote the
        # full block W times — see blocked_ldl_top's docstring for the
        # masked-column NaN guard this preserves)
        from .ldl_batched import blocked_ldl_top

        top, dvec = blocked_ldl_top(top[None], live_col[None])
        top = top[0]
        dvec = dvec[0]
        if PB:
            bottom = panel[W:, :]
            xt = lax.linalg.triangular_solve(
                top,
                bottom,
                left_side=False,
                lower=True,
                transpose_a=True,
                unit_diagonal=True,
            )
            bottom = xt / dvec[None, :]
            full = jnp.concatenate([top, bottom], axis=0)
        else:
            full = top
        rr = jnp.arange(MR, dtype=INDEX_DTYPE)[:, None]
        vals = jnp.where(
            rr < rs, jnp.where(live_col[None, :], full, 0), panel
        )
        Lp = lax.dynamic_update_slice(Lp, vals.reshape(-1), (off_s,))
        dext = lax.dynamic_update_slice(dext, dvec, (c0_a[s],))
        return Lp, dext

    return _update, _factor


def numeric_supernodal(plan: SuperPlan, data: jax.Array):
    """Jittable supernodal numeric: returns ``(l_data, d)`` in the same
    CSC-slot layout as the row-scan numeric (``ldl._numeric_device``).

    Zero/negative-pivot poisoning follows the row-scan contract: XLA
    cannot raise, so singular inputs surface as NaN/Inf in the outputs.
    """
    n, S, W, MR, P = plan.n, plan.S, plan.W, plan.MR, plan.P
    dtype = data.dtype
    if not jnp.issubdtype(dtype, jnp.floating):
        dtype = jnp.result_type(dtype, jnp.float32)
        data = data.astype(dtype)

    off_a = jnp.asarray(plan.off, dtype=INDEX_DTYPE)
    c0_a = jnp.asarray(plan.c0, dtype=INDEX_DTYPE)
    w_a = jnp.asarray(plan.w, dtype=INDEX_DTYPE)
    rows_a = jnp.asarray(plan.rows, dtype=INDEX_DTYPE)

    # assemble A's lower triangle into the zero-initialized panels
    Lp0 = (
        jnp.zeros((P,), dtype)
        .at[jnp.asarray(plan.asm_dst, dtype=INDEX_DTYPE)]
        .add(data[jnp.asarray(plan.asm_src, dtype=INDEX_DTYPE)])
    )
    dext0 = jnp.zeros((n + W,), dtype)

    _update, _factor = _panel_kernels(
        off_a, c0_a, w_a, rows_a, W, MR, dtype
    )

    def body(carry, xs):
        Lp, dext = carry
        ttype, src, dst, rmap = xs
        Lp, dext = lax.cond(
            ttype == 1,
            lambda L, de: _factor(L, de, src),
            lambda L, de: _update(L, de, src, dst, rmap),
            Lp,
            dext,
        )
        return (Lp, dext), None

    xs = (
        jnp.asarray(plan.t_type),
        jnp.asarray(plan.t_src, dtype=INDEX_DTYPE),
        jnp.asarray(plan.t_dst, dtype=INDEX_DTYPE),
        jnp.asarray(plan.t_rmap, dtype=INDEX_DTYPE),
    )
    (Lp, dext), _ = lax.scan(body, (Lp0, dext0), xs)
    lx = Lp[jnp.asarray(plan.csc_gather, dtype=INDEX_DTYPE)]
    return lx, dext[:n]


def panels_from_csc(plan: SuperPlan, l_data: jax.Array) -> jax.Array:
    """Rebuild the flat panel array from CSC-slot factor values (one
    scatter; padded positions stay 0, which the solves rely on)."""
    return (
        jnp.zeros((plan.P,), l_data.dtype)
        .at[jnp.asarray(plan.csc_gather, dtype=INDEX_DTYPE)]
        .set(l_data)
    )


def solve_supernodal(
    plan: SuperPlan, panels: jax.Array, d: jax.Array, b: jax.Array
) -> jax.Array:
    """x = (L D Lᵀ)⁻¹ b on the supernodal panels (jittable).

    The level-scheduled simplicial solve's per-row window is the max
    L-row nnz — which reaches the trailing dense-block width on
    fill-reducing orderings, making it O(n·√n) gathers.  The panel
    solve is one scan over supernodes: a (W,W) in-block triangular
    solve plus an (MR,W) panel matvec per step, with the below-row
    coupling as one MR-wide gather/scatter — O(lnz) total traffic.
    Callers apply the fill-reducing permutation outside (as in
    ``LdlNumeric.solve``).
    """
    n, S, W, MR = plan.n, plan.S, plan.W, plan.MR
    dtype = panels.dtype
    colsW = jnp.arange(W, dtype=INDEX_DTYPE)
    rowsMR = jnp.arange(MR, dtype=INDEX_DTYPE)
    off_a = jnp.asarray(plan.off, dtype=INDEX_DTYPE)
    c0_a = jnp.asarray(plan.c0, dtype=INDEX_DTYPE)
    w_a = jnp.asarray(plan.w, dtype=INDEX_DTYPE)
    rows_a = jnp.asarray(plan.rows, dtype=INDEX_DTYPE)
    bptr_a = jnp.asarray(plan.below_ptr, dtype=INDEX_DTYPE)
    bflat = jnp.asarray(plan.below_flat, dtype=INDEX_DTYPE)
    eyeW = jnp.eye(W, dtype=dtype)
    zerosW = jnp.zeros((W,), dtype)

    def load(s):
        off_s = off_a[s]
        ws = w_a[s]
        rs = rows_a[s]
        panel = lax.dynamic_slice(panels, (off_s,), (MR * W,)).reshape(
            MR, W
        )
        live_col = colsW < ws
        live_row = rowsMR < rs
        panel = jnp.where(live_row[:, None] & live_col[None, :], panel, 0)
        # in-block W×W system: identity outside the live w×w corner
        blk = jnp.where(
            (colsW[:, None] < ws) & live_col[None, :],
            panel[:W, :],
            eyeW,
        )
        # below-row ids for panel slots ws.. (static MR window)
        ids = lax.dynamic_slice(bflat, (bptr_a[s],), (MR,))
        return panel, blk, ids, ws

    def fwd_step(y, s):
        panel, blk, ids, ws = load(s)
        c0 = c0_a[s]
        yd = lax.dynamic_slice(y, (c0,), (W,))
        sol = lax.linalg.triangular_solve(
            blk, yd[:, None], left_side=True, lower=True,
            unit_diagonal=True,
        )[:, 0]
        yd_new = jnp.where(colsW < ws, sol, yd)
        y = lax.dynamic_update_slice(y, yd_new, (c0,))
        # below-row coupling: y[r] -= Σ_j L[r, c0+j] · sol[j]
        u = panel @ jnp.where(colsW < ws, sol, 0)
        u_shift = lax.dynamic_slice(
            jnp.concatenate([u, jnp.zeros((W,), dtype)]), (ws,), (MR,)
        )
        y = y.at[ids].add(-u_shift, mode="drop")
        return y, None

    def bwd_step(x, s):
        panel, blk, ids, ws = load(s)
        c0 = c0_a[s]
        xg = x[jnp.minimum(ids, n - 1)]
        xg = jnp.where(ids < n, xg, 0)
        # shift below values into panel slots ws.. then contract
        x_ext = lax.dynamic_slice(
            jnp.concatenate([jnp.zeros((W,), dtype), xg]),
            (W - ws,),
            (MR,),
        )
        contrib = x_ext @ panel  # (W,)
        xd = lax.dynamic_slice(x, (c0,), (W,))
        sol = lax.linalg.triangular_solve(
            blk, (xd - contrib)[:, None], left_side=True, lower=True,
            transpose_a=True, unit_diagonal=True,
        )[:, 0]
        xd_new = jnp.where(colsW < ws, sol, xd)
        return lax.dynamic_update_slice(x, xd_new, (c0,)), None

    b = jnp.asarray(b)
    # W-slack so the per-supernode dynamic slices never clamp
    y = jnp.concatenate([b.astype(dtype), zerosW])
    svec = jnp.arange(S, dtype=INDEX_DTYPE)
    y, _ = lax.scan(fwd_step, y, svec)
    y = y.at[:n].set(y[:n] / d)
    x, _ = lax.scan(bwd_step, y, svec, reverse=True)
    return x[:n]
