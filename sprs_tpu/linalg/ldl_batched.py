"""Level-batched LDLᵀ numeric — vmapped rounds over independent tasks.

The supernodal (``ldl_super``) and multifrontal-lite (``ldl_mf``)
numerics run ONE task per ``lax.scan`` step; at 65k rows (camd) that is
a 34k-step sequential scan whose per-step latency (~90 µs on the
tunnel chip), not the per-task kernel, dominates — factor 3.23 s where
the useful HBM traffic is ~0.1 s (BASELINE.md round-2 table).

This module batches the SAME tasks into *rounds* of provably
independent work and runs one scan step per round:

* **Rounds** come from longest-path scheduling on the task DAG.  Each
  round has three phase families, applied in order: pair updates,
  front aggregates, panel factors.  A pair update d→t needs factor(d)
  in a STRICTLY earlier round; a factor of s needs every write into s
  in the same round or earlier (phase order makes same-round legal);
  a front aggregate needs its member factors strictly earlier and
  must not be later than any target's factor round.  Width caps
  (``bu``, ``bf``, ``ba``) split over-wide levels across consecutive
  rounds — always legal because updates commute and factors only need
  *all* their inputs, not a particular round.
* **Batched kernels**: per-task panel access becomes aligned row
  gathers on the (len/W, W) 2-D panel view plus contiguous window
  gathers; the Schur products become batched (B, MR_c, W) × (B, W, W)
  MXU matmuls; the factor's W-step inner loop runs once per ROUND on
  (B, W, W) tiles instead of once per task.  Update/factor lanes are
  split into pow2-ladder ROW CLASSES (round 5) so padding pays per
  class, not at the global MR.
* **Round-batched solves** (round 5): the factor rounds double as a
  legal level schedule for the triangular sweeps —
  :func:`solve_batched` runs both solve directions in R scan steps
  instead of S.
* **Commutative writes**: every panel write is a *delta* accumulated
  by ``lax.scatter_add`` over contiguous windows
  (``update_window_dims``), so same-round writes into one panel are
  order-free: updates already add, and the factor's write is recast as
  ``(new − old)`` masked to its live rows (the masked delta is exactly
  0 on overhang rows, so overlapping windows of adjacent panels cannot
  clobber each other the way a batched SET would).  The D diagonal
  likewise switches from the sequential full-window overwrite to a
  live-masked add — identical for every consumer, which all mask to
  live columns.

Sentinel lanes (round padding) point their windows at a dedicated
zero-scratch region past the panel array and contribute exact-zero
deltas, so the scratch stays 0.0 forever and doubles as the
structural-zero source for the aggregate tables' out-of-pattern
gathers; aggregate *write* sentinels are remapped to a separate dump
slot so they cannot pollute it.

Exactness: the per-lane math is bit-identical to the sequential
kernels; only the SUMMATION ORDER of commutative adds changes (same
contract as ``ldl_mf`` — golden bit parity lives with the host
numeric).

Reference capability bar this accelerates:
/root/reference/sprs-ldl/src/lib.rs:502-593 (up-looking numeric with
same-pattern ``update`` refactorization).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..formats.util import INDEX_DTYPE


def blocked_ldl_top(top, live_col, *, nbf: int = 8):
    """Blocked right-looking LDL of batched (B, W, W) top blocks.

    The rank-1 formulation rewrites the FULL block W times inside a
    fori_loop (~2 GB of HBM traffic per 64-lane round at W=128,
    measured ~10 ms/round on the tunnel chip); here pivots advance
    through ``nbf``-wide strips (cheap rank-1 mini-steps touch only a
    (B, W, nbf) strip) and each strip pushes ONE rank-``nbf`` trailing
    update — an MXU einsum.  Exact up to reassociation of the trailing
    sums.  Inputs follow ``_panel_kernels._factor``'s conventions:
    masked (non-live) columns are e_j with unit pivots and NEVER
    receive updates — a masked pivot drifting to 0 would spray
    inf·0 = NaN into real columns.

    Returns ``(factored_top, dvec)`` with column j replaced by its
    unit-lower lcol (zeros above the diagonal) and dvec the pivots
    (1 on masked columns).
    """
    nB, W, _ = top.shape
    dtype = top.dtype
    colsW = jnp.arange(W, dtype=jnp.int32)
    M = top
    dv = jnp.ones((nB, W), dtype)
    for kb in range(0, W, nbf):
        nb = min(nbf, W - kb)
        strip = M[:, :, kb : kb + nb]  # (B, W, nb)
        lcols = []
        rowvs = []
        for jj in range(nb):
            j = kb + jj
            colv = strip[:, :, jj]  # (B, W)
            dj = colv[:, j]
            lcol = jnp.where(colsW[None, :] > j, colv / dj[:, None], 0)
            lcol = lcol.at[:, j].set(1)
            rowv = jnp.where((colsW[None, :] > j) & live_col, colv, 0)
            strip = strip - lcol[:, :, None] * rowv[:, None, kb : kb + nb]
            stored = jnp.where(colsW[None, :] >= j, lcol, 0)
            strip = strip.at[:, :, jj].set(stored)
            dv = dv.at[:, j].set(dj)
            lcols.append(stored)
            rowvs.append(rowv)
        M = M.at[:, :, kb : kb + nb].set(strip)
        if kb + nb < W:
            Lb = jnp.stack(lcols, axis=2)  # (B, W, nb)
            Cb = jnp.stack(rowvs, axis=2)  # (B, W, nb)
            upd = jnp.einsum("brk,bck->brc", Lb, Cb[:, kb + nb :, :])
            M = M.at[:, :, kb + nb :].add(-upd)
    return M, dv


def _window_scatter_add(arr, starts, updates):
    """arr[starts[i] : starts[i]+L] += updates[i] for every lane i.

    ``arr`` (P,), ``starts`` (B,) int, ``updates`` (B, L).  Windows may
    overlap (adds commute).  Starts must be in bounds: callers
    guarantee starts+L <= len(arr).
    """
    dn = lax.ScatterDimensionNumbers(
        update_window_dims=(1,),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,),
    )
    return lax.scatter_add(
        arr,
        starts[:, None].astype(INDEX_DTYPE),
        updates.astype(arr.dtype),
        dn,
        indices_are_sorted=False,
        unique_indices=False,
        mode=lax.GatherScatterMode.CLIP,
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class RoundSchedule:
    """Host-built batched round schedule for a ``SuperPlan``/``MfPlan``.

    Registered as a pytree for the same reason the plans are: the
    per-round index arrays must ride through jit boundaries as device
    buffers, not HLO constants.

    Update and factor lanes are split into ROW CLASSES (round 5): the
    per-lane panel shape used to be the GLOBAL (MR, W) — at 1M rows
    MR=1800 while the median panel is a few hundred rows, so padding
    dominated the per-round gather/scatter volume.  Each class c
    processes its tasks at a (MR_c, W) shape (pow2-ladder sizes, exact
    by the same sentinel-row argument as the global shape: rows beyond
    the target's live rows carry exact-zero updates).
    """

    R: int  # rounds
    upd_mr: tuple  # per class: padded row count MR_c
    fac_mr: tuple
    # updates per class: supernode ids (sentinel S) + row into t_rmap
    upd_src: tuple  # per class (R, Bu_c)
    upd_dst: tuple
    upd_tix: tuple  # (sentinel row = all-MR)
    upd_cnt: tuple  # per class (R,)
    # factors per class: supernode ids (sentinel S)
    fac_s: tuple  # per class (R, Bf_c)
    fac_cnt: tuple
    # aggregates (MfPlan only): per bucket, slot ids (sentinel -1)
    agg_slots: tuple  # per bucket (R, Ba_b)
    agg_cnt: tuple  # per bucket (R,)

    @property
    def n_rounds(self) -> int:
        return self.R

    @property
    def Bu(self) -> int:  # diagnostic: total update lanes per round
        return sum(int(a.shape[1]) for a in self.upd_src)

    @property
    def Bf(self) -> int:
        return sum(int(a.shape[1]) for a in self.fac_s)

    def tree_flatten(self):
        leaves = (
            self.upd_src,
            self.upd_dst,
            self.upd_tix,
            self.upd_cnt,
            self.fac_s,
            self.fac_cnt,
            self.agg_slots,
            self.agg_cnt,
        )
        return leaves, (self.R, self.upd_mr, self.fac_mr)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        R, upd_mr, fac_mr = aux
        return cls(R, upd_mr, fac_mr, *leaves)


class _Packer:
    """First-fit capacity packer: ``place(e)`` returns the first round
    >= e with a free lane.  Backfilling matters: assigning
    ``max(cur_round, e)`` instead inflates dependents' earliest rounds
    transitively and collapses occupancy to a few percent (measured
    R=6202 vs the true ~hundreds at 65k rows).  ``jump[r]`` is a
    union-find-style pointer to the first possibly-free round >= r
    (path-halved on traversal), so placement is near-O(1) amortized."""

    def __init__(self, cap: int):
        self.cap = cap
        self.count: list = []
        self.jump: list = []

    def place(self, earliest: int) -> int:
        count, jump, cap = self.count, self.jump, self.cap
        if earliest >= len(count):
            count.extend(0 for _ in range(earliest + 1 - len(count)))
            jump.extend(range(len(jump), earliest + 1))
        r = earliest
        while True:
            nxt = jump[r]
            if nxt == r:
                if count[r] < cap:
                    break
                # full: extend and link past it
                if r + 1 >= len(count):
                    count.append(0)
                    jump.append(r + 1)
                jump[r] = r + 1
                r = r + 1
            else:
                # path halving
                if nxt < len(jump):
                    jump[r] = jump[nxt]
                r = nxt
                if r >= len(count):
                    count.extend(0 for _ in range(r + 1 - len(count)))
                    jump.extend(range(len(jump), r + 1))
        count[r] += 1
        if count[r] >= cap:
            if r + 1 >= len(count):
                count.append(0)
                jump.append(r + 1)
            jump[r] = r + 1
        return r

    @property
    def max_round(self) -> int:
        for r in range(len(self.count) - 1, -1, -1):
            if self.count[r]:
                return r
        return 0


def _table_owners(table: np.ndarray, off_bounds: np.ndarray, sent: int):
    """Per-slot unique owner supernodes of a (F_b, RFb, X) position
    table: returns (slot_ptr, owners_flat) CSR-style ragged lists."""
    nslot = table.shape[0]
    pos = table.reshape(nslot, -1).astype(np.int64)
    S = off_bounds.shape[0] - 1
    own = np.searchsorted(off_bounds, pos.ravel(), side="right") - 1
    own = own.reshape(nslot, -1)
    valid = pos != sent
    slot_id = np.broadcast_to(
        np.arange(nslot, dtype=np.int64)[:, None], pos.shape
    )
    key = np.unique(slot_id[valid] * np.int64(S + 1) + own[valid])
    slots = key // (S + 1)
    owners = key % (S + 1)
    ptr = np.zeros(nslot + 1, dtype=np.int64)
    np.add.at(ptr, slots + 1, 1)
    np.cumsum(ptr, out=ptr)
    return ptr, owners


def build_round_schedule(
    plan,
    *,
    bu: int = None,
    bf: int = None,
    ba=None,
    agg_lane_budget: int = 256 << 20,
    max_classes: int = 4,
) -> RoundSchedule:
    """Pack a plan's task stream into batched rounds (host-side).

    Works for both ``SuperPlan`` (types 0/1) and ``MfPlan`` (adds type
    2 aggregates).  The stream order is already topological, so one
    forward pass assigns rounds by longest path + capacity.

    Lane-width default is scale-adaptive (round-4 TPU geometry sweeps):
    at 65k rows (T=3.5k) width 128 beat 64 by 1.37x (fewer rounds
    amortize the per-round fixed cost at high occupancy) while 256
    regressed on padding-lane gather traffic; at 1M rows (T=58k) width
    128 measured slightly WORSE than 64 (occupancy drops to ~55% and
    the padded lanes' gather traffic dominates the now-small fixed
    cost).  Hence 128 for small task streams, 64 past 10k tasks.
    Unused lanes are trimmed to the max round occupancy either way.
    """
    if bu is None or bf is None:
        wide = np.asarray(plan.t_type).shape[0] < 10_000
        if bu is None:
            bu = 128 if wide else 64
        if bf is None:
            bf = 128 if wide else 64
    t_type = np.asarray(plan.t_type)
    t_src = np.asarray(plan.t_src, dtype=np.int64)
    t_dst = np.asarray(plan.t_dst, dtype=np.int64)
    T = t_type.shape[0]
    S = plan.S
    P = plan.P
    mem_tabs = getattr(plan, "mem_start", ())
    nb = len(mem_tabs)
    off_bounds = np.concatenate(
        [np.asarray(plan.off, dtype=np.int64), [np.int64(P)]]
    )

    # per-(bucket, slot) member/target supernode lists for aggregates —
    # owners recovered from the window START positions (a window never
    # crosses a panel with live lanes, so the start pins the owner)
    mem = [
        _table_owners(np.asarray(b), off_bounds, P) for b in mem_tabs
    ]
    tgt = [
        _table_owners(np.asarray(a), off_bounds, P)
        for a in getattr(plan, "tgt_start", ())
    ]

    # per-bucket aggregate lane width: the phase's round temporaries
    # (B, U, the column-gathered U windows and the masked update) scale
    # with RFb² and RFb·(NMb+2·NTb)·AW, so wide lanes on big-row
    # buckets blow HBM; budget-fit unless the caller pins ``ba``.
    AW = getattr(plan, "AW", 0)
    ba_list = []
    for b in mem_tabs:
        RFb, NMb = b.shape[1], b.shape[2]
        if isinstance(ba, int):
            ba_list.append(ba)
            continue
        NTb = getattr(plan, "tgt_start")[len(ba_list)].shape[2]
        lane_bytes = 4 * (
            RFb * RFb + RFb * (NMb + 2 * NTb) * AW + RFb * NMb * AW
        )
        ba_list.append(int(np.clip(agg_lane_budget // max(lane_bytes, 1), 1, 16)))

    # ---- row classes: pow2 ladder of padded panel heights -------------
    # per-lane shapes used to be the GLOBAL (MR, W); classes cut the
    # dominant padding volume (1M: MR=1800, median panel a few hundred
    # rows).  An update's gathered/scattered rows are indexed by TARGET
    # panel slots, so its class is rows[dst]; a factor's is rows[s].
    rows_arr = np.asarray(plan.rows, dtype=np.int64)
    W = plan.W
    MR = plan.MR
    sizes = []
    s_ = W
    while s_ < MR:
        sizes.append(s_)
        s_ *= 2
    sizes.append(MR)
    sizes = np.asarray(sorted(set(sizes)), dtype=np.int64)
    if max_classes is not None and sizes.shape[0] > max_classes:
        # merge the cheapest class upward until the count fits: removing
        # size s pads its tasks to the next size — pick min added volume
        while sizes.shape[0] > max_classes:
            counts = np.bincount(
                np.searchsorted(sizes, rows_arr), minlength=sizes.shape[0]
            )
            added = counts[:-1] * np.diff(sizes)
            drop = int(np.argmin(added))
            sizes = np.delete(sizes, drop)
    cls_of_sn = np.searchsorted(sizes, rows_arr)  # class per supernode
    nc = sizes.shape[0]

    fac_round = np.full(S, -1, dtype=np.int64)
    last_write = np.zeros(S, dtype=np.int64)
    pk_u = [_Packer(bu) for _ in range(nc)]
    pk_f = [_Packer(bf) for _ in range(nc)]
    pk_a = [_Packer(ba_list[bi]) for bi in range(nb)]

    # the all-MR sentinel rmap row: any factor task's row (never filled)
    fac_rows = np.nonzero(t_type == 1)[0]
    sent_tix = int(fac_rows[0]) if fac_rows.size else 0

    u_r = [[] for _ in range(nc)]
    u_src = [[] for _ in range(nc)]
    u_dst = [[] for _ in range(nc)]
    u_tix = [[] for _ in range(nc)]
    f_r = [[] for _ in range(nc)]
    f_s = [[] for _ in range(nc)]
    a_r = [[] for _ in range(nb)]
    a_slot = [[] for _ in range(nb)]

    for i in range(T):
        tt = int(t_type[i])
        if tt == 0:
            src = int(t_src[i])
            dst = int(t_dst[i])
            c = int(cls_of_sn[dst])
            r = pk_u[c].place(int(fac_round[src]) + 1)
            if r > last_write[dst]:
                last_write[dst] = r
            u_r[c].append(r)
            u_src[c].append(src)
            u_dst[c].append(dst)
            u_tix[c].append(i)
        elif tt == 1:
            s = int(t_src[i])
            c = int(cls_of_sn[s])
            r = pk_f[c].place(int(last_write[s]))
            fac_round[s] = r
            f_r[c].append(r)
            f_s[c].append(s)
        else:
            bi = int(t_src[i])
            slot = int(t_dst[i])
            mptr, mown = mem[bi]
            members = mown[mptr[slot] : mptr[slot + 1]]
            e = 1 + (int(fac_round[members].max()) if members.size else 0)
            r = pk_a[bi].place(e)
            tptr, town = tgt[bi]
            targets = town[tptr[slot] : tptr[slot + 1]]
            if targets.size:
                np.maximum.at(last_write, targets, r)
            a_r[bi].append(r)
            a_slot[bi].append(slot)

    R = 1 + max(
        [max(rr) for rr in u_r if rr]
        + [max(rr) for rr in f_r if rr]
        + [max(rr) for rr in a_r if rr]
        + [0]
    )

    def pack(rounds, cols, width, fill):
        """(R, width) lane table + (R,) counts from (round, value) lists."""
        out = [
            np.full((R, width), f, dtype=np.int64) for f in fill
        ]
        cnt = np.zeros(R, dtype=np.int32)
        for j, r in enumerate(rounds):
            k = cnt[r]
            for o, colv in zip(out, cols):
                o[r, k] = colv[j]
            cnt[r] = k + 1
        w_eff = max(int(cnt.max()), 1)
        return [o[:, :w_eff].astype(np.int32) for o in out], cnt

    upd_src, upd_dst, upd_tix, upd_cnt = [], [], [], []
    for c in range(nc):
        (a1, a2, a3), cn = pack(
            u_r[c], (u_src[c], u_dst[c], u_tix[c]), bu, (S, S, sent_tix)
        )
        upd_src.append(a1)
        upd_dst.append(a2)
        upd_tix.append(a3)
        upd_cnt.append(cn)
    fac_s, fac_cnt = [], []
    for c in range(nc):
        (a1,), cn = pack(f_r[c], (f_s[c],), bf, (S,))
        fac_s.append(a1)
        fac_cnt.append(cn)
    agg_slots, agg_cnt = [], []
    for bi in range(nb):
        (a1,), cn = pack(a_r[bi], (a_slot[bi],), ba_list[bi], (-1,))
        agg_slots.append(a1)
        agg_cnt.append(cn)

    return RoundSchedule(
        R=R,
        upd_mr=tuple(int(s) for s in sizes),
        fac_mr=tuple(int(s) for s in sizes),
        upd_src=tuple(upd_src),
        upd_dst=tuple(upd_dst),
        upd_tix=tuple(upd_tix),
        upd_cnt=tuple(upd_cnt),
        fac_s=tuple(fac_s),
        fac_cnt=tuple(fac_cnt),
        agg_slots=tuple(agg_slots),
        agg_cnt=tuple(agg_cnt),
    )


def numeric_batched(
    plan, sched: RoundSchedule, data: jax.Array, *, use_cond: bool = None
):
    """Jittable level-batched numeric: same ``(l_data, d)`` CSC-slot
    contract as ``numeric_supernodal``/``numeric_multifrontal`` (NaN
    poisoning on singular inputs — XLA cannot raise).

    ``use_cond`` keeps the ``lax.cond`` phase guards.  Default (None)
    is plan-adaptive, from the round-4 TPU phase diagnostics measured
    within single processes:

    * **SuperPlan (no aggregate buckets): guards OFF.** full ≈
      cond-guarded ≈ all-disabled (~6 ms/round at 65k) — the cost is
      the phases' own gather/scatter traffic either way, and the
      no-cond path is simpler.
    * **MfPlan (aggregate buckets): guards ON (1.64x).** Each bucket
      is an extra phase per round and most are empty most rounds;
      unconditional execution pays every bucket's window gathers every
      round (full 2.31 s no-cond vs 1.41 s guarded at 65k, measured on
      the round-4 per-element tables), so skipping empty buckets beats
      the guards' carry-copy overhead.

    Every phase is sentinel-masked (exact-zero deltas), so both modes
    are exact; only commutative-add order differs."""
    if use_cond is None:
        use_cond = len(getattr(plan, "mem_start", ())) > 0
    n, S, W, MR, P = plan.n, plan.S, plan.W, plan.MR, plan.P
    MRW = MR * W
    dtype = data.dtype
    if not jnp.issubdtype(dtype, jnp.floating):
        dtype = jnp.result_type(dtype, jnp.float32)
        data = data.astype(dtype)
    nb = len(getattr(plan, "mem_start", ()))

    # sentinel-extended geometry: supernode S reads/writes the
    # zero-scratch window [P, P+MRW) with exact-zero deltas
    off_e = jnp.concatenate(
        [
            jnp.asarray(plan.off, INDEX_DTYPE),
            jnp.asarray([P], INDEX_DTYPE),
        ]
    )
    c0_e = jnp.concatenate(
        [jnp.asarray(plan.c0, INDEX_DTYPE), jnp.asarray([n], INDEX_DTYPE)]
    )
    w_e = jnp.concatenate(
        [jnp.asarray(plan.w, INDEX_DTYPE), jnp.asarray([0], INDEX_DTYPE)]
    )
    rows_e = jnp.concatenate(
        [jnp.asarray(plan.rows, INDEX_DTYPE), jnp.asarray([0], INDEX_DTYPE)]
    )
    t_rmap = jnp.asarray(plan.t_rmap, dtype=INDEX_DTYPE)

    # layout: [0, P) panels | [P, P+MRW) zero-scratch (gather sentinel
    # + masked-zero-add sink for the aggregate windows); total length
    # is a multiple of W, which the aligned aggregate row ops require
    Lp0 = (
        jnp.zeros((P + MRW,), dtype)
        .at[jnp.asarray(plan.asm_dst, dtype=INDEX_DTYPE)]
        .add(data[jnp.asarray(plan.asm_src, dtype=INDEX_DTYPE)])
    )
    dext0 = jnp.zeros((n + W,), dtype)

    colsW = jnp.arange(W, dtype=INDEX_DTYPE)

    # ---- batched pair update (one instance per row class) --------------
    def _make_upd_phase(mr_c):
        def _upd_phase(Lp, dext, src, dst, tix):
            # Panel offsets are W-aligned, so the rmap-selected
            # descendant rows gather DIRECTLY from the (len/W, W) 2-D
            # row view — round 4 materialized the full (Bu, MR, W)
            # panel and re-read it through two take_along_axis passes
            # (~1.5x the traffic and a per-element reorder); the
            # aligned row gather is the fast primitive
            # (results_r5/window_micro.json).  Sentinel rows
            # (rmap == MR) land on the next panel's first rows — real
            # data, masked to exact zero below.  The class height mr_c
            # covers the TARGET's live rows (class = rows[dst]); U rows
            # beyond them are exact zeros, so the mr_c*W scatter window
            # is complete and overhang-safe like the global one.
            Lp2 = Lp.reshape(-1, W)
            base = off_e[src] // W  # (Bu_c,)
            Dd = jax.vmap(
                lambda c: lax.dynamic_slice(dext, (c,), (W,))
            )(c0_e[src])
            Dd = jnp.where(colsW[None, :] < w_e[src][:, None], Dd, 0)
            rmap = t_rmap[tix][:, :mr_c]  # sentinel row index = MR
            B = jnp.where(
                (rmap < MR)[:, :, None], Lp2[base[:, None] + rmap], 0
            )
            colmap = jnp.where(
                colsW[None, :] < w_e[dst][:, None], rmap[:, :W], MR
            )
            G = jnp.where(
                (colmap < MR)[:, :, None], Lp2[base[:, None] + colmap], 0
            )
            G = G * Dd[:, None, :]  # (Bu_c, W, W)
            U = jnp.einsum("bik,bjk->bij", B, G)  # (Bu_c, mr_c, W)
            return (
                _window_scatter_add(
                    Lp, off_e[dst], -U.reshape(-1, mr_c * W)
                ),
                dext,
            )

        return _upd_phase

    # ---- batched front aggregate (per bucket): window-granular B
    # gather + MXU Schur + window scatter (ldl_mf.make_agg_phase); the
    # zero-scratch region [P, P+MRW) doubles as the gather sentinel and
    # absorbs the masked zero-adds of dead lanes/window overhang.
    from .ldl_mf import make_agg_phase

    agg_phases = [make_agg_phase(plan, bi) for bi in range(nb)]

    def _make_fac_phase(mr_c):
        rowsc = jnp.arange(mr_c, dtype=INDEX_DTYPE)
        pb_c = mr_c - W

        def _fac_phase(Lp, dext, s):
            panel = jax.vmap(
                lambda o: lax.dynamic_slice(Lp, (o,), (mr_c * W,))
            )(off_e[s]).reshape(-1, mr_c, W)
            ws = w_e[s]  # (Bf_c,)
            rs = rows_e[s]
            live_col = colsW[None, :] < ws[:, None]  # (Bf_c, W)
            top = jnp.where(live_col[:, None, :], panel[:, :W, :], 0)
            diag = jnp.einsum("bii->bi", top)
            top = top.at[:, colsW, colsW].set(
                jnp.where(live_col, diag, 1)
            )
            top, dvec = blocked_ldl_top(top, live_col)
            if pb_c:
                bottom = panel[:, W:, :]
                xt = lax.linalg.triangular_solve(
                    top,
                    bottom,
                    left_side=False,
                    lower=True,
                    transpose_a=True,
                    unit_diagonal=True,
                )
                bottom = xt / dvec[:, None, :]
                full = jnp.concatenate([top, bottom], axis=1)
            else:
                full = top
            vals = jnp.where(
                rowsc[None, :, None] < rs[:, None, None],
                jnp.where(live_col[:, None, :], full, 0),
                panel,
            )
            delta = vals - panel  # exactly 0 on overhang/masked cols
            Lp = _window_scatter_add(
                Lp, off_e[s], delta.reshape(-1, mr_c * W)
            )
            dcontrib = jnp.where(live_col, dvec, 0)
            dext = _window_scatter_add(dext, c0_e[s], dcontrib)
            return Lp, dext

        return _fac_phase

    upd_phases = [_make_upd_phase(m) for m in sched.upd_mr]
    fac_phases = [_make_fac_phase(m) for m in sched.fac_mr]
    ncls = len(sched.upd_mr)

    def body(carry, xs):
        Lp, dext = carry
        ups, aggs, facs = xs

        def guarded(cnt, fn, Lp, dext):
            if use_cond:
                return lax.cond(
                    cnt > 0, fn, lambda L, de: (L, de), Lp, dext
                )
            return fn(Lp, dext)

        for c in range(ncls):
            u_src, u_dst, u_tix, u_cnt = ups[c]
            Lp, dext = guarded(
                u_cnt,
                lambda L, de, a=u_src, b=u_dst, t=u_tix, cc=c: upd_phases[
                    cc
                ](L, de, a, b, t),
                Lp,
                dext,
            )
        for bi in range(nb):
            slots, cnt = aggs[bi]
            Lp, dext = guarded(
                cnt,
                lambda L, de, sl=slots, b=bi: agg_phases[b](L, de, sl),
                Lp,
                dext,
            )
        for c in range(ncls):
            f_s, f_cnt = facs[c]
            Lp, dext = guarded(
                f_cnt,
                lambda L, de, a=f_s, cc=c: fac_phases[cc](L, de, a),
                Lp,
                dext,
            )
        return (Lp, dext), None

    xs_upd = tuple(
        (
            jnp.asarray(sched.upd_src[c], INDEX_DTYPE),
            jnp.asarray(sched.upd_dst[c], INDEX_DTYPE),
            jnp.asarray(sched.upd_tix[c], INDEX_DTYPE),
            jnp.asarray(sched.upd_cnt[c]),
        )
        for c in range(ncls)
    )
    xs_fac = tuple(
        (
            jnp.asarray(sched.fac_s[c], INDEX_DTYPE),
            jnp.asarray(sched.fac_cnt[c]),
        )
        for c in range(ncls)
    )
    xs_agg = tuple(
        (jnp.asarray(sched.agg_slots[bi], INDEX_DTYPE),
         jnp.asarray(sched.agg_cnt[bi]))
        for bi in range(nb)
    )
    (Lp, dext), _ = lax.scan(
        body, (Lp0, dext0), (xs_upd, xs_agg, xs_fac)
    )
    lx = Lp[jnp.asarray(plan.csc_gather, dtype=INDEX_DTYPE)]
    return lx, dext[:n]


# Measured crossover for the round-batched solve (v5e tunnel,
# same-process A/B, results_r5/ldl{256,1024}_mf_solveb.json):
#   65k nd  (S=968,  R=23):  batched 229 ms vs sequential 66.8 ms (x0.29)
#   1M  nd  (S=15182,R=241): batched 1.34 s vs sequential 1.39 s (x1.04)
# Per-round cost is the same gather-traffic floor as the factor phases
# (~5-10 ms), so R rounds only beat S sequential steps (~70-90 us each)
# when S is large.  Auto-routing uses batched sweeps only past this S.
SOLVE_BATCHED_MIN_S = 8192


def solve_batched(
    plan, sched: RoundSchedule, panels: jax.Array, d: jax.Array, b: jax.Array
) -> jax.Array:
    """x = (L D Lᵀ)⁻¹ b with the sweeps ROUND-BATCHED (jittable).

    ``solve_supernodal`` scans one supernode per step — S=15182 steps
    at 1M rows (~1.4 s, pure step-latency).  The factor's round
    schedule is also a legal level schedule for the solve: a solve
    dependency d→s (a below row of d lands in s's columns) is exactly
    a factor-schedule edge, and every such edge has
    ``fac_round[d] < fac_round[s]`` (pair updates are placed after
    factor(d) and before factor(s); cross-front couplings ride an
    aggregate round between the two).  So the forward sweep runs the
    factor rounds' lanes batched per row class, and the backward sweep
    runs them in reverse; same-round lanes touch disjoint column
    ranges and their below couplings scatter-ADD (commutative), with
    column writes as live-masked deltas so window overhang is a no-op.

    Reference capability: the sequential up-looking solve,
    /root/reference/sprs-ldl/src/lib.rs:388-410, level-batched.
    """
    n, S, W, MR = plan.n, plan.S, plan.W, plan.MR
    dtype = panels.dtype
    colsW = jnp.arange(W, dtype=INDEX_DTYPE)
    eyeW = jnp.eye(W, dtype=dtype)

    off_e = jnp.concatenate(
        [jnp.asarray(plan.off, INDEX_DTYPE), jnp.asarray([plan.P], INDEX_DTYPE)]
    )
    c0_e = jnp.concatenate(
        [jnp.asarray(plan.c0, INDEX_DTYPE), jnp.asarray([n], INDEX_DTYPE)]
    )
    w_e = jnp.concatenate(
        [jnp.asarray(plan.w, INDEX_DTYPE), jnp.asarray([0], INDEX_DTYPE)]
    )
    rows_se = jnp.concatenate(
        [jnp.asarray(plan.rows, INDEX_DTYPE), jnp.asarray([0], INDEX_DTYPE)]
    )
    bptr_e = jnp.concatenate(
        [
            jnp.asarray(plan.below_ptr[:-1], INDEX_DTYPE),
            jnp.asarray(plan.below_ptr[-1:], INDEX_DTYPE),
            jnp.asarray(plan.below_ptr[-1:], INDEX_DTYPE),
        ]
    )
    bflat = jnp.asarray(plan.below_flat, INDEX_DTYPE)  # padded with n's

    # panels padded with a zero tail so sentinel lanes (s = S, off = P)
    # and mr_c windows read exact zeros
    pz = jnp.concatenate([panels, jnp.zeros((MR * W,), dtype)])

    def load(s, mr_c):
        panel = jax.vmap(
            lambda o: lax.dynamic_slice(pz, (o,), (mr_c * W,))
        )(off_e[s]).reshape(-1, mr_c, W)
        ws = w_e[s]
        live_col = colsW[None, :] < ws[:, None]
        # the mr_c*W window crosses into SUBSEQUENT panels (allocations
        # are rows_s*W each): rows at/after the supernode's own rows
        # hold the next panels' values and must be masked to exact 0 —
        # they feed the below coupling otherwise (the sequential
        # solve's live_row mask, ldl_super.solve_supernodal.load)
        rowsc = jnp.arange(mr_c, dtype=INDEX_DTYPE)
        panel = jnp.where(
            (rowsc[None, :, None] < rows_se[s][:, None, None])
            & live_col[:, None, :],
            panel,
            0,
        )
        blk = jnp.where(
            live_col[:, None, :] & (colsW[None, :, None] < ws[:, None, None]),
            panel[:, :W, :],
            eyeW[None],
        )
        ids = jax.vmap(
            lambda p: lax.dynamic_slice(bflat, (p,), (mr_c,))
        )(bptr_e[s])
        return panel, blk, ids, ws, live_col

    def make_fwd(mr_c):
        def fwd(y, s):
            panel, blk, ids, ws, live_col = load(s, mr_c)
            yd = jax.vmap(lambda c: lax.dynamic_slice(y, (c,), (W,)))(
                c0_e[s]
            )
            sol = lax.linalg.triangular_solve(
                blk, yd[:, :, None], left_side=True, lower=True,
                unit_diagonal=True,
            )[:, :, 0]
            delta = jnp.where(live_col, sol - yd, 0)
            y = _window_scatter_add(y, c0_e[s], delta)
            u = jnp.einsum(
                "brw,bw->br", panel, jnp.where(live_col, sol, 0)
            )
            # below slot k holds the value for panel slot ws + k
            u_shift = jax.vmap(
                lambda uv, w: lax.dynamic_slice(
                    jnp.concatenate([uv, jnp.zeros((W,), dtype)]), (w,),
                    (mr_c,),
                )
            )(u, ws)
            y = y.at[ids.reshape(-1)].add(
                -u_shift.reshape(-1), mode="drop"
            )
            return y

        return fwd

    def make_bwd(mr_c):
        def bwd(x, s):
            panel, blk, ids, ws, live_col = load(s, mr_c)
            xg = jnp.where(ids < n, x[jnp.minimum(ids, n - 1)], 0)
            # shift below values into panel slots ws.. then contract
            x_ext = jax.vmap(
                lambda xv, w: lax.dynamic_slice(
                    jnp.concatenate([jnp.zeros((W,), dtype), xv]),
                    (W - w,),
                    (mr_c,),
                )
            )(xg, ws)
            contrib = jnp.einsum("br,brw->bw", x_ext, panel)
            xd = jax.vmap(lambda c: lax.dynamic_slice(x, (c,), (W,)))(
                c0_e[s]
            )
            sol = lax.linalg.triangular_solve(
                blk, (xd - contrib)[:, :, None], left_side=True,
                lower=True, transpose_a=True, unit_diagonal=True,
            )[:, :, 0]
            delta = jnp.where(live_col, sol - xd, 0)
            return _window_scatter_add(x, c0_e[s], delta)

        return bwd

    ncls = len(sched.fac_mr)
    fwd_fns = [make_fwd(m) for m in sched.fac_mr]
    bwd_fns = [make_bwd(m) for m in sched.fac_mr]
    xs_fac = tuple(
        jnp.asarray(sched.fac_s[c], INDEX_DTYPE) for c in range(ncls)
    )

    b = jnp.asarray(b).astype(dtype)
    y0 = jnp.concatenate([b, jnp.zeros((W,), dtype)])

    def fwd_body(y, lanes):
        for c in range(ncls):
            y = fwd_fns[c](y, lanes[c])
        return y, None

    y, _ = lax.scan(fwd_body, y0, xs_fac)
    y = y.at[:n].set(y[:n] / d)

    def bwd_body(x, lanes):
        for c in range(ncls):
            x = bwd_fns[c](x, lanes[c])
        return x, None

    x, _ = lax.scan(bwd_body, y, xs_fac, reverse=True)
    return x[:n]
