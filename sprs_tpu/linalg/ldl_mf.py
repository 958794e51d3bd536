"""Multifrontal-lite LDLᵀ numeric — subtree-aggregated Schur updates.

Executes docs/MULTIFRONTAL_PLAN.md (round 5: window-granular tables).
The left-looking supernodal numeric (``ldl_super``) applies one
(MR, W)·(W, W) update per (descendant, target) PAIR; at 262k rows
(camd) that is T=141k tasks with a fixed (MR=800, W=128) shape
regardless of true overlap — the pair COUNT times the padded panel
shape is the scale wall, and the (T, MR) row-map table alone reaches
GBs at 10⁶ rows.

The multifrontal-lite schedule (classic multifrontal's extend-add,
shaped for XLA's static-shape world):

* The postordered supernode sequence is chunked into F contiguous
  *fronts* by a work budget.  ANY contiguous chunking is exact — the
  aggregation below sums true L values, so front boundaries are pure
  efficiency knobs (subtree alignment merely densifies intra-front
  overlap).
* Updates between supernodes of the SAME front use the existing
  per-pair schedule (pairs within a front are few and overlap-dense).
* A front's contribution to ALL later columns is ONE dense Schur
  product: with R_f the front's distinct below rows at-or-beyond the
  front's column end, B = L[R_f, cols_f] gathered from the factored
  panels, U = (B · D_f) Bᵀ — an (RF, CF)·(CF, RF) MXU matmul — is
  scatter-subtracted ONCE into the later panels.  Each (k, r, c)
  contribution with column c beyond the front rides the aggregate;
  with c inside the front it rides an intra pair — disjoint and
  complete, so the factorization is exact up to summation order.

**Window-granular access (round 5).** The round-4 phase diagnostics
proved per-ELEMENT random gathers/scatters run at the TPU's ~50M
lookups/s scatter-unit ceiling (~0.2 GB/s effective) while
window-granular access (``lax.dynamic_slice`` gathers,
``lax.scatter_add`` with ``update_window_dims``) streams at GB/s —
the old (F, RF, CF) per-element position tables made the aggregate
3.5x SLOWER than the pair schedule it replaces despite moving 3.5x
fewer elements.  All aggregate tables are therefore built at
AW-contiguous-window granularity (AW | W, so windows never cross a
panel row-window boundary):

* **B assembly**: member supernodes' columns are cut into AW-wide
  chunks; B[i, chunk m] is the AW-window at
  ``off[s_m] + slot(s_m, r_i)·W + k_m·AW`` (panel rows are W-strided,
  columns contiguous).  Misses (r_i ∉ struct(s_m)) point at the
  zero-scratch sentinel — panel positions past ``off[S]`` are never
  written, so the gathered window is exactly 0 and the Schur term
  vanishes.  Member-pad columns (beyond w_s) hold exact 0 in the
  panel (the factor kernel masks non-live columns), so padding adds
  exact zeros regardless of the D window contents.
* **U scatter**: the target rows r_j of U group by owner supernode t
  into runs of ascending columns; each run's column span is cut into
  AW chunks.  For (row i, chunk) the write is ONE AW-window at
  ``off[t] + rslot(t, r_i)·W + (cbase − c0[t])``; a column-map table
  places U entries at their in-window positions (span holes and the
  upper triangle are masked to exact-zero adds — adding 0 anywhere
  in-bounds is a no-op, which also makes window overhang past w_t
  safe).  A patternless (r_i, t) pair writes a zero window at the
  sentinel: U[i,j] ≠ 0 needs a front column k with L[r_i,k], L[r_j,k]
  both nonzero, and the fill property (r_i, r_j ∈ struct(k),
  r_i ≥ r_j > k ⇒ r_i ∈ struct(r_j) ⊆ panel-rows(t)) puts every such
  pair inside the pattern — so the masked-out values are exact zeros.

Table footprint shrinks by ~AW× versus the per-element tables (the
round-3 1M-row plan's 325M-element tables exceeded the 1<<28 guard;
the window tables fit), and every device access is a contiguous
AW-window.

Scatter volume is Σ_f |R_f|² ≈ true flops / W (plus AW-padding),
tunable by the front budget; the (T, MR) pair table shrinks to
intra-front pairs only.

Reference numeric this replaces at scale:
/root/reference/sprs-ldl/src/lib.rs:502-593 (up-looking row
recurrence); the front aggregation mirrors CHOLMOD/MUMPS-class
multifrontal assembly trees, re-shaped as static window maps.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..formats.util import INDEX_DTYPE
from .ldl_super import (
    SupernodalPlanError,
    _build_prelude,
    _ceil8,
    _pair_rmap,
    _panel_kernels,
)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class MfPlan:
    """Static multifrontal-lite schedule (host-precomputed).

    Field layout mirrors ``SuperPlan`` (so ``solve_supernodal`` works
    on either), plus the window-granular front-aggregation maps.  Task
    types: 0 = pair update, 1 = panel factor, 2 = front aggregate
    (``t_src`` is the bucket, ``t_dst`` the slot in the bucket).
    """

    n: int
    S: int
    W: int
    MR: int
    P: int
    F: int  # number of fronts
    RF: int  # max |R_f| over fronts (diagnostic)
    AW: int  # aggregate window width (divides W)
    c0: np.ndarray
    w: np.ndarray
    rows: np.ndarray
    off: np.ndarray
    asm_src: np.ndarray
    asm_dst: np.ndarray
    t_type: np.ndarray
    t_src: np.ndarray  # update: descendant; factor: snode; agg: bucket
    t_dst: np.ndarray  # update/factor: target snode; agg: slot in bucket
    t_rmap: np.ndarray  # (T, MR), sentinel MR
    csc_gather: np.ndarray
    below_ptr: np.ndarray
    below_flat: np.ndarray
    # fronts are BUCKETED by padded row count so the aggregation tables
    # pay per-bucket, not global, padding.  All tables are WINDOW
    # granular: one int32 entry per AW-wide contiguous window.
    mem_start: tuple  # per bucket: (F_b, RFb, NMb) B window starts, sent P
    memd_start: tuple  # per bucket: (F_b, NMb) D window starts, sent n
    tgt_start: tuple  # per bucket: (F_b, RFb, NTb) scatter starts, sent P
    tgt_lim: tuple  # per bucket: (F_b, RFb, NTb) valid lanes (0 = dead)
    colmap: tuple  # per bucket: (F_b, NTb, AW) U column index, sent RFb

    @property
    def n_tasks(self) -> int:
        return self.t_type.shape[0]

    @property
    def agg_table_elems(self) -> int:
        return sum(
            sum(t.size for t in tab)
            for tab in (
                self.mem_start,
                self.memd_start,
                self.tgt_start,
                self.tgt_lim,
                self.colmap,
            )
        )

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
            self.mem_start,
            self.memd_start,
            self.tgt_start,
            self.tgt_lim,
            self.colmap,
        )
        return leaves, (
            self.n,
            self.S,
            self.W,
            self.MR,
            self.P,
            self.F,
            self.RF,
            self.AW,
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        n, S, W, MR, P, F, RF, AW = aux
        return cls(n, S, W, MR, P, F, RF, AW, *leaves)


def _partition_fronts(pre, parent_col, max_front_cols: int, max_front_rows: int):
    """Subtree-aligned front partition.

    A front that is a COMPLETE subtree of the supernodal etree has
    R_f ⊆ below(root) (every member's below row beyond the subtree
    propagates along the etree path through the root — the classic
    multifrontal update-matrix containment), so subtree fronts keep
    both |R_f| and the intra-front pair count small: measured at the
    262k-row camd Laplacian, subtree cuts collapse intra pairs from
    141k (arbitrary greedy chunks: 71-89k) to ~5.4k.

    Partition: (1) maximal subtrees whose column count fits the budget
    become fronts; (2) the leftover supernodes (ancestors whose
    subtrees exceed the budget) are greedily merged into contiguous
    runs under the column budget and a distinct-below-row estimate —
    in postorder a parent directly follows its last child, so ancestor
    chains are contiguous and merge well.  Any contiguous partition is
    exact (module docstring); alignment is purely an efficiency knob.
    """
    S, n = pre.S, pre.n
    w, bp, bf, of = pre.w, pre.below_ptr, pre.below_flat, pre.of
    c1 = pre.c1
    # supernodal etree: parent(s) = owner of the column-etree parent of
    # s's last column (> s for non-roots; postorder makes subtrees
    # contiguous intervals [dmin[s], s])
    pc = parent_col[c1 - 1]
    par_sn = np.where(pc >= 0, of[np.clip(pc, 0, n - 1)], -1)
    cols_sub = w.astype(np.int64).copy()
    dmin = np.arange(S, dtype=np.int64)
    for s in range(S):
        p = par_sn[s]
        if p >= 0:
            cols_sub[p] += cols_sub[s]
            if dmin[s] < dmin[p]:
                dmin[p] = dmin[s]
    # a complete-subtree front has R_f ⊆ below(root), so the root's
    # below count is the exact row bound for the rows budget
    counts = np.diff(bp)
    fits = (cols_sub <= max_front_cols) & (counts <= max_front_rows)
    pfit = np.ones(S, dtype=bool)
    ok_par = par_sn >= 0
    pfit[ok_par] = ~fits[par_sn[ok_par]]
    is_root = fits & pfit
    starts = {int(dmin[r]): int(r) + 1 for r in np.nonzero(is_root)[0]}

    fb = [0]
    mark = np.full(n, -1, dtype=np.int64)
    cur_cols = 0
    cur_rows = 0
    fid = 0
    pos = 0
    while pos < S:
        if pos in starts:
            # complete-subtree front
            if fb[-1] != pos:
                fb.append(pos)
                fid += 1
            pos = starts[pos]
            fb.append(pos)
            fid += 1
            cur_cols = 0
            cur_rows = 0
            continue
        # leftover supernode: greedy merge into the running front
        seg = bf[bp[pos] : bp[pos + 1]]
        new = int(np.count_nonzero(mark[seg] != fid))
        if pos > fb[-1] and (
            cur_cols + int(w[pos]) > max_front_cols
            or cur_rows + new > max_front_rows
        ):
            fb.append(pos)
            fid += 1
            new = seg.shape[0]
            cur_cols = 0
            cur_rows = 0
        mark[seg] = fid
        cur_cols += int(w[pos])
        cur_rows += new
        pos += 1
    if fb[-1] != S:
        fb.append(S)
    return np.asarray(fb, dtype=np.int64)


def _pick_aw(W: int, agg_window: int) -> int:
    """Largest divisor of W that is <= agg_window (W is a multiple of
    8, so 8 always qualifies)."""
    for cand in (128, 64, 32, 16, 8):
        if cand <= agg_window and W % cand == 0:
            return cand
    return 8 if W % 8 == 0 else W


def build_mf_plan(
    sym,
    *,
    max_width: int = 128,
    max_zeros: int = 32,
    rel_zeros: float = 0.65,
    max_front_cols: int = 512,
    max_front_rows: int = 4096,
    panel_limit: int = 1 << 28,
    map_limit: int = 1 << 27,
    agg_limit: int = 1 << 28,
    align: str = "subtree",
    agg_window: int = 128,
    buckets: str = "fine",
) -> MfPlan:
    """Build the multifrontal-lite schedule from an ``LdlSymbolic``.

    ``agg_limit`` bounds the combined window-table elements;
    ``map_limit`` bounds the intra-front (T, MR) pair table as in
    ``build_super_plan``; ``align='subtree'`` cuts supernodes along
    complete etree subtrees (short batched critical path — see
    ``supernodes.amalgamate_subtree``); ``agg_window`` is the target
    aggregate window width (rounded down to a divisor of W).  Default
    128: the round-5 primitive sweep (results_r5/window_micro.json)
    measured aligned row gathers/scatters at 24/17 GB/s for w=128 vs
    3/1 GB/s at w=32 (sub-lane rows pay 4x padding + per-row
    overhead), which buys far more than narrow windows save in
    padding volume.
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
    of, c0, c1, w = pre.of, pre.c0, pre.c1, pre.w
    bp, bf = pre.below_ptr, pre.below_flat
    AW = _pick_aw(W, agg_window)

    fb = _partition_fronts(
        pre, np.asarray(sym.parent), max_front_cols, max_front_rows
    )
    F = fb.shape[0] - 1
    front_of = np.repeat(np.arange(F, dtype=np.int64), np.diff(fb))

    # --- intra-front pairs (cross-front updates ride the aggregates) ---
    keep = front_of[pre.pair_d] == front_of[pre.pair_t]
    pair_d = pre.pair_d[keep]
    pair_t = pre.pair_t[keep]
    npairs = pair_d.shape[0]

    # --- per-front distinct below rows at/beyond the front's column
    # end, vectorized: one global unique over (front, row) keys ---------
    f_colend = c1[fb[1:] - 1]
    owner_front = front_of[pre.below_owner]
    uk = np.unique(owner_front * np.int64(n) + bf)
    fid_u = uk // n
    row_u = uk % n
    keep_u = row_u >= f_colend[fid_u]
    fid_r = fid_u[keep_u]
    rows_cat = row_u[keep_u]  # per-front ascending (key order)
    nr_arr = np.bincount(fid_r, minlength=F)
    fptr = np.zeros(F + 1, dtype=np.int64)
    np.cumsum(nr_arr, out=fptr[1:])
    RF = int(nr_arr.max()) if F else 0

    # --- member column-chunks (AW-wide, per supernode, grouped by
    # front since supernodes are contiguous per front) -------------------
    nch_s = -(-w // AW)  # >= 1
    mc_s = np.repeat(np.arange(S, dtype=np.int64), nch_s)
    ch_ptr = np.zeros(S + 1, dtype=np.int64)
    np.cumsum(nch_s, out=ch_ptr[1:])
    mc_k = np.arange(mc_s.shape[0], dtype=np.int64) - ch_ptr[mc_s]
    mc_front = front_of[mc_s]
    nm_arr = np.bincount(mc_front, minlength=F)
    mptr = np.zeros(F + 1, dtype=np.int64)
    np.cumsum(nm_arr, out=mptr[1:])

    # --- target runs: rows_cat grouped by owner supernode.  Chunk
    # bases snap to the owner's c0[t] + k*AW grid so every scatter
    # window start (off[t] + rslot*W + k*AW) is AW-ALIGNED — the
    # numeric then runs gathers/scatters as row ops on an (len/AW, AW)
    # 2-D view, the TPU-native full-lane access pattern (costs at most
    # one extra chunk per run vs span-anchored bases). ------------------
    owner_r = of[rows_cat]
    nrows_tot = rows_cat.shape[0]
    if nrows_tot:
        new = np.ones(nrows_tot, dtype=bool)
        new[1:] = (owner_r[1:] != owner_r[:-1]) | (fid_r[1:] != fid_r[:-1])
        run_id = np.cumsum(new) - 1
        run_start = np.nonzero(new)[0]
        nruns = run_start.shape[0]
        run_len = np.diff(np.append(run_start, nrows_tot))
        run_fid = fid_r[run_start]
        run_t = owner_r[run_start]
        run_clo = rows_cat[run_start]
        run_chi = rows_cat[run_start + run_len - 1]
        run_k0 = (run_clo - c0[run_t]) // AW
        run_k1 = (run_chi - c0[run_t]) // AW
        nch_run = run_k1 - run_k0 + 1
        run_ch0 = np.zeros(nruns + 1, dtype=np.int64)
        np.cumsum(nch_run, out=run_ch0[1:])
        tc_run = np.repeat(np.arange(nruns, dtype=np.int64), nch_run)
        tc_k = np.arange(tc_run.shape[0], dtype=np.int64) - run_ch0[tc_run]
        tc_fid = run_fid[tc_run]
        tc_t = run_t[tc_run]
        tc_cbase = c0[run_t[tc_run]] + (run_k0[tc_run] + tc_k) * AW
        nt_arr = np.bincount(tc_fid, minlength=F)
    else:
        run_id = np.zeros(0, dtype=np.int64)
        run_ch0 = np.zeros(1, dtype=np.int64)
        run_k0 = np.zeros(0, dtype=np.int64)
        run_t = np.zeros(0, dtype=np.int64)
        tc_t = tc_cbase = np.zeros(0, dtype=np.int64)
        nt_arr = np.zeros(F, dtype=np.int64)
    tptr = np.zeros(F + 1, dtype=np.int64)
    np.cumsum(nt_arr, out=tptr[1:])

    # --- bucket fronts by padded row count.  'fine' (8/16/32, then
    # 64-steps) minimizes row padding; 'coarse' (4 pow-4 sizes) trades
    # padding volume for FEWER per-round phases — each bucket is one
    # phase in the level-batched numeric, and with the aligned row-op
    # aggregate the phase FIXED cost rivals its traffic. -----------------
    emit = nr_arr > 0
    if buckets == "coarse":
        bsz = np.where(
            nr_arr <= 64,
            64,
            np.where(
                nr_arr <= 512,
                512,
                np.where(nr_arr <= 2048, 2048, -(-nr_arr // 4096) * 4096),
            ),
        ).astype(np.int64)
    else:
        bsz = np.where(
            nr_arr <= 8,
            8,
            np.where(
                nr_arr <= 16,
                16,
                np.where(nr_arr <= 32, 32, -(-nr_arr // 64) * 64),
            ),
        ).astype(np.int64)
    bucket_sizes = sorted(set(int(b) for b in bsz[emit]))
    nb = len(bucket_sizes)
    fr_bucket = np.full(F, -1, dtype=np.int64)
    fr_slot = np.zeros(F, dtype=np.int64)
    NM_b = np.zeros(nb, dtype=np.int64)
    NT_b = np.zeros(nb, dtype=np.int64)
    fcnt = []
    for bi, b in enumerate(bucket_sizes):
        in_b = emit & (bsz == b)
        fr_bucket[in_b] = bi
        fr_slot[in_b] = np.arange(int(in_b.sum()))
        fcnt.append(int(in_b.sum()))
        NM_b[bi] = int(nm_arr[in_b].max()) if in_b.any() else 0
        NT_b[bi] = int(nt_arr[in_b].max()) if in_b.any() else 0
    total_tab = sum(
        fcnt[bi]
        * (
            bucket_sizes[bi] * NM_b[bi]  # mem_start
            + NM_b[bi]  # memd_start
            + 2 * bucket_sizes[bi] * NT_b[bi]  # tgt_start + tgt_lim
            + NT_b[bi] * AW  # colmap
        )
        for bi in range(nb)
    )
    if total_tab > agg_limit:
        raise SupernodalPlanError(
            f"aggregation tables ({total_tab} elements) exceed limit "
            f"{agg_limit}; raise the front budgets or the limit"
        )
    T = npairs + S + int(emit.sum())
    if T * MR > map_limit:
        raise SupernodalPlanError(
            f"row-map table {T}x{MR} exceeds limit {map_limit}"
        )
    rmap = _pair_rmap(pre, pair_d, pair_t)

    off64 = pre.off
    ef = np.nonzero(emit)[0]

    def _grid_queries(sizes_i, sizes_j):
        """Flat (front, i, j) enumeration over per-front grids."""
        g = sizes_i[ef] * sizes_j[ef]
        fid_q = np.repeat(ef, g)
        gptr = np.zeros(ef.shape[0] + 1, dtype=np.int64)
        np.cumsum(g, out=gptr[1:])
        q = np.arange(gptr[-1], dtype=np.int64) - np.repeat(gptr[:-1], g)
        i = q // sizes_j[fid_q]
        j = q % sizes_j[fid_q]
        return fid_q, i, j

    mem_start = [
        np.full((fcnt[bi], bucket_sizes[bi], NM_b[bi]), P, dtype=np.int32)
        for bi in range(nb)
    ]
    memd_start = [
        np.full((fcnt[bi], NM_b[bi]), n, dtype=np.int32) for bi in range(nb)
    ]
    tgt_start = [
        np.full((fcnt[bi], bucket_sizes[bi], NT_b[bi]), P, dtype=np.int32)
        for bi in range(nb)
    ]
    tgt_lim = [
        np.zeros((fcnt[bi], bucket_sizes[bi], NT_b[bi]), dtype=np.int32)
        for bi in range(nb)
    ]
    colmap = [
        np.full(
            (fcnt[bi], NT_b[bi], AW), bucket_sizes[bi], dtype=np.int32
        )
        for bi in range(nb)
    ]
    if ef.size:
        # ---- B window starts: (row i, member chunk m) ------------------
        # every R_f row is at/beyond the front's column end, hence at or
        # beyond every member's c1 — membership is below-structure only;
        # misses gather the zero-scratch sentinel (structural zeros).
        fid_q, i_q, m_q = _grid_queries(nr_arr, nm_arr)
        r_q = rows_cat[fptr[fid_q] + i_q]
        ch = mptr[fid_q] + m_q
        s_q = mc_s[ch]
        slot, found = pre.member_slot(s_q, r_q)
        pos = np.where(
            found, off64[s_q] + slot * W + mc_k[ch] * AW, P
        )
        for bi in range(nb):
            m = fr_bucket[fid_q] == bi
            RFb, NMb = bucket_sizes[bi], int(NM_b[bi])
            flat = mem_start[bi].reshape(-1)
            flat[
                fr_slot[fid_q[m]] * (RFb * NMb) + i_q[m] * NMb + m_q[m]
            ] = pos[m]

        # ---- D window starts: (member chunk m) -------------------------
        # pad columns beyond w_s multiply exact-zero B entries, so the D
        # window needs no masking; sentinel n reads dext's zero tail.
        ch_all = np.arange(mc_s.shape[0], dtype=np.int64)
        m_of_ch = ch_all - mptr[mc_front]
        dpos = c0[mc_s] + mc_k * AW
        for bi in range(nb):
            m = (fr_bucket[mc_front] == bi) & emit[mc_front]
            NMb = int(NM_b[bi])
            flat = memd_start[bi].reshape(-1)
            flat[fr_slot[mc_front[m]] * NMb + m_of_ch[m]] = dpos[m]

        # ---- colmap: in-window position -> U column index --------------
        if nrows_tot:
            base0 = c0[run_t] + run_k0 * AW  # first chunk base per run
            off_in_run = rows_cat - base0[run_id]
            tc_global = run_ch0[run_id] + off_in_run // AW
            posw = off_in_run % AW
            m_local = tc_global - tptr[fid_r]
            j_local = np.arange(nrows_tot, dtype=np.int64) - fptr[fid_r]
            for bi in range(nb):
                m = fr_bucket[fid_r] == bi
                NTb = int(NT_b[bi])
                flat = colmap[bi].reshape(-1)
                flat[
                    fr_slot[fid_r[m]] * (NTb * AW)
                    + m_local[m] * AW
                    + posw[m]
                ] = j_local[m]

        # ---- scatter window starts + triangle/validity limits ----------
        # target positions: L[r_i, c] for run columns c in the panel of
        # t = of[c]; rows within t's diagonal block use rslot = r_i - c0,
        # below rows use the membership slot.  Patternless (r_i, t)
        # pairs get lim 0 (their U values are exact zeros — see module
        # docstring) and the P sentinel.
        fid_q, i_q, m_q = _grid_queries(nr_arr, nt_arr)
        r_q = rows_cat[fptr[fid_q] + i_q]
        tcq = tptr[fid_q] + m_q
        t_q = tc_t[tcq]
        cb = tc_cbase[tcq]
        in_diag = (r_q >= c0[t_q]) & (r_q < c1[t_q])
        slot, found = pre.member_slot(t_q, r_q)
        rslot = np.where(in_diag, r_q - c0[t_q], slot)
        lim = np.where(
            in_diag,
            np.clip(r_q - cb + 1, 0, AW),
            np.where(found & (r_q >= c1[t_q]), AW, 0),
        )
        pos = np.where(
            lim > 0, off64[t_q] + rslot * W + (cb - c0[t_q]), P
        )
        for bi in range(nb):
            m = fr_bucket[fid_q] == bi
            RFb, NTb = bucket_sizes[bi], int(NT_b[bi])
            flatp = tgt_start[bi].reshape(-1)
            flatl = tgt_lim[bi].reshape(-1)
            idx = fr_slot[fid_q[m]] * (RFb * NTb) + i_q[m] * NTb + m_q[m]
            flatp[idx] = pos[m]
            flatl[idx] = lim[m]

    # --- task schedule: per front, per target (updates then factor),
    # then the front's aggregate (skipped when R_f is empty) -------------
    upd_cnt = (
        np.bincount(pair_t, minlength=S) if npairs else np.zeros(S, np.int64)
    )
    base_ptr = np.zeros(S + 1, dtype=np.int64)
    np.cumsum(upd_cnt + 1, out=base_ptr[1:])
    pre_agg = np.zeros(F + 1, dtype=np.int64)
    np.cumsum(emit, out=pre_agg[1:])
    shift = pre_agg[front_of]  # aggregates of earlier fronts
    t_type = np.zeros(T, dtype=np.int32)
    t_src = np.zeros(T, dtype=np.int64)
    t_dst = np.zeros(T, dtype=np.int64)
    t_rmap = np.full((T, MR), MR, dtype=np.int32)
    if npairs:
        order = np.lexsort((pair_d, pair_t))
        pt_sorted = pair_t[order]
        grp_first = np.zeros(npairs, dtype=np.int64)
        newgrp = np.ones(npairs, dtype=bool)
        newgrp[1:] = pt_sorted[1:] != pt_sorted[:-1]
        grp_first[newgrp] = np.nonzero(newgrp)[0]
        grp_first = np.maximum.accumulate(grp_first)
        rank = np.arange(npairs, dtype=np.int64) - grp_first
        upd_idx = base_ptr[pt_sorted] + shift[pt_sorted] + rank
        t_src[upd_idx] = pair_d[order]
        t_dst[upd_idx] = pt_sorted
        t_rmap[upd_idx] = rmap[order]
    sArr = np.arange(S, dtype=np.int64)
    fact_idx = base_ptr[1:] - 1 + shift
    t_type[fact_idx] = 1
    t_src[fact_idx] = sArr
    t_dst[fact_idx] = sArr
    agg_idx = base_ptr[fb[1:][emit]] + pre_agg[:-1][emit]
    t_type[agg_idx] = 2
    t_src[agg_idx] = fr_bucket[emit]
    t_dst[agg_idx] = fr_slot[emit]

    return MfPlan(
        n=n,
        S=S,
        W=W,
        MR=MR,
        P=P,
        F=F,
        RF=RF,
        AW=AW,
        c0=c0.astype(np.int32),
        w=w.astype(np.int32),
        rows=pre.rows.astype(np.int32),
        off=off64[:-1].astype(np.int32),
        asm_src=pre.asm_src.astype(np.int32),
        asm_dst=pre.asm_dst.astype(np.int32),
        t_type=t_type,
        t_src=t_src.astype(np.int32),
        t_dst=t_dst.astype(np.int32),
        t_rmap=t_rmap,
        csc_gather=pre.csc_gather.astype(np.int32),
        below_ptr=bp.astype(np.int32),
        below_flat=np.concatenate(
            [bf, np.full(MR, n, dtype=np.int64)]
        ).astype(np.int32),
        mem_start=tuple(mem_start),
        memd_start=tuple(memd_start),
        tgt_start=tuple(tgt_start),
        tgt_lim=tuple(tgt_lim),
        colmap=tuple(colmap),
    )


def make_agg_phase(plan, bi: int):
    """The bucket-``bi`` aggregate as a batched phase
    ``(Lp, dext, slots) -> (Lp, dext)`` over slot lanes (sentinel -1).

    Shared by the scan numeric (one lane) and the level-batched
    numeric (``ldl_batched``).  Every window start is AW-aligned by
    construction (panel offsets are multiples of W, target chunk bases
    snap to the c0 grid), so the B gather and the U scatter run as ROW
    ops on an ``(len/AW, AW)`` 2-D view — the lane-aligned access
    pattern the TPU gathers/scatters at full rate, vs per-element maps
    at the ~50M lookups/s ceiling.  ``Lp`` must be a multiple of AW
    long with >= AW readable zeros at position P (the zero-scratch
    sentinel row); masked lanes contribute exact-zero adds, so
    overlapping windows are no-ops there.
    """
    AW = plan.AW
    ms_r = jnp.asarray(plan.mem_start[bi] // AW, dtype=INDEX_DTYPE)
    md_t = jnp.asarray(plan.memd_start[bi], dtype=INDEX_DTYPE)
    ts_r = jnp.asarray(plan.tgt_start[bi] // AW, dtype=INDEX_DTYPE)
    lm_t = jnp.asarray(plan.tgt_lim[bi], dtype=INDEX_DTYPE)
    cm_t = jnp.asarray(plan.colmap[bi], dtype=INDEX_DTYPE)
    RFb, NMb = ms_r.shape[1], ms_r.shape[2]
    NTb = ts_r.shape[2]
    posAW = jnp.arange(AW, dtype=INDEX_DTYPE)

    def phase(Lp, dext, slots):
        assert Lp.shape[0] % AW == 0
        live = slots >= 0
        sl = jnp.maximum(slots, 0)
        Ba = sl.shape[0]
        Lp2 = Lp.reshape(-1, AW)
        B = Lp2[ms_r[sl]]  # (Ba, RFb, NMb, AW) aligned row gather
        Dv = jax.vmap(
            lambda o: lax.dynamic_slice(dext, (o,), (AW,))
        )(md_t[sl].reshape(-1)).reshape(Ba, 1, NMb, AW)
        K = NMb * AW
        BDf = (B * Dv).reshape(Ba, RFb, K)
        Bf = B.reshape(Ba, RFb, K)
        # The (RFb, RFb) Schur matrix U is never materialized: its
        # columns are needed in scatter-WINDOW order, and a
        # take_along_axis re-order is a per-element gather (the slow
        # unit).  Instead gather B's rows into window order (aligned
        # K-wide row gather) and let the MXU emit the window tensor
        # directly: Uw[i, p] = sum_k BD[i, k] * B[cm[p], k].
        cm = cm_t[sl]  # (Ba, NTb, AW), sentinel RFb
        cmok = cm < RFb
        cmc = jnp.minimum(cm, RFb - 1).reshape(Ba, NTb * AW)
        Bw = jnp.take_along_axis(Bf, cmc[:, :, None], axis=1)
        Uw = jnp.einsum("bik,bpk->bip", BDf, Bw).reshape(
            Ba, RFb, NTb, AW
        )
        Uw = jnp.where(live[:, None, None, None], Uw, 0)
        lm = lm_t[sl]  # (Ba, RFb, NTb)
        upd = jnp.where(
            cmok[:, None, :, :] & (posAW < lm[..., None]), Uw, 0
        )
        Lp2 = Lp2.at[ts_r[sl].reshape(-1)].add(-upd.reshape(-1, AW))
        return Lp2.reshape(-1), dext

    return phase


def numeric_multifrontal(plan: MfPlan, data: jax.Array):
    """Jittable multifrontal-lite numeric: same ``(l_data, d)`` CSC-slot
    contract as ``numeric_supernodal`` (NaN/Inf poisoning on singular
    inputs; XLA cannot raise)."""
    n, S, W, MR, P = plan.n, plan.S, plan.W, plan.MR, plan.P
    AW = plan.AW
    dtype = data.dtype
    if not jnp.issubdtype(dtype, jnp.floating):
        dtype = jnp.result_type(dtype, jnp.float32)
        data = data.astype(dtype)

    off_a = jnp.asarray(plan.off, dtype=INDEX_DTYPE)
    c0_a = jnp.asarray(plan.c0, dtype=INDEX_DTYPE)
    w_a = jnp.asarray(plan.w, dtype=INDEX_DTYPE)
    rows_a = jnp.asarray(plan.rows, dtype=INDEX_DTYPE)
    nb = len(plan.mem_start)

    # AW-zero tail past P: the sentinel window [P, P+AW) must gather
    # exact zeros (dynamic_slice CLAMPS at boundaries, so without the
    # tail a sentinel would silently read the last real panel).
    Lp0 = (
        jnp.zeros((P + AW,), dtype)
        .at[jnp.asarray(plan.asm_dst, dtype=INDEX_DTYPE)]
        .add(data[jnp.asarray(plan.asm_src, dtype=INDEX_DTYPE)])
    )
    dext0 = jnp.zeros((n + max(W, AW),), dtype)

    _update, _factor = _panel_kernels(
        off_a, c0_a, w_a, rows_a, W, MR, dtype
    )

    agg_phases = [make_agg_phase(plan, bi) for bi in range(nb)]

    def _aggregate(Lp, dext, bucket, slot):
        if nb == 0:  # no aggregates anywhere (single front)
            return Lp, dext
        one = lambda ph: lambda L, de, s: ph(L, de, s[None])
        if nb == 1:
            return one(agg_phases[0])(Lp, dext, slot)
        return lax.switch(
            bucket, [one(ph) for ph in agg_phases], Lp, dext, slot
        )

    def body(carry, xs):
        Lp, dext = carry
        ttype, src, dst, rmap = xs
        Lp, dext = lax.switch(
            ttype,
            [
                lambda L, de: _update(L, de, src, dst, rmap),
                lambda L, de: _factor(L, de, src),
                lambda L, de: _aggregate(L, de, src, dst),
            ],
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
