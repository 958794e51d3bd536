"""Multifrontal-lite LDLᵀ numeric — subtree-aggregated Schur updates.

Executes docs/MULTIFRONTAL_PLAN.md.  The left-looking supernodal
numeric (``ldl_super``) applies one (MR, W)·(W, W) update per
(descendant, target) PAIR; at 262k rows (camd) that is T=141k tasks
with a fixed (MR=800, W=128) shape regardless of true overlap — the
pair COUNT times the padded panel shape is the scale wall, and the
(T, MR) row-map table alone reaches GBs at 10⁶ rows.

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

Scatter volume is Σ_f |R_f|² ≈ true flops / W, tunable by the front
budget; the (T, MR) pair table shrinks to intra-front pairs only.

Reference numeric this replaces at scale:
/root/reference/sprs-ldl/src/lib.rs:502-593 (up-looking row
recurrence); the front aggregation mirrors CHOLMOD/MUMPS-class
multifrontal assembly trees, re-shaped as static (F, RF, CF) maps.
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
    on either), plus the front-aggregation maps.  Task types: 0 = pair
    update, 1 = panel factor, 2 = front aggregate (``t_src`` is the
    front index).
    """

    n: int
    S: int
    W: int
    MR: int
    P: int
    F: int  # number of fronts
    RF: int  # max |R_f| over fronts (diagnostic)
    CF: int  # max front column count (padded to a multiple of 8)
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
    # pay per-bucket, not global, padding: measured 262k camd, global
    # (F, RFmax, ·) padding costs 15-19 GB while Σ nr² + Σ nr·nc is
    # ~50M elements — bucket padding lands within ~2x of the exact sum.
    colstarts: tuple  # per bucket: (F_b,) first global column
    bmaps: tuple  # per bucket: (F_b, RF_b, CF) positions, sentinel P
    aggdsts: tuple  # per bucket: (F_b, RF_b, RF_b) positions, sentinel P

    @property
    def n_tasks(self) -> int:
        return self.t_type.shape[0]

    @property
    def agg_table_elems(self) -> int:
        return sum(b.size for b in self.bmaps) + sum(
            a.size for a in self.aggdsts
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
            self.colstarts,
            self.bmaps,
            self.aggdsts,
        )
        return leaves, (
            self.n,
            self.S,
            self.W,
            self.MR,
            self.P,
            self.F,
            self.RF,
            self.CF,
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        n, S, W, MR, P, F, RF, CF = aux
        return cls(n, S, W, MR, P, F, RF, CF, *leaves)


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
) -> MfPlan:
    """Build the multifrontal-lite schedule from an ``LdlSymbolic``.

    ``agg_limit`` bounds the combined (F, RF, CF) + (F, RF, RF)
    aggregation tables (elements); ``map_limit`` bounds the intra-front
    (T, MR) pair table as in ``build_super_plan``; ``align='subtree'``
    cuts supernodes along complete etree subtrees (short batched
    critical path — see ``supernodes.amalgamate_subtree``).
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
    f_colstart = c0[fb[:-1]]
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
    nc_arr = f_colend - f_colstart
    RF = int(nr_arr.max()) if F else 0
    CF = _ceil8(int(nc_arr.max()))

    # --- bucket fronts by padded row count (8/16/32, then 64-steps) ----
    emit = nr_arr > 0
    bsz = np.where(
        nr_arr <= 8,
        8,
        np.where(
            nr_arr <= 16, 16, np.where(nr_arr <= 32, 32, -(-nr_arr // 64) * 64)
        ),
    ).astype(np.int64)
    bucket_sizes = sorted(set(int(b) for b in bsz[emit]))
    nb = len(bucket_sizes)
    b_of_size = {b: i for i, b in enumerate(bucket_sizes)}
    fr_bucket = np.full(F, -1, dtype=np.int64)
    fr_slot = np.zeros(F, dtype=np.int64)
    for bi, b in enumerate(bucket_sizes):
        in_b = emit & (bsz == b)
        fr_bucket[in_b] = bi
        fr_slot[in_b] = np.arange(int(in_b.sum()))
    fcnt = [int((fr_bucket == bi).sum()) for bi in range(nb)]
    total_tab = sum(
        fcnt[bi] * bucket_sizes[bi] * (CF + bucket_sizes[bi])
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

    # B[i, j] = L[rows_f[i], cols_f[j]] — every R_f row is at/beyond
    # the front's column end, so only below-structure membership
    # applies; misses are structural zeros (gather fills 0, exact by
    # the padding argument in ldl_super's module docstring).
    bmaps = [
        np.full((fcnt[bi], bucket_sizes[bi], CF), P, dtype=np.int32)
        for bi in range(nb)
    ]
    aggdsts = [
        np.full(
            (fcnt[bi], bucket_sizes[bi], bucket_sizes[bi]), P, dtype=np.int32
        )
        for bi in range(nb)
    ]
    colstarts = [
        f_colstart[(fr_bucket == bi)].astype(np.int32) for bi in range(nb)
    ]
    if ef.size:
        fid_q, i_q, j_q = _grid_queries(nr_arr, nc_arr)
        r_q = rows_cat[fptr[fid_q] + i_q]
        c_q = f_colstart[fid_q] + j_q
        s_c = of[c_q]
        slot, found = pre.member_slot(s_c, r_q)
        pos = np.where(
            found, off64[s_c] + slot * W + (c_q - c0[s_c]), P
        )
        for bi in range(nb):
            m = fr_bucket[fid_q] == bi
            RFb = bucket_sizes[bi]
            flat = bmaps[bi].reshape(-1)
            flat[
                fr_slot[fid_q[m]] * (RFb * CF) + i_q[m] * CF + j_q[m]
            ] = pos[m]

        # aggregate targets: (r=rows_f[i], c=rows_f[j]), lower triangle
        # r >= c, in the panel owning column c.  Patternless pairs get
        # the drop sentinel: U[i,j] ≠ 0 needs a front column k with
        # L[r,k], L[c,k] both nonzero, and the fill property (r, c ∈
        # struct(k), r ≥ c > k ⇒ r ∈ struct(c)) puts every such pair
        # inside the pattern — a patternless pair's U entry is a
        # product of exact zeros.
        fid_q, i_q, j_q = _grid_queries(nr_arr, nr_arr)
        r_i = rows_cat[fptr[fid_q] + i_q]
        r_j = rows_cat[fptr[fid_q] + j_q]
        s_t = of[r_j]
        in_diag = r_i < c1[s_t]
        tslot, tfound = pre.member_slot(s_t, r_i)
        lower = r_i >= r_j
        rslot = np.where(in_diag, r_i - c0[s_t], tslot)
        ok = in_diag | tfound
        pos = np.where(
            lower & ok, off64[s_t] + rslot * W + (r_j - c0[s_t]), P
        )
        for bi in range(nb):
            m = fr_bucket[fid_q] == bi
            RFb = bucket_sizes[bi]
            flat = aggdsts[bi].reshape(-1)
            flat[
                fr_slot[fid_q[m]] * (RFb * RFb) + i_q[m] * RFb + j_q[m]
            ] = pos[m]

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
        CF=CF,
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
        colstarts=tuple(colstarts),
        bmaps=tuple(bmaps),
        aggdsts=tuple(aggdsts),
    )


def numeric_multifrontal(plan: MfPlan, data: jax.Array):
    """Jittable multifrontal-lite numeric: same ``(l_data, d)`` CSC-slot
    contract as ``numeric_supernodal`` (NaN/Inf poisoning on singular
    inputs; XLA cannot raise)."""
    n, S, W, MR, P = plan.n, plan.S, plan.W, plan.MR, plan.P
    F, RF, CF = plan.F, plan.RF, plan.CF
    dtype = data.dtype
    if not jnp.issubdtype(dtype, jnp.floating):
        dtype = jnp.result_type(dtype, jnp.float32)
        data = data.astype(dtype)

    off_a = jnp.asarray(plan.off, dtype=INDEX_DTYPE)
    c0_a = jnp.asarray(plan.c0, dtype=INDEX_DTYPE)
    w_a = jnp.asarray(plan.w, dtype=INDEX_DTYPE)
    rows_a = jnp.asarray(plan.rows, dtype=INDEX_DTYPE)
    colstarts = [
        jnp.asarray(c, dtype=INDEX_DTYPE) for c in plan.colstarts
    ]
    bmaps = [jnp.asarray(b, dtype=INDEX_DTYPE) for b in plan.bmaps]
    aggdsts = [jnp.asarray(a, dtype=INDEX_DTYPE) for a in plan.aggdsts]
    nb = len(bmaps)

    Lp0 = (
        jnp.zeros((P,), dtype)
        .at[jnp.asarray(plan.asm_dst, dtype=INDEX_DTYPE)]
        .add(data[jnp.asarray(plan.asm_src, dtype=INDEX_DTYPE)])
    )
    # CF slack: the aggregate's D window reads [colstart, colstart+CF)
    # which can overhang n by up to CF; overhang entries are 0 (unset)
    dext0 = jnp.zeros((n + max(W, CF),), dtype)

    _update, _factor = _panel_kernels(
        off_a, c0_a, w_a, rows_a, W, MR, dtype
    )

    def _make_agg_branch(bi):
        bm_t, ad_t, cs_t = bmaps[bi], aggdsts[bi], colstarts[bi]
        RFb = bm_t.shape[1]

        def branch(Lp, dext, slot):
            z = jnp.zeros((), INDEX_DTYPE)
            bm = lax.dynamic_slice(bm_t, (slot, z, z), (1, RFb, CF))[0]
            # sentinel P is out of bounds for the length-P panel array:
            # gather fills 0 (structural zero), scatter drops.
            B = Lp.at[bm].get(mode="fill", fill_value=0)
            Dv = lax.dynamic_slice(dext, (cs_t[slot],), (CF,))
            # columns of LATER fronts inside the CF window have
            # dext == 0 at this point in the scan (their factor step
            # hasn't run), so they contribute nothing even where bm
            # hits a real position.
            U = (B * Dv[None, :]) @ B.T  # (RFb, RFb) on the MXU
            ad = lax.dynamic_slice(ad_t, (slot, z, z), (1, RFb, RFb))[0]
            return (
                Lp.at[ad.reshape(-1)].add(-U.reshape(-1), mode="drop"),
                dext,
            )

        return branch

    agg_branches = [_make_agg_branch(bi) for bi in range(nb)]

    def _aggregate(Lp, dext, bucket, slot):
        if nb == 0:  # no aggregates anywhere (single front)
            return Lp, dext
        if nb == 1:
            return agg_branches[0](Lp, dext, slot)
        return lax.switch(bucket, agg_branches, Lp, dext, slot)

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
