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
    RF: int  # max |R_f| (padded to a multiple of 8)
    CF: int  # max front column count (padded to a multiple of 8)
    c0: np.ndarray
    w: np.ndarray
    rows: np.ndarray
    off: np.ndarray
    asm_src: np.ndarray
    asm_dst: np.ndarray
    t_type: np.ndarray
    t_src: np.ndarray
    t_dst: np.ndarray
    t_rmap: np.ndarray  # (T, MR), sentinel MR
    csc_gather: np.ndarray
    below_ptr: np.ndarray
    below_flat: np.ndarray
    f_colstart: np.ndarray  # (F,) first global column of each front
    bmap: np.ndarray  # (F, RF, CF) flat panel positions, sentinel P
    agg_dst: np.ndarray  # (F, RF, RF) flat panel positions, sentinel P

    @property
    def n_tasks(self) -> int:
        return self.t_type.shape[0]

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
            self.f_colstart,
            self.bmap,
            self.agg_dst,
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


def _partition_fronts(pre, max_front_cols: int, max_front_rows: int):
    """Greedy contiguous chunking of the supernode sequence: cut when
    the next supernode would push the front past the column budget or
    past the (upper-bound) distinct below-row budget.  The row estimate
    counts distinct below rows of the members — an upper bound on
    |R_f| (rows landing inside the front are later excluded), O(total
    below-structure) time via a per-row front-id mark."""
    S, n = pre.S, pre.n
    w, bp, bf = pre.w, pre.below_ptr, pre.below_flat
    mark = np.full(n, -1, dtype=np.int64)
    fb = [0]
    cur_cols = 0
    cur_rows = 0
    fid = 0
    for s in range(S):
        seg = bf[bp[s] : bp[s + 1]]
        new = int(np.count_nonzero(mark[seg] != fid))
        if s > fb[-1] and (
            cur_cols + int(w[s]) > max_front_cols
            or cur_rows + new > max_front_rows
        ):
            fb.append(s)
            fid += 1
            new = seg.shape[0]
            cur_cols = 0
            cur_rows = 0
        mark[seg] = fid
        cur_cols += int(w[s])
        cur_rows += new
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
) -> MfPlan:
    """Build the multifrontal-lite schedule from an ``LdlSymbolic``.

    ``agg_limit`` bounds the combined (F, RF, CF) + (F, RF, RF)
    aggregation tables (elements); ``map_limit`` bounds the intra-front
    (T, MR) pair table as in ``build_super_plan``.
    """
    pre = _build_prelude(
        sym,
        max_width=max_width,
        max_zeros=max_zeros,
        rel_zeros=rel_zeros,
        panel_limit=panel_limit,
    )
    n, S, W, MR, P = pre.n, pre.S, pre.W, pre.MR, pre.P
    of, c0, c1, w = pre.of, pre.c0, pre.c1, pre.w
    bp, bf = pre.below_ptr, pre.below_flat

    fb = _partition_fronts(pre, max_front_cols, max_front_rows)
    F = fb.shape[0] - 1
    front_of = np.repeat(np.arange(F, dtype=np.int64), np.diff(fb))

    # --- intra-front pairs (cross-front updates ride the aggregates) ---
    keep = front_of[pre.pair_d] == front_of[pre.pair_t]
    pair_d = pre.pair_d[keep]
    pair_t = pre.pair_t[keep]
    npairs = pair_d.shape[0]
    T = npairs + S + F
    if T * MR > map_limit:
        raise SupernodalPlanError(
            f"row-map table {T}x{MR} exceeds limit {map_limit}"
        )
    rmap = _pair_rmap(pre, pair_d, pair_t)

    # --- per-front aggregation maps ------------------------------------
    f_colstart = c0[fb[:-1]]
    f_colend = c1[fb[1:] - 1]
    r_lists = []
    for f in range(F):
        rows_f = np.unique(bf[bp[fb[f]] : bp[fb[f + 1]]])
        r_lists.append(rows_f[rows_f >= f_colend[f]])
    RF = _ceil8(max((r.shape[0] for r in r_lists), default=1))
    CF = _ceil8(int((f_colend - f_colstart).max()))
    if F * RF * (CF + RF) > agg_limit:
        raise SupernodalPlanError(
            f"aggregation tables {F}x{RF}x({CF}+{RF}) exceed limit "
            f"{agg_limit}; raise the front budgets or the limit"
        )
    bmap = np.full((F, RF, CF), P, dtype=np.int32)
    agg_dst = np.full((F, RF, RF), P, dtype=np.int32)
    off64 = pre.off
    for f in range(F):
        rows_f = r_lists[f]
        nr = rows_f.shape[0]
        nc = int(f_colend[f] - f_colstart[f])
        if nr == 0:
            continue
        cols = np.arange(f_colstart[f], f_colend[f], dtype=np.int64)
        s_c = of[cols]
        # B[i, j] = L[rows_f[i], cols[j]] — all rows_f are at/beyond the
        # front's column end, so only below-structure membership applies;
        # misses are structural zeros (gather fills 0, exact by the
        # padding argument in ldl_super's module docstring).
        slot, found = pre.member_slot(
            np.broadcast_to(s_c[None, :], (nr, nc)),
            np.broadcast_to(rows_f[:, None], (nr, nc)),
        )
        bmap[f, :nr, :nc] = np.where(
            found,
            off64[s_c][None, :] + slot * W + (cols - c0[s_c])[None, :],
            P,
        )
        # target positions for (r=rows_f[i], c=rows_f[j]), lower
        # triangle r >= c; position in the panel owning column c.
        s_t = of[rows_f]
        in_diag = rows_f[:, None] < c1[s_t][None, :]
        tslot, tfound = pre.member_slot(
            np.broadcast_to(s_t[None, :], (nr, nr)),
            np.broadcast_to(rows_f[:, None], (nr, nr)),
        )
        lower = rows_f[:, None] >= rows_f[None, :]
        rslot = np.where(in_diag, rows_f[:, None] - c0[s_t][None, :], tslot)
        # pairs with NO position in the pattern get the drop sentinel:
        # U[i, j] ≠ 0 needs a front column k with L[r,k], L[c,k] both
        # nonzero, and the fill property (r, c ∈ struct(k), r ≥ c > k ⇒
        # r ∈ struct(c)) puts every such pair inside the pattern — a
        # patternless pair's U entry is a product of exact zeros.
        ok = in_diag | tfound
        agg_dst[f, :nr, :nr] = np.where(
            lower & ok,
            off64[s_t][None, :] + rslot * W + (rows_f[None, :] - c0[s_t]),
            P,
        )

    # --- task schedule: per front, per target (updates then factor),
    # then the front's aggregate -----------------------------------------
    upd_cnt = (
        np.bincount(pair_t, minlength=S) if npairs else np.zeros(S, np.int64)
    )
    base_ptr = np.zeros(S + 1, dtype=np.int64)
    np.cumsum(upd_cnt + 1, out=base_ptr[1:])
    # shift supernode s's task block by the number of aggregate tasks
    # of earlier fronts; front f's aggregate lands at base_ptr[fb[f+1]]+f
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
        upd_idx = base_ptr[pt_sorted] + front_of[pt_sorted] + rank
        t_src[upd_idx] = pair_d[order]
        t_dst[upd_idx] = pt_sorted
        t_rmap[upd_idx] = rmap[order]
    sArr = np.arange(S, dtype=np.int64)
    fact_idx = base_ptr[1:] - 1 + front_of
    t_type[fact_idx] = 1
    t_src[fact_idx] = sArr
    t_dst[fact_idx] = sArr
    agg_idx = base_ptr[fb[1:]] + np.arange(F, dtype=np.int64)
    t_type[agg_idx] = 2
    t_src[agg_idx] = np.arange(F, dtype=np.int64)

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
        f_colstart=f_colstart.astype(np.int32),
        bmap=bmap,
        agg_dst=agg_dst,
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
    colstart_a = jnp.asarray(plan.f_colstart, dtype=INDEX_DTYPE)
    bmap_a = jnp.asarray(plan.bmap, dtype=INDEX_DTYPE)
    aggdst_a = jnp.asarray(plan.agg_dst, dtype=INDEX_DTYPE)

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

    def _aggregate(Lp, dext, fidx):
        z = jnp.zeros((), INDEX_DTYPE)
        bm = lax.dynamic_slice(bmap_a, (fidx, z, z), (1, RF, CF))[0]
        # sentinel P is out of bounds for the length-P panel array:
        # gather fills 0 (structural zero), scatter drops.
        B = Lp.at[bm].get(mode="fill", fill_value=0)
        Dv = lax.dynamic_slice(dext, (colstart_a[fidx],), (CF,))
        # columns of LATER fronts inside the CF window have dext == 0
        # at this point in the scan (their factor step hasn't run), so
        # they contribute nothing even where bm hits a real position.
        U = (B * Dv[None, :]) @ B.T  # (RF, RF) on the MXU
        ad = lax.dynamic_slice(aggdst_a, (fidx, z, z), (1, RF, RF))[0]
        Lp = Lp.at[ad.reshape(-1)].add(
            -U.reshape(-1), mode="drop", indices_are_sorted=False
        )
        return Lp, dext

    def body(carry, xs):
        Lp, dext = carry
        ttype, src, dst, rmap = xs
        Lp, dext = lax.switch(
            ttype,
            [
                lambda L, de: _update(L, de, src, dst, rmap),
                lambda L, de: _factor(L, de, src),
                lambda L, de: _aggregate(L, de, src),
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
