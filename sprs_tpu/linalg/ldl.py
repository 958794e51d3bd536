"""LDLᵀ Cholesky factorization with fill-reducing ordering.

Reference: /root/reference/sprs-ldl/src/lib.rs (pure-Rust port of Davis's
LDL): builder ``Ldl`` (lib.rs:76-90), ``ldl_symbolic`` building the
elimination tree + column counts (lib.rs:445-496), ``ldl_numeric``
up-looking factorization (lib.rs:502-593), and solve = perm → lsolve →
diag → ltsolve → inv perm (lib.rs:388-410).

TPU-native split, sharper than the reference's symbolic/numeric divide:

* **Symbolic (host)** — everything data-independent is precomputed once:
  elimination tree, column counts, the complete static pattern of L
  (stored CSC with an explicit unit diagonal), per-row topologically
  ordered update lists, the *exact storage slot* of every L entry (the
  insertion position is deterministic given the pattern, so the device
  never needs fill counters), static gather maps from the input matrix's
  data array into permuted rows, a gather map realizing Lᵀ, and level
  schedules for both triangular solves.

* **Numeric (device or host)** — ``update(mat)`` refactorizes a matrix
  with the same pattern.  The device path is a single ``lax.scan`` over
  rows whose only inputs are the static symbolic arrays and the new
  ``data`` vector: jit it once, refactorize every step — the natural TPU
  analog of the reference's same-pattern ``update`` (lib.rs:361-381).
  The host path is exact f64 numpy for golden-value parity.

* **Solve (device)** — permute, unit-lower level-scheduled solve,
  diagonal scale, unit-upper solve, inverse permute; fully jittable.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import (
    LinalgError,
    NonSquareMatrixError,
    ShapeError,
    SingularMatrixError,
)
from ..formats.csmat import CSC, CSR, CsMat, csmat
from ..formats.util import INDEX_DTYPE, is_concrete
from ..ops.permutation import Permutation
from ..ops.symmetry import is_symmetric
from .ordering import reverse_cuthill_mckee
from .trisolve import (
    TriSchedule,
    build_schedule,
    _flat_solve_csr,
    _level_solve_csr,
)


# ---------------------------------------------------------------------------
# symbolic phase (host)
# ---------------------------------------------------------------------------


def _check_factor_capacity(lnz: int) -> None:
    """CSC slots / panel gathers are i32 (csc_gather, rmaps): a factor
    past the i32 ceiling would wrap silently — fail loudly instead
    (reference analog: SpIndex panic, sprs/src/indexing.rs:18-46)."""
    from ..errors import CapacityError
    from ..formats.util import MAX_INDEX

    if lnz > MAX_INDEX:
        raise CapacityError.index_limit(
            "factor nnz",
            lnz,
            hint="reduce fill with Ldl().fill_in_reduction('nd') "
            "(O(n log n) fill on mesh-like problems), or switch to an "
            "iterative solve — solve(..., method='cg'/'bicgstab') with "
            "an ILU/IC/block-Jacobi preconditioner needs O(nnz(A)) "
            "memory (docs/SCALE.md)",
        )


@dataclasses.dataclass(frozen=True)
class LdlSymbolic:
    """Static factorization plan; reusable across same-pattern matrices."""

    n: int
    perm: Optional[Permutation]
    parent: np.ndarray  # etree, (n,)
    # L stored CSC with explicit unit diagonal (diag entry first per col)
    l_indptr: np.ndarray  # (n+1,)
    l_indices: np.ndarray  # (lnz,)
    # per-row update lists (ascending == topological) and insert slots,
    # stored FLAT (O(lnz)): row k's entries live at
    # rp_indptr[k]:rp_indptr[k+1].  The padded (n, wl) twins used by the
    # sequential scan numeric are derived lazily (see ``row_pattern`` /
    # ``insert_pos``) — wl reaches the trailing dense-block width under
    # fill-reducing orderings (~sqrt(n) on 2-D meshes), so the padded
    # grid is O(n^1.5) memory and must not be built eagerly at scale.
    rp_indptr: np.ndarray  # (n+1,)
    rp_cols: np.ndarray  # (sub-diag lnz,) update column j of L[k, j]
    rp_slots: np.ndarray  # (sub-diag lnz,) absolute CSC slot of L[k, j]
    # gather map from input CSR data into permuted upper rows
    a_pos: np.ndarray  # (n, wa) positions into data, clamped
    a_col: np.ndarray  # (n, wa) permuted column (== row index for diag)
    a_live: np.ndarray  # (n, wa) bool
    # CSR twin of L (row-major lower triangle): static indices + value
    # gather, so solves never re-sort at runtime.  Lᵀ needs no twin at
    # all: L's CSC arrays flagged CSR *are* Lᵀ (transpose is metadata).
    lcsr_indptr: np.ndarray
    lcsr_indices: np.ndarray
    lcsr_gather: np.ndarray  # lcsr_data = l_data[lcsr_gather]
    # level schedules for the two solves
    sched_lower: TriSchedule
    sched_upper: TriSchedule
    wc: int  # max column count of L (gather width in numeric)

    @property
    def nnz(self) -> int:
        """Stored entries of L including the unit diagonal."""
        return int(self.l_indptr[-1])

    @property
    def problem_size(self) -> int:
        return self.n

    @classmethod
    def from_matrix(
        cls,
        mat: CsMat,
        *,
        perm: Optional[Permutation] = None,
        check_symmetry: bool = True,
        postorder: bool = False,
    ) -> "LdlSymbolic":
        if mat.shape[0] != mat.shape[1]:
            raise NonSquareMatrixError(f"LDLᵀ needs square, got {mat.shape}")
        if check_symmetry and not is_symmetric(mat):
            raise LinalgError("matrix is not symmetric (pass check_symmetry=False to skip)")
        n = mat.shape[0]
        a = mat.to_csr()
        indptr = np.asarray(a.indptr)
        indices = np.asarray(a.indices)
        if perm is not None:
            p = np.asarray(perm.perm)
            pinv = np.asarray(perm.inv)
        else:
            p = pinv = np.arange(n)

        def permuted_upper_maps(p, pinv):
            """Gather maps for the upper rows of PAPᵀ (row k, cols ≤ k).

            Fully vectorized numpy — no per-row Python loops, so the
            symbolic phase survives 10^6-row inputs (round-1 weak spot).
            """
            cnt = (indptr[p + 1] - indptr[p]).astype(np.int64)
            total = int(cnt.sum())
            rowid = np.repeat(np.arange(n, dtype=np.int64), cnt)
            offs = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(cnt, out=offs[1:])
            # flat source position of every entry of every permuted row
            pos = (
                np.arange(total, dtype=np.int64)
                - np.repeat(offs[:-1], cnt)
                + np.repeat(indptr[p].astype(np.int64), cnt)
            )
            cols = pinv[indices[pos]].astype(np.int64)
            keep = cols <= rowid  # upper triangle of PAPᵀ, row-wise
            kept_row = rowid[keep]
            kept_pos = pos[keep]
            kept_col = cols[keep]
            kcount = (
                np.bincount(kept_row, minlength=n).astype(np.int64)
                if n
                else np.zeros(0, np.int64)
            )
            wa = max(int(kcount.max()) if n else 1, 1)
            koffs = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(kcount, out=koffs[1:])
            # rank within row (kept entries sorted by row — stable mask)
            rank = (
                np.arange(kept_row.size, dtype=np.int64)
                - koffs[kept_row]
            )
            a_pos = np.zeros((n, wa), dtype=np.int64)
            a_col = np.full((n, wa), n, dtype=np.int64)
            a_live = np.zeros((n, wa), dtype=bool)
            a_pos[kept_row, rank] = kept_pos
            a_col[kept_row, rank] = kept_col
            a_live[kept_row, rank] = True
            return kept_col, koffs, a_pos, a_col, a_live

        kept_col, koffs, a_pos, a_col, a_live = permuted_upper_maps(p, pinv)

        if postorder and n:
            # Postordering the etree is a fill-invariant relabeling
            # (Liu): flops and lnz are untouched, but every etree
            # subtree becomes a contiguous column range, which is what
            # lets supernode amalgamation merge the bushy trees of
            # AMD-class orderings into MXU-sized panels (CHOLMOD does
            # the same).  Compose it into the permutation and rebuild
            # the gather maps.
            from .etree import etree_from_pattern, postorder as po

            parent_pre = etree_from_pattern(koffs, kept_col, n)
            post = po(parent_pre)
            if not np.array_equal(post, np.arange(n)):
                p = np.asarray(p)[post]
                pinv = np.empty(n, dtype=np.int64)
                pinv[p] = np.arange(n)
                perm = Permutation.from_array(
                    p.astype(np.int32), check=False
                )
                (
                    kept_col,
                    koffs,
                    a_pos,
                    a_col,
                    a_live,
                ) = permuted_upper_maps(p, pinv)

        # --- etree + column counts + row patterns (lib.rs:445-496) -------
        from .. import native

        row_ptr = koffs
        row_cols_flat = kept_col.astype(np.int32)
        nat = native.ldl_symbolic(row_ptr.astype(np.int32), row_cols_flat, n)
        if nat is not None:
            parent32, col_count32, row_count32, _total = nat
            parent = parent32.astype(np.int64)
            col_count = col_count32.astype(np.int64)
            col_size = col_count + 1
            l_indptr = np.zeros(n + 1, dtype=np.int64)
            l_indptr[1:] = np.cumsum(col_size)
            lnz = int(l_indptr[-1])
            rp_indptr = np.zeros(n + 1, dtype=np.int64)
            rp_indptr[1:] = np.cumsum(row_count32.astype(np.int64))
            rp_cols32, rp_slots, l_indices32 = native.ldl_pattern_flat(
                row_ptr.astype(np.int32),
                row_cols_flat,
                n,
                parent32,
                l_indptr,
                rp_indptr,
                lnz,
            )
            rp_cols = rp_cols32.astype(np.int64)
            l_indices = l_indices32.astype(np.int64)
        else:
            parent = np.full(n, -1, dtype=np.int64)
            flag = np.full(n, -1, dtype=np.int64)
            col_count = np.zeros(n, dtype=np.int64)  # sub-diagonal entries
            patterns: list = []
            for k in range(n):
                flag[k] = k
                pat = []
                for j0 in kept_col[koffs[k] : koffs[k + 1]]:
                    j = int(j0)
                    if j >= k:
                        continue
                    while flag[j] != k:
                        if parent[j] == -1:
                            parent[j] = k
                        pat.append(j)
                        col_count[j] += 1
                        flag[j] = k
                        j = int(parent[j])
                pat.sort()  # ascending index IS topological order here
                patterns.append(pat)

            # --- static L structure: diag first, then rows ascending ------
            col_size = col_count + 1
            l_indptr = np.zeros(n + 1, dtype=np.int64)
            l_indptr[1:] = np.cumsum(col_size)
            lnz = int(l_indptr[-1])
            l_indices = np.zeros(lnz, dtype=np.int64)
            fill = l_indptr[:-1].copy() + 1  # slot after the diagonal
            for j in range(n):
                l_indices[l_indptr[j]] = j  # unit diagonal
            rp_indptr = np.zeros(n + 1, dtype=np.int64)
            rp_indptr[1:] = np.cumsum(
                [len(pt) for pt in patterns], dtype=np.int64
            )
            total_rp = int(rp_indptr[-1])
            rp_cols = np.zeros(total_rp, dtype=np.int64)
            rp_slots = np.zeros(total_rp, dtype=np.int64)
            for k in range(n):
                base = rp_indptr[k]
                for t, j in enumerate(patterns[k]):
                    rp_cols[base + t] = j
                    rp_slots[base + t] = fill[j]
                    l_indices[fill[j]] = k
                    fill[j] += 1
        wc = max(int(col_size.max()), 1) if n else 1
        _check_factor_capacity(lnz)

        # --- CSR twin of L (lower, row-major) + value gather ---------------
        cols_of = np.repeat(np.arange(n), col_size)
        # entries are already col-sorted (CSC layout): ONE stable sort
        # by row yields (row, col) order — half the lexsort's work
        order = np.argsort(l_indices, kind="stable")
        lcsr_rows = l_indices[order]
        lcsr_indices = cols_of[order]
        lcsr_gather = order
        lcsr_indptr = np.zeros(n + 1, dtype=np.int64)
        np.add.at(lcsr_indptr, lcsr_rows + 1, 1)
        lcsr_indptr = np.cumsum(lcsr_indptr)

        # --- level schedules (on static patterns) --------------------------
        lcsr_sym = csmat(
            (n, n),
            lcsr_indptr.astype(np.int32),
            lcsr_indices.astype(np.int32),
            np.zeros(lnz),
            storage=CSR,
            validate=False,
        )
        sched_lower = build_schedule(lcsr_sym, lower=True)
        # Lᵀ as CSR == L's CSC arrays, storage-flipped
        lt_sym = csmat(
            (n, n),
            l_indptr.astype(np.int32),
            l_indices.astype(np.int32),
            np.zeros(lnz),
            storage=CSR,
            validate=False,
        )
        sched_upper = build_schedule(lt_sym, lower=False)

        sym = cls(
            n=n,
            perm=perm,
            parent=parent,
            l_indptr=l_indptr,
            l_indices=l_indices,
            rp_indptr=rp_indptr,
            rp_cols=rp_cols,
            rp_slots=rp_slots,
            a_pos=a_pos,
            a_col=a_col,
            a_live=a_live,
            lcsr_indptr=lcsr_indptr,
            lcsr_indices=lcsr_indices,
            lcsr_gather=lcsr_gather,
            sched_lower=sched_lower,
            sched_upper=sched_upper,
            wc=wc,
        )
        return sym

    def flat_scheds(self):
        """Flat O(lnz) trisolve schedules for both sweeps (lazy, cached).

        The padded level kernel's per-level gather is
        (level_width × max_row_nnz) — 239 GB of HLO on a 65k-row camd
        factor (BASELINE.md round-2).  The flat entry-stream schedule
        (:func:`trisolve.build_flat_schedule`) costs O(lnz) at any
        depth; ``solve(method='levels')`` escapes to it automatically
        past the same cliff trisolve's auto dispatch uses."""
        cached = self.__dict__.get("_flat_scheds")
        if cached is None:
            from .trisolve import build_flat_schedule

            lnz = self.nnz
            lcsr_sym = csmat(
                (self.n, self.n),
                self.lcsr_indptr.astype(np.int32),
                self.lcsr_indices.astype(np.int32),
                np.zeros(lnz),
                storage=CSR,
                validate=False,
            )
            lt_sym = csmat(
                (self.n, self.n),
                self.l_indptr.astype(np.int32),
                self.l_indices.astype(np.int32),
                np.zeros(lnz),
                storage=CSR,
                validate=False,
            )
            cached = (
                build_flat_schedule(lcsr_sym, lower=True),
                build_flat_schedule(lt_sym, lower=False),
            )
            object.__setattr__(self, "_flat_scheds", cached)
        return cached

    @property
    def wl(self) -> int:
        """Max per-row update-list length (padded width of the lazy
        ``row_pattern``/``insert_pos`` twins)."""
        cached = self.__dict__.get("_wl")
        if cached is None:
            counts = np.diff(self.rp_indptr)
            cached = max(int(counts.max()) if counts.size else 0, 1)
            object.__setattr__(self, "_wl", cached)
        return cached

    def _padded_pattern(self):
        """(n, wl) ``row_pattern``/``insert_pos`` twins of the flat
        arrays, built on first use and cached.

        Only the sequential scan numeric needs the padded form (static
        shapes under jit); it is O(n·wl) memory — wl reaches the
        trailing dense-block width under fill-reducing orderings — so
        it must never be built eagerly for large problems (the
        supernodal path uses the flat arrays' a_* maps only)."""
        cached = self.__dict__.get("_padded")
        if cached is None:
            n, wl = self.n, self.wl
            counts = np.diff(self.rp_indptr)
            rows = np.repeat(np.arange(n, dtype=np.int64), counts)
            rank = (
                np.arange(self.rp_indptr[-1], dtype=np.int64)
                - np.repeat(self.rp_indptr[:-1], counts)
            )
            row_pattern = np.full((n, wl), n, dtype=np.int64)
            insert_pos = np.zeros((n, wl), dtype=np.int64)
            row_pattern[rows, rank] = self.rp_cols
            insert_pos[rows, rank] = self.rp_slots
            cached = (row_pattern, insert_pos)
            object.__setattr__(self, "_padded", cached)
        return cached

    @property
    def row_pattern(self) -> np.ndarray:
        return self._padded_pattern()[0]

    @property
    def insert_pos(self) -> np.ndarray:
        return self._padded_pattern()[1]

    def super_plan(self, **kwargs):
        """The supernodal schedule for this pattern (built lazily, cached
        on the instance).  Raises ``SupernodalPlanError`` if infeasible."""
        cached = self.__dict__.get("_super_plan")
        if cached is None:
            from .ldl_super import build_super_plan

            cached = build_super_plan(self, **kwargs)
            object.__setattr__(self, "_super_plan", cached)
        return cached

    def mf_plan(self, **kwargs):
        """The multifrontal-lite schedule for this pattern (built
        lazily, cached).  Raises ``SupernodalPlanError`` if infeasible."""
        cached = self.__dict__.get("_mf_plan")
        if cached is None:
            from .ldl_mf import build_mf_plan

            cached = build_mf_plan(self, **kwargs)
            object.__setattr__(self, "_mf_plan", cached)
        return cached

    def round_schedule(self, plan, **kwargs):
        """Level-batched round schedule for ``plan`` (lazily cached per
        plan kind — plans themselves are cached on this symbolic, so
        identity keying is sound)."""
        cached = self.__dict__.get("_round_scheds")
        if cached is None:
            cached = {}
            object.__setattr__(self, "_round_scheds", cached)
        key = id(plan)
        if key not in cached:
            from .ldl_batched import build_round_schedule

            cached[key] = build_round_schedule(plan, **kwargs)
        return cached[key]

    def factor(self, mat: CsMat, *, backend: str = "auto") -> "LdlNumeric":
        return LdlNumeric.factor(self, mat, backend=backend)


# ---------------------------------------------------------------------------
# numeric phase
# ---------------------------------------------------------------------------


def _numeric_host(sym: LdlSymbolic, data: np.ndarray):
    """Exact f64 up-looking numeric (lib.rs:502-593 algorithm)."""
    n = sym.n
    lx = np.zeros(sym.nnz, dtype=data.dtype)
    d = np.zeros(n, dtype=data.dtype)
    y = np.zeros(n, dtype=data.dtype)
    lp, li = sym.l_indptr, sym.l_indices
    rp, rc, rs = sym.rp_indptr, sym.rp_cols, sym.rp_slots
    for j in range(n):
        lx[lp[j]] = 1.0  # unit diagonal
    for k in range(n):
        vals = data[sym.a_pos[k]] * sym.a_live[k]
        cols = sym.a_col[k]
        dk = vals[cols == k].sum()
        off = cols < k
        y[cols[off]] += vals[off]
        for t in range(rp[k], rp[k + 1]):
            j = rc[t]
            yj = y[j]
            y[j] = 0.0
            lo, hi = lp[j] + 1, rs[t]
            y[li[lo:hi]] -= lx[lo:hi] * yj
            if d[j] == 0:
                raise SingularMatrixError(f"zero pivot at column {int(j)}")
            l_kj = yj / d[j]
            dk -= l_kj * yj
            lx[rs[t]] = l_kj
        if dk == 0:
            raise SingularMatrixError(f"zero pivot at column {k}")
        d[k] = dk
    return lx, d


def _numeric_device(sym: LdlSymbolic, data: jax.Array):
    """Jittable numeric: lax.scan over rows, static pattern arrays.

    Zero pivots NaN-poison instead of raising (XLA cannot raise); use
    the host backend when eager error reporting matters.
    """
    n = sym.n
    lp = jnp.asarray(sym.l_indptr, dtype=INDEX_DTYPE)
    li = jnp.asarray(sym.l_indices, dtype=INDEX_DTYPE)
    wl = sym.row_pattern.shape[1]
    wc = sym.wc
    lnz = sym.nnz

    row_pattern = jnp.asarray(sym.row_pattern, dtype=INDEX_DTYPE)
    insert_pos = jnp.asarray(sym.insert_pos, dtype=INDEX_DTYPE)
    a_pos = jnp.asarray(sym.a_pos, dtype=INDEX_DTYPE)
    a_col = jnp.asarray(sym.a_col, dtype=INDEX_DTYPE)
    a_live = jnp.asarray(sym.a_live)

    diag_slots = lp[:-1]
    lx0 = jnp.zeros((lnz,), dtype=data.dtype).at[diag_slots].set(1.0)

    def row_step(carry, k):
        y, d, lx = carry
        vals = data[a_pos[k]] * a_live[k]
        cols = a_col[k]
        dk = jnp.sum(jnp.where(cols == k, vals, 0))
        y = y.at[jnp.where(cols < k, cols, n)].add(
            jnp.where(cols < k, vals, 0), mode="drop"
        )

        def upd(t, state):
            y, dk, lx = state
            j = row_pattern[k, t]
            live = j < n
            j_c = jnp.minimum(j, n - 1)
            yj = jnp.where(live, y[j_c], 0)
            y = y.at[j_c].set(jnp.where(live, 0, y[j_c]))
            ins = insert_pos[k, t]
            base = lp[j_c] + 1
            pos = base + jnp.arange(wc, dtype=INDEX_DTYPE)
            in_col = pos < ins
            rows_g = jnp.where(in_col, li[jnp.minimum(pos, lnz - 1)], n)
            vals_g = jnp.where(
                in_col, lx[jnp.minimum(pos, lnz - 1)], 0
            )
            y = y.at[rows_g].add(-vals_g * yj, mode="drop")
            l_kj = jnp.where(live, yj / d[j_c], 0)
            dk = dk - l_kj * yj
            lx = lx.at[jnp.where(live, ins, lnz)].set(l_kj, mode="drop")
            return y, dk, lx

        y, dk, lx = jax.lax.fori_loop(0, wl, upd, (y, dk, lx))
        d = d.at[k].set(dk)
        return (y, d, lx), None

    y0 = jnp.zeros((n,), dtype=data.dtype)
    d0 = jnp.zeros((n,), dtype=data.dtype)
    (y, d, lx), _ = jax.lax.scan(
        row_step, (y0, d0, lx0), jnp.arange(n, dtype=INDEX_DTYPE)
    )
    return lx, d


@dataclasses.dataclass(frozen=True)
class LdlNumeric:
    """A computed LDLᵀ factorization: PᵀAP = L·D·Lᵀ with unit-lower L."""

    symbolic: LdlSymbolic
    l_data: jax.Array  # values in the static CSC pattern (unit diag stored)
    d: jax.Array  # diagonal of D

    @classmethod
    def factor(
        cls, sym: LdlSymbolic, mat: CsMat, *, backend: str = "auto"
    ) -> "LdlNumeric":
        a = mat.to_csr()
        if a.shape != (sym.n, sym.n):
            raise ShapeError("matrix shape differs from symbolic plan")
        if backend == "auto":
            if is_concrete(a.data):
                backend = "host"
            else:
                # traced/device data: prefer the LEVEL-BATCHED
                # MULTIFRONTAL numeric when a plan is feasible — with
                # the round-5 aligned window aggregates it beats the
                # per-pair supernodal schedule at every measured scale
                # (65k: 1.20x, 262k: 1.27x, 1M: 1.47x, same-process
                # A/Bs in benches/results_r5/) — then the supernodal
                # plan, then the sequential row scan for tiny or
                # pathological structures.
                backend = "device"
                if sym.n >= 256:
                    from .ldl_super import SupernodalPlanError

                    try:
                        sym.mf_plan()
                        backend = "mf-batched"
                    except SupernodalPlanError:
                        try:
                            sym.super_plan()
                            backend = "super-batched"
                        except SupernodalPlanError:
                            pass
        if backend == "host":
            lx, d = _numeric_host(sym, np.asarray(a.data, dtype=np.float64))
            # exact f64 compute (golden parity), but STORE in the input
            # dtype: an f64 factor against an f32 rhs made the level
            # solve's scatter downcast f64->f32 (a future JAX error)
            # and gave method='levels' vs 'super' different output
            # dtypes for the same factorization.
            out_dt = np.dtype(a.data.dtype)
            if np.issubdtype(out_dt, np.floating) or np.issubdtype(
                out_dt, np.complexfloating
            ):
                lx = lx.astype(out_dt)
                d = d.astype(out_dt)
            return cls(sym, jnp.asarray(lx), jnp.asarray(d))
        if backend == "supernodal":
            from .ldl_super import numeric_supernodal

            lx, d = numeric_supernodal(sym.super_plan(), a.data)
            return cls(sym, lx, d)
        if backend == "mf":
            from .ldl_mf import numeric_multifrontal

            lx, d = numeric_multifrontal(sym.mf_plan(), a.data)
            return cls(sym, lx, d)
        if backend in ("super-batched", "mf-batched"):
            from .ldl_batched import numeric_batched

            plan = (
                sym.super_plan()
                if backend == "super-batched"
                else sym.mf_plan()
            )
            lx, d = numeric_batched(plan, sym.round_schedule(plan), a.data)
            return cls(sym, lx, d)
        if sym.n * sym.wl > 1 << 28:
            # the scan numeric needs the padded (n, wl) pattern twins —
            # O(n·wl) memory, wl ~ trailing dense-block width under
            # fill-reducing orderings (tens of GB at 10^6 rows).  Fail
            # loudly instead of thrashing the host.
            raise LinalgError(
                f"row-scan numeric needs a {sym.n}x{sym.wl} padded "
                "pattern (too large); use backend='host', an iterative "
                "solver, or a structure the supernodal plan accepts"
            )
        lx, d = _numeric_device(sym, a.data)
        return cls(sym, lx, d)

    # reference API: update() refactorizes with the same pattern
    def update(self, mat: CsMat, *, backend: str = "auto") -> "LdlNumeric":
        return LdlNumeric.factor(self.symbolic, mat, backend=backend)

    # -- factors as matrices -------------------------------------------------
    def l(self) -> CsMat:
        """Unit-lower L as a CSC matrix (diagonal stored)."""
        s = self.symbolic
        return CsMat(
            jnp.asarray(s.l_indptr, INDEX_DTYPE),
            jnp.asarray(s.l_indices, INDEX_DTYPE),
            self.l_data,
            (s.n, s.n),
            CSC,
        )

    def l_csr(self) -> CsMat:
        """L in CSR order via the static value gather (no runtime sort)."""
        s = self.symbolic
        return CsMat(
            jnp.asarray(s.lcsr_indptr, INDEX_DTYPE),
            jnp.asarray(s.lcsr_indices, INDEX_DTYPE),
            self.l_data[jnp.asarray(s.lcsr_gather, INDEX_DTYPE)],
            (s.n, s.n),
            CSR,
        )

    def lt(self) -> CsMat:
        """Lᵀ as CSR: L's CSC arrays with the storage flag flipped."""
        s = self.symbolic
        return CsMat(
            jnp.asarray(s.l_indptr, INDEX_DTYPE),
            jnp.asarray(s.l_indices, INDEX_DTYPE),
            self.l_data,
            (s.n, s.n),
            CSR,
        )

    def d_diag(self) -> jax.Array:
        return self.d

    @property
    def nnz(self) -> int:
        return self.symbolic.nnz

    @property
    def problem_size(self) -> int:
        return self.symbolic.n

    # -- solve (lib.rs:388-410) -------------------------------------------------
    def solve(self, b, *, method: str = "auto") -> jax.Array:
        """``method='levels'``: level-scheduled simplicial solves.
        ``method='super'``: supernodal panel solves — one scan over
        supernodes with (W,W) in-block triangular solves and (MR,W)
        panel matvecs; O(lnz) traffic where the level solve's per-row
        window reaches the trailing dense-block width on fill-reducing
        orderings (measured 865x on a camd factor's solve).
        ``method='flat'``: the O(lnz) entry-stream level solve
        (trisolve ``FlatTriSchedule``) — same level parallelism as
        'levels' without the (level_width × max_row_nnz) padded gather,
        which reaches hundreds of GB of HLO on fill-heavy factors.
        ``'levels'`` escapes to 'flat' automatically past the same
        n·max_row_nnz > 2²⁴ cliff trisolve's auto dispatch uses.
        ``'auto'`` (default) picks 'super' when a panel plan (mf or
        supernodal) is already cached on the symbolic (i.e. the
        factorization itself ran on panels), 'levels' otherwise.  The
        panel solve itself is ROUND-BATCHED when the factor's round
        schedule is cached (the batched backends cache it) AND the
        plan is large enough to amortize the per-round gather floor
        (``S >= ldl_batched.SOLVE_BATCHED_MIN_S``; measured: batched
        x0.29 at 65k/S=968 but x1.04 at 1M/S=15182 — R scan steps only
        beat S steps at scale)."""
        b = jnp.asarray(b)
        s = self.symbolic
        if method == "auto":
            method = (
                "super"
                if s.__dict__.get("_super_plan") is not None
                or s.__dict__.get("_mf_plan") is not None
                else "levels"
            )
        if b.shape[0] != s.n:
            raise ShapeError(f"rhs dim {b.shape} vs n={s.n}")
        # numpy-style promotion: an f64 factor with an f32 rhs solves in
        # f64 (the level path otherwise scatter-downcasts f64 values
        # into the f32 carry — a future JAX error)
        b = b.astype(jnp.result_type(self.l_data.dtype, b.dtype))
        if b.ndim == 2:
            return jax.vmap(
                lambda col: self.solve(col, method=method),
                in_axes=1,
                out_axes=1,
            )(b)
        x = b if s.perm is None else b[jnp.asarray(s.perm.perm)]
        if method == "super":
            from .ldl_super import panels_from_csc, solve_supernodal

            # prefer whichever panel plan the factorization built (the
            # two plan kinds share the solve-facing geometry surface)
            plan = s.__dict__.get("_mf_plan") or s.__dict__.get(
                "_super_plan"
            )
            if plan is None:
                from .ldl_super import SupernodalPlanError

                try:
                    plan = s.mf_plan()
                except SupernodalPlanError:
                    plan = s.super_plan()
            cached = self.__dict__.get("_panels")
            panels = None
            if (
                cached is not None
                and cached[0] == id(plan)
                and cached[1].dtype == self.l_data.dtype
            ):
                panels = cached[1]
            if panels is None:
                panels = panels_from_csc(plan, self.l_data)
                # never cache a tracer (a jitted solve would leak it
                # into later calls); concrete panels amortize across
                # solves
                if is_concrete(panels):
                    object.__setattr__(
                        self, "_panels", (id(plan), panels)
                    )
            sched = (s.__dict__.get("_round_scheds") or {}).get(id(plan))
            from .ldl_batched import SOLVE_BATCHED_MIN_S

            if sched is not None and plan.S >= SOLVE_BATCHED_MIN_S:
                from .ldl_batched import solve_batched

                x = solve_batched(plan, sched, panels, self.d, x)
            else:
                x = solve_supernodal(plan, panels, self.d, x)
        elif method in ("levels", "flat"):
            if method == "levels":
                w = max(
                    int(np.diff(s.lcsr_indptr).max(initial=1)),
                    int(np.diff(s.l_indptr).max(initial=1)),
                )
                if s.n * w > (1 << 24):
                    method = "flat"
            if method == "flat":
                lo, up = s.flat_scheds()
                x = _flat_solve_csr(self.l_csr(), x, lo)
                x = x / self.d
                x = _flat_solve_csr(self.lt(), x, up)
            else:
                x = _level_solve_csr(self.l_csr(), x, s.sched_lower)
                x = x / self.d
                x = _level_solve_csr(self.lt(), x, s.sched_upper)
        else:
            raise ValueError(f"unknown solve method {method!r}")
        if s.perm is not None:
            x = x[jnp.asarray(s.perm.inv)]
        return x


# ---------------------------------------------------------------------------
# builder (lib.rs:76-137 surface)
# ---------------------------------------------------------------------------


FILL_NONE = "none"
FILL_RCM = "rcm"
FILL_CAMD = "camd"  # served by the native AMD implementation when built
FILL_ND = "nd"  # nested dissection — balanced etree for batched schedules


@dataclasses.dataclass
class Ldl:
    """Builder: Ldl().fill_in_reduction('rcm').numeric(mat).solve(b).

    >>> import numpy as np
    >>> import sprs_tpu as st
    >>> from sprs_tpu.linalg import Ldl
    >>> a = st.from_dense(np.array([[4.0, 1.0, 0.0],
    ...                             [1.0, 3.0, 1.0],
    ...                             [0.0, 1.0, 2.0]]))
    >>> num = Ldl().fill_in_reduction('rcm').numeric(a)
    >>> x = np.asarray(num.solve(np.array([5.0, 5.0, 3.0])))
    >>> np.allclose(x, [1.0, 1.0, 1.0], atol=1e-5)
    True
    """

    check_symmetry_flag: bool = True
    check_perm_flag: bool = True
    fill_red_method: str = FILL_NONE
    postorder_flag: Optional[bool] = None  # None = auto (on for camd)

    def check_symmetry(self, flag: bool) -> "Ldl":
        self.check_symmetry_flag = flag
        return self

    def check_perm(self, flag: bool) -> "Ldl":
        self.check_perm_flag = flag
        return self

    def fill_in_reduction(self, method: str) -> "Ldl":
        self.fill_red_method = method
        return self

    def postorder(self, flag: bool) -> "Ldl":
        """Force etree postordering on/off (default: on for 'camd' and
        'nd', whose bushy etrees otherwise defeat supernode
        amalgamation; off otherwise — it composes an extra relabeling
        into the permutation, which exact-factor golden comparisons
        don't expect).  Fill and flops are invariant either way."""
        self.postorder_flag = flag
        return self

    def _perm(self, mat: CsMat) -> Optional[Permutation]:
        if self.fill_red_method == FILL_NONE:
            return None
        if self.fill_red_method == FILL_RCM:
            return reverse_cuthill_mckee(mat).permutation()
        if self.fill_red_method == FILL_CAMD:
            from .amd import camd_order

            return camd_order(mat)
        if self.fill_red_method == FILL_ND:
            from .nd import nd_order

            return nd_order(mat)
        raise ValueError(f"unknown fill-in reduction {self.fill_red_method!r}")

    def symbolic(self, mat: CsMat) -> LdlSymbolic:
        po = self.postorder_flag
        if po is None:
            po = self.fill_red_method in (FILL_CAMD, FILL_ND)
        return LdlSymbolic.from_matrix(
            mat,
            perm=self._perm(mat),
            check_symmetry=self.check_symmetry_flag,
            postorder=po,
        )

    def numeric(self, mat: CsMat, *, backend: str = "auto") -> LdlNumeric:
        return self.symbolic(mat).factor(mat, backend=backend)
