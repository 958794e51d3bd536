"""Sparse LU factorization with partial pivoting (UMFPACK-class).

The reference exposes LU through an optional C binding
(/root/reference/suitesparse_bindings/sprs_suitesparse_umfpack/src/lib.rs:48-120:
symbolic+numeric handles, ``solve``, and extraction of L (CSC), U (CSR),
row/col permutations and row scaling).  This module is the TPU-native
equivalent with the same split the rest of the solver layer uses:

* **Factorization on the host** — a left-looking Gilbert–Peierls LU with
  threshold partial pivoting and optional max-abs row scaling.  Sparse
  factorization is a sequential, data-dependent graph algorithm; like
  UMFPACK itself it belongs on the host, not the accelerator.
* **Solves on the device** — L and U come back as CsMat pytrees with
  precomputed level schedules (linalg/trisolve.py), so ``solve`` is
  jittable and batched solves amortize the one-time symbolic cost, the
  same way LdlNumeric.update/solve amortizes (sprs-ldl/src/lib.rs:361-410).

Conventions (matching UMFPACK): ``P R A Q = L U`` where P is the row
permutation chosen by pivoting, R the diagonal row scaling, Q an optional
fill-reducing column permutation, L unit-lower-triangular, U
upper-triangular.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import NonSquareMatrixError, SingularMatrixError
from ..formats.csmat import CSC, CsMat, csmat
from ..ops.permutation import Permutation
from .trisolve import TriSchedule, build_schedule, lsolve, usolve


def _lu_gilbert_peierls(
    indptr: np.ndarray,
    indices: np.ndarray,
    data: np.ndarray,
    n: int,
    pivot_threshold: float,
):
    """Left-looking sparse LU, one column at a time.

    For column k: solve L y = A[:,k] on the symbolic reach (DFS through
    the partially-built L, Gilbert & Peierls 1988 — the same reach used
    by the sparse-RHS trisolve, trisolve.rs:286-358), then pick the pivot
    row among not-yet-pivoted entries by threshold partial pivoting.

    Returns (L, U) in column-major python lists plus the row permutation
    ``perm_r`` (perm_r[i] = original row of pivoted row i).
    """
    pinv = np.full(n, -1, dtype=np.int64)  # original row -> pivot position
    perm_r = np.full(n, -1, dtype=np.int64)
    # L columns in pivot-position row space; diag (==1) implicit.
    l_rows, l_vals = [], []  # per column: arrays
    u_rows, u_vals = [], []
    x = np.zeros(n, dtype=data.dtype)  # dense work, original row space

    for k in range(n):
        col = slice(indptr[k], indptr[k + 1])
        a_rows = indices[col]
        a_vals = data[col]

        # --- symbolic: reach of a_rows through pivoted columns of L ----
        visited = np.zeros(n, dtype=bool)
        topo: list = []
        for s in a_rows:
            s = int(s)
            if visited[s]:
                continue
            stack = [(s, 0)]
            visited[s] = True
            while stack:
                node, it = stack.pop()
                j = pinv[node]
                pushed = False
                if j >= 0:
                    rows_j = l_rows[j]
                    while it < len(rows_j):
                        nxt = int(rows_j[it])
                        it += 1
                        if not visited[nxt]:
                            visited[nxt] = True
                            stack.append((node, it))
                            stack.append((nxt, 0))
                            pushed = True
                            break
                if not pushed:
                    topo.append(node)
        topo.reverse()

        # --- numeric: x = A[:,k]; for pivoted j in topo order eliminate -
        x[a_rows] = a_vals
        for node in topo:
            j = pinv[node]
            if j < 0:
                continue
            xj = x[node]
            if xj != 0:
                x[l_rows[j]] -= l_vals[j] * xj

        # --- pivot among unpivoted entries of the reach ----------------
        cand = [r for r in topo if pinv[r] < 0]
        if not cand:
            raise SingularMatrixError(f"structurally singular at column {k}")
        cand = np.asarray(cand)
        absx = np.abs(x[cand])
        max_abs = absx.max()
        if max_abs == 0:
            raise SingularMatrixError(f"numerically singular at column {k}")
        # prefer the diagonal when within threshold of the max
        pivot = int(cand[int(np.argmax(absx))])
        if pivot_threshold < 1.0 and pinv[k] < 0 and k in cand:
            if abs(x[k]) >= pivot_threshold * max_abs:
                pivot = k
        pv = x[pivot]

        pinv[pivot] = k
        perm_r[k] = pivot

        urows, uvals_k = [], []
        lrows, lvals_k = [], []
        for node in topo:
            v = x[node]
            x[node] = 0
            if v == 0:
                continue
            j = pinv[node]
            if j >= 0 and node != pivot:
                urows.append(j)
                uvals_k.append(v)
            elif node != pivot:
                lrows.append(node)
                lvals_k.append(v / pv)
        urows.append(k)
        uvals_k.append(pv)
        order = np.argsort(urows)
        u_rows.append(np.asarray(urows, dtype=np.int64)[order])
        u_vals.append(np.asarray(uvals_k, dtype=data.dtype)[order])
        l_rows.append(np.asarray(lrows, dtype=np.int64))
        l_vals.append(np.asarray(lvals_k, dtype=data.dtype))

    # renumber L rows into pivot positions (now all assigned)
    l_rows = [pinv[r] for r in l_rows]
    return l_rows, l_vals, u_rows, u_vals, perm_r


def _cols_to_csc(cols_rows, cols_vals, n, dtype, unit_diag: bool):
    """Assemble per-column (rows, vals) lists into CSC arrays."""
    counts = np.array(
        [len(r) + (1 if unit_diag else 0) for r in cols_rows], dtype=np.int64
    )
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    nnz = int(indptr[-1])
    indices = np.empty(nnz, dtype=np.int64)
    data = np.empty(nnz, dtype=dtype)
    for k in range(n):
        lo = indptr[k]
        rows = cols_rows[k]
        vals = cols_vals[k]
        if unit_diag:
            indices[lo] = k
            data[lo] = 1
            lo += 1
        order = np.argsort(rows)
        indices[lo : lo + len(rows)] = np.asarray(rows)[order]
        data[lo : lo + len(rows)] = np.asarray(vals)[order]
    return indptr, indices, data


@dataclasses.dataclass
class SpLu:
    """LU factorization context: ``P R A Q = L U``.

    Mirrors the UMFPACK wrapper surface
    (sprs_suitesparse_umfpack/src/lib.rs:48-120): ``l()``/``u()`` extract
    the factors, ``row_perm``/``col_perm`` the permutations, ``scale``
    the row scaling; ``solve`` runs on device via level-scheduled
    triangular solves.
    """

    _l: CsMat
    _u: CsMat
    row_perm: Permutation
    col_perm: Permutation
    scale: jax.Array  # R diagonal (1.0 when scaling disabled)
    _l_sched: TriSchedule
    _u_sched: TriSchedule

    def l(self) -> CsMat:  # noqa: E743
        return self._l

    def u(self) -> CsMat:
        return self._u

    @property
    def shape(self):
        return self._l.shape

    def lu_nnz(self) -> Tuple[int, int]:
        """(nnz(L), nnz(U)) — the get_lunz analog."""
        return int(self._l.nnz), int(self._u.nnz)

    def solve(self, b) -> jax.Array:
        """x with A x = b: x = Q · U⁻¹ L⁻¹ P R b.  Jittable."""
        b = jnp.asarray(b)
        rb = self.scale * b if b.ndim == 1 else self.scale[:, None] * b
        pb = rb[jnp.asarray(self.row_perm.perm)]
        y = lsolve(self._l, pb, schedule=self._l_sched)
        z = usolve(self._u, y, schedule=self._u_sched)
        inv_q = jnp.asarray(self.col_perm.perm)
        if b.ndim == 1:
            return jnp.zeros_like(z).at[inv_q].set(z)
        return jnp.zeros_like(z).at[inv_q].set(z)

    def solve_transposed(self, b) -> jax.Array:
        """x with Aᵀ x = b.  From A = R⁻¹ Pᵀ L U Qᵀ:
        Aᵀ = Q Uᵀ Lᵀ P R⁻¹, so x = R · Pᵀ · L⁻ᵀ · U⁻ᵀ · Qᵀ b.
        Jittable; schedules for the transposed sweeps are built lazily
        and cached (same amortization as the forward pair)."""
        b = jnp.asarray(b)
        if not hasattr(self, "_ut_sched"):
            # Uᵀ is lower-triangular: U's CSC arrays with the storage
            # flag flipped (O(1) transpose)
            object.__setattr__(
                self, "_ut_sched", build_schedule(self._u.T, lower=True)
            )
            object.__setattr__(
                self, "_lt_sched", build_schedule(self._l.T, lower=False)
            )
        qb = b[jnp.asarray(self.col_perm.perm)] if b.ndim == 1 else b[
            jnp.asarray(self.col_perm.perm), :
        ]
        w = lsolve(self._u.T, qb, schedule=self._ut_sched)
        v = usolve(self._l.T, w, schedule=self._lt_sched)
        p = jnp.asarray(self.row_perm.perm)
        out = jnp.zeros_like(v)
        if b.ndim == 1:
            out = out.at[p].set(v)
            return self.scale * out
        out = out.at[p, :].set(v)
        return self.scale[:, None] * out

    def det(self) -> jax.Array:
        """Determinant from the factorization: ±prod(diag U)/prod(R)."""
        sign_p = _perm_sign(np.asarray(self.row_perm.perm))
        sign_q = _perm_sign(np.asarray(self.col_perm.perm))
        return (
            sign_p
            * sign_q
            * jnp.prod(self._u.diag())
            / jnp.prod(self.scale)
        )


def _perm_sign(p: np.ndarray) -> float:
    n = len(p)
    seen = np.zeros(n, dtype=bool)
    sign = 1.0
    for i in range(n):
        if seen[i]:
            continue
        j, ln = i, 0
        while not seen[j]:
            seen[j] = True
            j = p[j]
            ln += 1
        if ln % 2 == 0:
            sign = -sign
    return sign


def splu(
    mat: CsMat,
    *,
    col_perm: Optional[str] = None,
    scale: bool = True,
    pivot_threshold: float = 0.1,
) -> SpLu:
    """Factor a square sparse matrix: P R A Q = L U.

    ``col_perm``: None (natural) or "min_degree" (fill-reducing column
    pre-ordering on the A+Aᵀ pattern, the CAMD-class option the reference
    treats as an upgrade, sprs-ldl/src/lib.rs:148-161).
    ``pivot_threshold``: 1.0 = strict partial pivoting; smaller values
    prefer the diagonal when it is within the threshold of the column
    max (UMFPACK-style sparsity-preserving pivoting).
    """
    if mat.shape[0] != mat.shape[1]:
        raise NonSquareMatrixError(f"LU needs a square matrix, got {mat.shape}")
    n = mat.shape[0]
    dtype = np.asarray(mat.data).dtype

    # column pre-ordering
    if col_perm == "min_degree":
        from .amd import camd_order

        q = np.asarray(camd_order(mat).perm).astype(np.int64)
    elif col_perm is None or col_perm == "natural":
        q = np.arange(n, dtype=np.int64)
    else:
        raise ValueError(f"unknown col_perm {col_perm!r}")

    csc = mat.to_csc()
    nnz = int(csc.nnz)
    indptr = np.asarray(csc.indptr).astype(np.int64)
    indices = np.asarray(csc.indices)[:nnz].astype(np.int64)
    data = np.asarray(csc.data)[:nnz].astype(
        np.float64 if dtype.kind == "f" else dtype
    )

    # row scaling R = 1/max|row|
    if scale:
        rmax = np.zeros(n, dtype=np.float64)
        np.maximum.at(rmax, indices, np.abs(data))
        if np.any(rmax == 0):
            raise SingularMatrixError(
                f"zero row at index {int(np.argmax(rmax == 0))}"
            )
        r = 1.0 / rmax
    else:
        r = np.ones(n, dtype=np.float64)

    # apply Q (column gather) and R (row scale) to build the work matrix
    qptr = np.zeros(n + 1, dtype=np.int64)
    qcounts = indptr[1:] - indptr[:-1]
    np.cumsum(qcounts[q], out=qptr[1:])
    qidx = np.empty(nnz, dtype=np.int64)
    qdat = np.empty(nnz, dtype=data.dtype)
    for kk in range(n):
        src = slice(indptr[q[kk]], indptr[q[kk] + 1])
        dst = slice(qptr[kk], qptr[kk + 1])
        qidx[dst] = indices[src]
        qdat[dst] = data[src] * r[indices[src]]

    # native C++ fast path (float64), numpy fallback otherwise
    native_out = None
    if data.dtype == np.float64:
        from .. import native

        try:
            native_out = native.lu(qptr, qidx, qdat, n, pivot_threshold)
        except ValueError as e:  # singular:<col>
            col = int(str(e).split(":")[1])
            raise SingularMatrixError(f"singular at column {col}") from None
    if native_out is not None:
        li, lx, ld, ui, ux, ud, perm_r = native_out
        perm_r = perm_r.astype(np.int64)
    else:
        l_rows, l_vals, u_rows, u_vals, perm_r = _lu_gilbert_peierls(
            qptr, qidx, qdat, n, pivot_threshold
        )
        li, lx, ld = _cols_to_csc(
            l_rows, l_vals, n, data.dtype, unit_diag=True
        )
        ui, ux, ud = _cols_to_csc(
            u_rows, u_vals, n, data.dtype, unit_diag=False
        )
    out_dtype = dtype
    l_mat = csmat(
        (n, n), li, lx, ld.astype(out_dtype), storage=CSC, validate=False
    )
    u_mat = csmat(
        (n, n), ui, ux, ud.astype(out_dtype), storage=CSC, validate=False
    )
    return SpLu(
        _l=l_mat,
        _u=u_mat,
        row_perm=Permutation.from_array(perm_r.astype(np.int32)),
        col_perm=Permutation.from_array(q.astype(np.int32)),
        scale=jnp.asarray(r.astype(out_dtype)),
        _l_sched=build_schedule(l_mat, lower=True),
        _u_sched=build_schedule(u_mat, lower=False),
    )
