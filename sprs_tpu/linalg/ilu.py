"""Incomplete factorizations: ILU(0) and IC(0) preconditioners.

Beyond the reference surface (sprs ships only unpreconditioned BiCGSTAB,
bicgstab.rs:95-112): zero-fill incomplete LU / Cholesky on the host with
jit-compatible level-scheduled application on device, following this
framework's host-symbolic/device-numeric split (CLAUDE.md).  The factor
pattern equals the input pattern, so the host numeric is one sweep over
the CSR arrays; the triangular solves reuse
:mod:`sprs_tpu.linalg.trisolve`'s level scheduling, making ``M⁻¹ r``
a fixed sequence of batched device sweeps inside ``jax.jit``/
``lax.while_loop`` solver iterations (CG/BiCGSTAB).

Algorithm (IKJ ILU(0), Saad, Iterative Methods §10.3): for each row i,
for each k < i in pattern(i): a_ik /= u_kk, then for j > k in
pattern(i) ∩ pattern(k): a_ij -= a_ik · u_kj.  IC(0) is the symmetric
restriction producing A ≈ L·Lᵀ.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import NonSquareMatrixError, SingularMatrixError
from ..formats.csmat import CsMat, csmat
from .trisolve import TriSchedule, build_schedule, lsolve, usolve


def _ilu0_host(indptr, indices, data):
    """In-place ILU(0) numeric on CSR arrays (host numpy).

    Returns the combined factor values (L strictly-lower with implicit
    unit diagonal, U upper including diagonal) in A's own pattern."""
    n = indptr.shape[0] - 1
    vals = data.copy()
    diag_pos = np.full(n, -1, np.int64)
    for i in range(n):
        lo, hi = indptr[i], indptr[i + 1]
        cols = indices[lo:hi]
        pos = np.searchsorted(cols, i)
        if pos < hi - lo and cols[pos] == i:
            diag_pos[i] = lo + pos
    if (diag_pos < 0).any():
        missing = int(np.nonzero(diag_pos < 0)[0][0])
        raise SingularMatrixError(
            f"ilu0: structurally zero diagonal at row {missing}"
        )
    for i in range(n):
        lo, hi = int(indptr[i]), int(indptr[i + 1])
        cols = indices[lo:hi]
        for t in range(lo, hi):
            k = int(indices[t])
            if k >= i:
                break
            ukk = vals[diag_pos[k]]
            if ukk == 0:
                raise SingularMatrixError(f"ilu0: zero pivot at row {k}")
            lik = vals[t] / ukk
            vals[t] = lik
            # row k's upper part folds into row i where patterns meet
            for s in range(diag_pos[k] + 1, int(indptr[k + 1])):
                j = int(indices[s])
                p = np.searchsorted(cols, j)
                if p < hi - lo and cols[p] == j:
                    vals[lo + p] -= lik * vals[s]
    return vals, diag_pos


def _ic0_host(indptr, indices, data):
    """IC(0) on the LOWER triangle pattern of an SPD matrix: returns L
    values (CSR lower incl diagonal) with pattern = lower(A)."""
    n = indptr.shape[0] - 1
    vals = data.copy()
    diag_pos = np.empty(n, np.int64)
    for i in range(n):
        lo, hi = int(indptr[i]), int(indptr[i + 1])
        if hi == lo or indices[hi - 1] != i:
            raise SingularMatrixError(
                f"ic0: row {i} has no diagonal entry"
            )
        diag_pos[i] = hi - 1
        cols = indices[lo:hi]
        for t in range(lo, hi - 1):
            k = int(indices[t])
            # l_ik = (a_ik - sum_{j<k, j in both} l_ij l_kj) / l_kk
            # NB: sequential accumulation in ascending-column order so
            # the C++ fast path (sprs_ic0) is bit-identical
            s = 0.0
            klo, khi = int(indptr[k]), int(indptr[k + 1])
            kcols = indices[klo : khi - 1]
            common = np.intersect1d(
                cols[: t - lo], kcols, assume_unique=True
            )
            if common.size:
                pi = lo + np.searchsorted(cols, common)
                pk = klo + np.searchsorted(kcols, common)
                for a_, b_ in zip(vals[pi], vals[pk]):
                    s += float(a_) * float(b_)
            lkk = vals[diag_pos[k]]
            vals[t] = (vals[t] - s) / lkk
        d = float(vals[hi - 1])
        for p in range(lo, hi - 1):
            d -= float(vals[p]) * float(vals[p])
        if d <= 0:
            raise SingularMatrixError(
                f"ic0: non-positive pivot at row {i} (matrix not SPD "
                "enough for zero-fill factorization)"
            )
        vals[hi - 1] = np.sqrt(d)
    return vals


@dataclasses.dataclass
class Ilu0:
    """ILU(0) preconditioner: A ≈ L·U with pattern(L+U) = pattern(A).

    ``solve`` applies M⁻¹ = U⁻¹·L⁻¹ via level-scheduled device sweeps
    (jit-compatible once constructed)."""

    l: CsMat
    u: CsMat
    l_schedule: TriSchedule
    u_schedule: TriSchedule

    @classmethod
    def factor(cls, mat: CsMat) -> "Ilu0":
        if mat.shape[0] != mat.shape[1]:
            raise NonSquareMatrixError(f"ilu0 needs square, got {mat.shape}")
        a = mat.to_csr().compact()
        indptr = np.asarray(a.indptr)
        indices = np.asarray(a.indices)
        data = np.asarray(a.data)
        nnz = int(indptr[-1])
        vals = None
        if data.dtype == np.float64:
            # C++ fast path (native/src/sprs_host.cpp::sprs_ilu0);
            # same IKJ sweep in the same order -> bit-identical to the
            # numpy fallback (tests/test_precond.py parity test)
            from .. import native

            try:
                vals = native.ilu0_numeric(
                    indptr, indices[:nnz], data[:nnz]
                )
            except ValueError as e:
                raise SingularMatrixError(str(e)) from None
        if vals is None:
            vals, _ = _ilu0_host(indptr, indices[:nnz], data[:nnz])
        n = a.shape[0]
        rows = np.repeat(np.arange(n), np.diff(indptr))
        lower = indices[:nnz] < rows
        upper = ~lower
        # L: strictly-lower entries + explicit unit diagonal
        l_rows = np.concatenate([rows[lower], np.arange(n)])
        l_cols = np.concatenate([indices[:nnz][lower], np.arange(n)])
        l_vals = np.concatenate(
            [vals[lower], np.ones(n, vals.dtype)]
        )
        order = np.lexsort((l_cols, l_rows))
        l_indptr = np.zeros(n + 1, np.int64)
        np.add.at(l_indptr, l_rows + 1, 1)
        l_indptr = np.cumsum(l_indptr)
        lmat = csmat(
            (n, n),
            jnp.asarray(l_indptr.astype(np.int32)),
            jnp.asarray(l_cols[order].astype(np.int32)),
            jnp.asarray(l_vals[order]),
        )
        u_rows = rows[upper]
        u_indptr = np.zeros(n + 1, np.int64)
        np.add.at(u_indptr, u_rows + 1, 1)
        u_indptr = np.cumsum(u_indptr)
        umat = csmat(
            (n, n),
            jnp.asarray(u_indptr.astype(np.int32)),
            jnp.asarray(indices[:nnz][upper].astype(np.int32)),
            jnp.asarray(vals[upper]),
        )
        return cls(
            l=lmat,
            u=umat,
            l_schedule=build_schedule(lmat, lower=True),
            u_schedule=build_schedule(umat, lower=False),
        )

    def solve(self, r) -> jax.Array:
        """M⁻¹ r = U⁻¹ (L⁻¹ r)."""
        y = lsolve(
            self.l, r, method="levels", schedule=self.l_schedule
        )
        return usolve(
            self.u, y, method="levels", schedule=self.u_schedule
        )

    def __call__(self, r) -> jax.Array:
        return self.solve(r)


@dataclasses.dataclass
class Ic0:
    """IC(0) preconditioner for SPD systems: A ≈ L·Lᵀ."""

    l: CsMat
    lt: CsMat
    l_schedule: TriSchedule
    lt_schedule: TriSchedule

    @classmethod
    def factor(cls, mat: CsMat) -> "Ic0":
        if mat.shape[0] != mat.shape[1]:
            raise NonSquareMatrixError(f"ic0 needs square, got {mat.shape}")
        a = mat.to_csr().compact()
        indptr = np.asarray(a.indptr)
        indices = np.asarray(a.indices)
        data = np.asarray(a.data)
        nnz = int(indptr[-1])
        n = a.shape[0]
        # restrict to the lower triangle (incl diagonal)
        rows = np.repeat(np.arange(n), np.diff(indptr))
        keep = indices[:nnz] <= rows
        l_rows = rows[keep]
        l_indptr = np.zeros(n + 1, np.int64)
        np.add.at(l_indptr, l_rows + 1, 1)
        l_indptr = np.cumsum(l_indptr)
        l_cols = indices[:nnz][keep]
        l_data = data[:nnz][keep]
        vals = None
        if l_data.dtype == np.float64:
            from .. import native

            try:
                vals = native.ic0_numeric(l_indptr, l_cols, l_data)
            except ValueError as e:
                raise SingularMatrixError(str(e)) from None
        if vals is None:
            vals = _ic0_host(l_indptr, l_cols, l_data)
        lmat = csmat(
            (n, n),
            jnp.asarray(l_indptr.astype(np.int32)),
            jnp.asarray(indices[:nnz][keep].astype(np.int32)),
            jnp.asarray(vals),
        )
        ltmat = lmat.T.to_csr().compact()
        return cls(
            l=lmat,
            lt=ltmat,
            l_schedule=build_schedule(lmat, lower=True),
            lt_schedule=build_schedule(ltmat, lower=False),
        )

    def solve(self, r) -> jax.Array:
        y = lsolve(
            self.l, r, method="levels", schedule=self.l_schedule
        )
        return usolve(
            self.lt, y, method="levels", schedule=self.lt_schedule
        )

    def __call__(self, r) -> jax.Array:
        return self.solve(r)


def ilu0(mat: CsMat) -> Ilu0:
    """Factor an ILU(0) preconditioner (host numeric, device solves)."""
    return Ilu0.factor(mat)


def ic0(mat: CsMat) -> Ic0:
    """Factor an IC(0) preconditioner for an SPD matrix."""
    return Ic0.factor(mat)
