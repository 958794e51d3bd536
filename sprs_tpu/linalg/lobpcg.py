"""LOBPCG: smallest eigenpairs of a symmetric (SPD-ish) operator.

Beyond the reference surface (sprs has no eigensolver).  Locally
optimal block preconditioned conjugate gradient (Knyazev 2001) is the
natural sparse eigensolver for this framework: per iteration it is one
block SpMM plus small dense algebra — the SpMM rides the structure
dispatch (DIA/ELL/BSR) and the (n, 3m) Rayleigh–Ritz projections are
MXU matmuls; everything is fixed-shape and jittable
(``lax.while_loop`` + ``jnp.linalg.eigh`` on the 3m×3m projected
problem).  ``precond`` applies M⁻¹ (e.g. :class:`~sprs_tpu.linalg.Ic0`)
to the residual block.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp

from ..formats.csmat import CsMat


@dataclasses.dataclass
class LobpcgResult:
    eigenvalues: jax.Array  # (m,) ascending
    eigenvectors: jax.Array  # (n, m)
    iterations: Union[int, jax.Array]
    residual_norms: jax.Array  # (m,)
    converged: Union[bool, jax.Array]


def _orthonormalize(S):
    q, _ = jnp.linalg.qr(S)
    return q


def lobpcg(
    mat: Union[CsMat, Callable],
    x0,
    *,
    tol: float = 1e-6,
    max_iter: int = 200,
    precond: Optional[Callable] = None,
) -> LobpcgResult:
    """Smallest ``m`` eigenpairs of symmetric A; ``x0`` is the (n, m)
    starting block (its column count sets m)."""
    from ._dispatch import as_matvec

    a_op, _ = as_matvec(mat, multi_rhs=True)
    m_op = precond if precond is not None else (lambda v: v)

    x = jnp.asarray(x0)
    n, m = x.shape
    rdtype = jnp.zeros((), x.dtype).real.dtype  # Ritz values are real
    x = _orthonormalize(x)

    def rayleigh(xb):
        # Hermitian Rayleigh quotients: xᴴ A x is real for symmetric /
        # Hermitian A; taking the real part also guards f32 noise.
        ax = a_op(xb)
        lam = jnp.sum(jnp.conj(xb) * ax, axis=0).real.astype(rdtype)
        return ax, lam

    ax, lam = rayleigh(x)
    state = dict(
        x=x,
        p=jnp.zeros_like(x),
        lam=lam,
        res=jnp.full((m,), jnp.inf, rdtype),
        it=jnp.zeros((), jnp.int32),
    )

    def cond(s):
        return (jnp.max(s["res"]) > tol) & (s["it"] < max_iter)

    def body(s):
        x, p = s["x"], s["p"]
        ax = a_op(x)
        lam = jnp.sum(jnp.conj(x) * ax, axis=0).real.astype(rdtype)
        r = ax - x * lam[None, :]
        res = jnp.linalg.norm(r, axis=0).astype(rdtype)
        w = m_op(r)
        # Rayleigh-Ritz over span[x, w, p]; qr handles the rank
        # deficiency of p == 0 on the first pass via column pivoting of
        # the zero block being harmless after orthonormalization of the
        # concatenated basis
        S = _orthonormalize(jnp.concatenate([x, w, p], axis=1))
        AS = a_op(S)
        Sh = jnp.conj(S.T)
        T = Sh @ AS
        T = (T + jnp.conj(T.T)) / 2  # Hermitian projection
        evals, C = jnp.linalg.eigh(T)
        Cm = C[:, :m]
        x_new = S @ Cm
        # the P direction: the non-X part of the update
        xh = jnp.conj(x.T)
        p_new = S @ (Cm - (Sh @ x) @ (xh @ (S @ Cm)))
        p_norm = jnp.linalg.norm(p_new, axis=0)
        p_new = p_new / jnp.maximum(p_norm, 1e-30)[None, :]
        return dict(
            x=_orthonormalize(x_new),
            p=p_new,
            lam=evals[:m].astype(rdtype),
            res=res,
            it=s["it"] + 1,
        )

    out = jax.lax.while_loop(cond, body, state)
    x = out["x"]
    ax, lam = rayleigh(x)
    order = jnp.argsort(lam)
    x = x[:, order]
    lam = lam[order]
    res = jnp.linalg.norm(ax[:, order] - x * lam[None, :], axis=0).astype(
        rdtype
    )

    from ..formats.util import is_concrete

    if is_concrete(res):
        return LobpcgResult(
            eigenvalues=lam,
            eigenvectors=x,
            iterations=int(out["it"]),
            residual_norms=res,
            converged=bool(jnp.max(res) <= tol),
        )
    return LobpcgResult(
        eigenvalues=lam,
        eigenvectors=x,
        iterations=out["it"],
        residual_norms=res,
        converged=jnp.max(res) <= tol,
    )
