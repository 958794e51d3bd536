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
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        raise NotImplementedError(
            "lobpcg: complex (Hermitian) operators not supported yet"
        )
    n, m = x.shape
    x = _orthonormalize(x)

    def rayleigh(xb):
        ax = a_op(xb)
        lam = jnp.sum(xb * ax, axis=0)
        return ax, lam

    ax, lam = rayleigh(x)
    state = dict(
        x=x,
        p=jnp.zeros_like(x),
        lam=lam,
        res=jnp.full((m,), jnp.inf, x.dtype),
        it=jnp.zeros((), jnp.int32),
    )

    def cond(s):
        return (jnp.max(s["res"]) > tol) & (s["it"] < max_iter)

    def body(s):
        x, p = s["x"], s["p"]
        ax = a_op(x)
        lam = jnp.sum(x * ax, axis=0)
        r = ax - x * lam[None, :]
        res = jnp.linalg.norm(r, axis=0)
        w = m_op(r)
        # Rayleigh-Ritz over span[x, w, p]; qr handles the rank
        # deficiency of p == 0 on the first pass via column pivoting of
        # the zero block being harmless after orthonormalization of the
        # concatenated basis
        S = _orthonormalize(jnp.concatenate([x, w, p], axis=1))
        AS = a_op(S)
        T = S.T @ AS
        T = (T + T.T) / 2
        evals, C = jnp.linalg.eigh(T)
        Cm = C[:, :m]
        x_new = S @ Cm
        # the P direction: the non-X part of the update
        p_new = S @ (Cm - (S.T @ x) @ (x.T @ (S @ Cm)))
        p_norm = jnp.linalg.norm(p_new, axis=0)
        p_new = p_new / jnp.maximum(p_norm, 1e-30)[None, :]
        return dict(
            x=_orthonormalize(x_new),
            p=p_new,
            lam=evals[:m],
            res=res,
            it=s["it"] + 1,
        )

    out = jax.lax.while_loop(cond, body, state)
    x = out["x"]
    ax = a_op(x)
    lam = jnp.sum(x * ax, axis=0)
    order = jnp.argsort(lam)
    x = x[:, order]
    lam = lam[order]
    res = jnp.linalg.norm(ax[:, order] - x * lam[None, :], axis=0)

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
