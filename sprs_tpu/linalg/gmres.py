"""Restarted GMRES(m) with optional right preconditioning.

Completes the Krylov trio (CG for SPD, BiCGSTAB and GMRES for general
systems) — beyond the reference surface, which ships only BiCGSTAB
(bicgstab.rs:95-112).  TPU-idiomatic formulation:

* the Arnoldi basis is a FIXED-SIZE ``(n, m+1)`` array built by a
  ``fori_loop`` whose per-step orthogonalization is classical
  Gram-Schmidt against ALL columns with a ``j``-mask, applied twice
  (CGS2 — the reorthogonalized form has modified-GS-class stability
  but is two dense matvecs instead of a sequential sweep, exactly what
  the MXU wants);
* the small ``(m+1, m)`` least-squares problem is solved once per
  cycle with ``jnp.linalg.lstsq`` (host-free, jittable);
* restart cycles run under ``lax.while_loop`` with convergence checked
  on the TRUE residual (the BiCGSTAB hard-restart discipline,
  bicgstab.rs:162-169).

``precond`` applies M⁻¹ on the right: iterates stay in the original
residual space, so any approximate ILU(0)/IC(0) application works
unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp

from ..errors import ShapeError
from ..formats.csmat import CsMat
from ..formats.csvec import CsVec


@dataclasses.dataclass
class GmresResult:
    x: jax.Array
    converged: Union[bool, jax.Array]
    iterations: Union[int, jax.Array]  # total inner (Arnoldi) steps
    residual_norm: Union[float, jax.Array]


def gmres(
    mat: Union[CsMat, Callable],
    b,
    x0=None,
    *,
    tol: float = 1e-8,
    restart: int = 30,
    max_iter: int = 1000,
    precond: Optional[Callable] = None,
) -> GmresResult:
    """Solve A x = b; ``mat`` may be a CsMat or a matvec callable.

    ``restart`` is the Krylov subspace dimension m; ``max_iter`` bounds
    the TOTAL number of inner steps across cycles."""
    from ._dispatch import as_matvec

    a_op, n = as_matvec(mat)
    m_op = precond if precond is not None else (lambda v: v)

    if isinstance(b, CsVec):
        b = b.to_dense()
    b = jnp.asarray(b)
    if n is not None and b.shape != (n,):
        raise ShapeError(f"rhs shape {b.shape}, expected ({n},)")
    n = b.shape[0]
    if x0 is None:
        x = jnp.zeros_like(b)
    elif isinstance(x0, CsVec):
        x = x0.to_dense()
    else:
        x = jnp.asarray(x0)

    m = int(restart)
    # working dtype promoted across b, x0 AND the operator's output —
    # a complex matrix with a real rhs must not silently cast the
    # Krylov basis to real
    dtype = jnp.result_type(b.dtype, x.dtype, a_op(x).dtype)
    b = b.astype(dtype)
    x = x.astype(dtype)
    real = jnp.finfo(dtype).dtype
    tiny = jnp.asarray(
        1e-300 if real == jnp.float64 else 1e-30, real
    )
    b_norm = jnp.linalg.norm(b)
    threshold = tol * jnp.maximum(b_norm, tiny)

    def cycle(state):
        x, it, _, _ = state
        r = b - a_op(x)
        beta = jnp.linalg.norm(r)
        v0 = r / jnp.maximum(beta, tiny)
        V = jnp.zeros((n, m + 1), dtype).at[:, 0].set(v0)
        H = jnp.zeros((m + 1, m), dtype)
        col = jnp.arange(m + 1)

        def arnoldi(j, carry):
            V, H = carry
            z = m_op(V[:, j])
            w = a_op(z)
            mask = (col <= j).astype(w.real.dtype)
            h1 = (jnp.conjugate(V).T @ w) * mask
            w = w - V @ h1
            h2 = (jnp.conjugate(V).T @ w) * mask  # CGS2 reorthogonalize
            w = w - V @ h2
            h = h1 + h2
            hj1 = jnp.linalg.norm(w)
            H = H.at[:, j].set(h).at[j + 1, j].set(hj1)
            V = V.at[:, j + 1].set(w / jnp.maximum(hj1, tiny))
            return V, H

        V, H = jax.lax.fori_loop(0, m, arnoldi, (V, H))
        rhs = jnp.zeros((m + 1,), dtype).at[0].set(beta)
        y = jnp.linalg.lstsq(H, rhs)[0]
        x_new = x + m_op(V[:, :m] @ y)
        res = jnp.linalg.norm(b - a_op(x_new))
        # a cycle that did not improve keeps the old iterate AND stops
        # the loop: GMRES(m) restarted from the same x is
        # deterministic, so further cycles would be byte-identical
        better = res < jnp.linalg.norm(r)
        x_new = jnp.where(better, x_new, x)
        res = jnp.where(better, res, jnp.linalg.norm(r))
        return x_new, it + m, res, ~better

    def cond(state):
        _, it, res, stalled = state
        return (res > threshold) & (it < max_iter) & (~stalled)

    r0 = jnp.linalg.norm(b - a_op(x))
    state = (x, jnp.zeros((), jnp.int32), r0, jnp.asarray(False))
    x, it, res, _ = jax.lax.while_loop(cond, cycle, state)

    from ..formats.util import is_concrete

    if is_concrete(res):
        return GmresResult(
            x=x,
            converged=bool(res <= threshold),
            iterations=int(it),
            residual_norm=float(res),
        )
    return GmresResult(
        x=x,
        converged=res <= threshold,
        iterations=it,
        residual_norm=res,
    )
