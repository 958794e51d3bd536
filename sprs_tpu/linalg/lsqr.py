"""LSQR: iterative least squares / minimum-norm solutions.

Beyond the reference surface.  Paige–Saunders Golub–Kahan
bidiagonalization needs one ``A v`` and one ``Aᵀ u`` per step — and in
this framework the transpose is METADATA (csmat.rs:966-991 trick), so
both directions ride the same structure-dispatched kernels with zero
conversion cost.  Solves ``min ‖A x − b‖₂`` for any (possibly
rectangular) A; fully jittable ``lax.while_loop``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple, Union

import jax
import jax.numpy as jnp

from ..errors import ShapeError
from ..formats.csmat import CsMat


@dataclasses.dataclass
class LsqrResult:
    x: jax.Array
    iterations: Union[int, jax.Array]
    residual_norm: Union[float, jax.Array]  # ‖b − A x‖
    atr_norm: Union[float, jax.Array]  # ‖Aᵀ(b − A x)‖ (normal-eq resid)
    converged: Union[bool, jax.Array]


def lsqr(
    mat: Union[CsMat, Tuple[Callable, Callable]],
    b,
    *,
    tol: float = 1e-8,
    max_iter: int = 1000,
) -> LsqrResult:
    """min ‖A x − b‖.  ``mat`` is a CsMat, or a pair of callables
    ``(matvec, rmatvec)`` applying A and Aᵀ (Aᴴ for complex A).

    Complex systems are supported: the Golub–Kahan recurrence keeps all
    rotation scalars (α, β, ρ, c, s, φ) real — only the Krylov vectors
    are complex — so the update algebra below is dtype-agnostic."""
    b = jnp.asarray(b)
    if isinstance(mat, CsMat):
        from ._dispatch import as_matvec

        a_mat = mat
        if jnp.issubdtype(b.dtype, jnp.complexfloating) or jnp.issubdtype(
            jnp.result_type(mat.data.dtype), jnp.complexfloating
        ):
            ah_mat = mat.T.to_csr().map(jnp.conj)  # Aᴴ
        else:
            ah_mat = mat.T.to_csr()
        a_op, _ = as_matvec(a_mat, square=False)
        at_op, _ = as_matvec(ah_mat, square=False)
        rows, cols = mat.shape
    else:
        a_op, at_op = mat
        rows = cols = None

    if rows is not None and b.shape != (rows,):
        raise ShapeError(f"rhs shape {b.shape}, expected ({rows},)")
    dtype = b.dtype
    rdtype = jnp.zeros((), dtype).real.dtype  # real twin for the scalars
    tiny = jnp.asarray(
        1e-300 if rdtype == jnp.float64 else 1e-30, rdtype
    )

    beta1 = jnp.linalg.norm(b)
    u = b / jnp.maximum(beta1, tiny)
    v0 = at_op(u)
    alpha1 = jnp.linalg.norm(v0)
    v = v0 / jnp.maximum(alpha1, tiny)
    x = jnp.zeros_like(v)
    threshold = tol * jnp.maximum(beta1, tiny)
    atr_threshold = tol * jnp.maximum(alpha1 * beta1, tiny)

    state = dict(
        x=x,
        u=u,
        v=v,
        w=v,
        alpha=alpha1,
        phibar=beta1,
        rhobar=alpha1,
        it=jnp.zeros((), jnp.int32),
        resid=beta1,
        atr=alpha1 * beta1,
    )

    def cond(s):
        return (
            (s["resid"] > threshold)
            & (s["atr"] > atr_threshold)
            & (s["it"] < max_iter)
        )

    def body(s):
        u = a_op(s["v"]) - s["alpha"] * s["u"]
        beta = jnp.linalg.norm(u)
        u = u / jnp.maximum(beta, tiny)
        v = at_op(u) - beta * s["v"]
        alpha = jnp.linalg.norm(v)
        v = v / jnp.maximum(alpha, tiny)

        rho = jnp.sqrt(s["rhobar"] ** 2 + beta**2)
        c = s["rhobar"] / jnp.maximum(rho, tiny)
        sn = beta / jnp.maximum(rho, tiny)
        theta = sn * alpha
        rhobar = -c * alpha
        phi = c * s["phibar"]
        phibar = sn * s["phibar"]

        x = s["x"] + (phi / jnp.maximum(rho, tiny)) * s["w"]
        w = v - (theta / jnp.maximum(rho, tiny)) * s["w"]
        return dict(
            x=x,
            u=u,
            v=v,
            w=w,
            alpha=alpha,
            phibar=phibar,
            rhobar=rhobar,
            it=s["it"] + 1,
            resid=phibar,
            atr=phibar * alpha * jnp.abs(c),
        )

    out = jax.lax.while_loop(cond, body, state)
    x = out["x"]
    r = b - a_op(x)
    resid = jnp.linalg.norm(r)
    atr = jnp.linalg.norm(at_op(r))

    from ..formats.util import is_concrete

    if is_concrete(resid):
        return LsqrResult(
            x=x,
            iterations=int(out["it"]),
            residual_norm=float(resid),
            atr_norm=float(atr),
            converged=bool(
                (resid <= threshold) | (atr <= atr_threshold)
            ),
        )
    return LsqrResult(
        x=x,
        iterations=out["it"],
        residual_norm=resid,
        atr_norm=atr,
        converged=(resid <= threshold) | (atr <= atr_threshold),
    )
