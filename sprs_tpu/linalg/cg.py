"""Conjugate gradient (optionally preconditioned) for SPD systems.

Beyond the reference surface (sprs ships only BiCGSTAB,
bicgstab.rs:95-112); CG is the natural partner of this library's SPD
stack (LDLᵀ, IC(0), grid Laplacians).  Fully jittable
``lax.while_loop`` with the same structure-dispatched SpMV as
:func:`sprs_tpu.linalg.bicgstab` (banded systems ride the DIA Pallas
path), convergence on the relative residual, and an optional
``precond`` callable applying M⁻¹ (e.g. :class:`sprs_tpu.linalg.Ic0`).
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
class CgResult:
    x: jax.Array
    converged: Union[bool, jax.Array]
    iterations: Union[int, jax.Array]
    residual_norm: Union[float, jax.Array]


def cg(
    mat: Union[CsMat, Callable],
    b,
    x0=None,
    *,
    tol: float = 1e-8,
    max_iter: int = 1000,
    precond: Optional[Callable] = None,
) -> CgResult:
    """Solve A x = b for SPD A; ``mat`` may be a CsMat or a matvec
    callable.  ``precond`` applies M⁻¹ (must also be SPD)."""
    from ._dispatch import as_matvec

    a_op, n = as_matvec(mat)
    m_op = precond if precond is not None else (lambda v: v)

    if isinstance(b, CsVec):
        b = b.to_dense()
    b = jnp.asarray(b)
    if n is not None and b.shape != (n,):
        raise ShapeError(f"rhs shape {b.shape}, expected ({n},)")
    if x0 is None:
        x = jnp.zeros_like(b)
    elif isinstance(x0, CsVec):
        x = x0.to_dense()
    else:
        x = jnp.asarray(x0)

    b_norm = jnp.linalg.norm(b)
    threshold = tol * jnp.maximum(b_norm, jnp.asarray(1e-300, b.dtype))

    r0 = b - a_op(x)
    z0 = m_op(r0)
    state = dict(
        x=x,
        r=r0,
        z=z0,
        p=z0,
        rz=jnp.vdot(r0, z0).real.astype(b.dtype),
        it=jnp.zeros((), jnp.int32),
        done=jnp.linalg.norm(r0) <= threshold,
    )

    def cond(s):
        return (~s["done"]) & (s["it"] < max_iter)

    def body(s):
        p = s["p"]
        ap = a_op(p)
        pap = jnp.vdot(p, ap).real.astype(b.dtype)
        safe = jnp.abs(pap) > 1e-300
        alpha = jnp.where(safe, s["rz"] / jnp.where(safe, pap, 1.0), 0.0)
        x_new = s["x"] + alpha * p
        r_new = s["r"] - alpha * ap
        z_new = m_op(r_new)
        rz_new = jnp.vdot(r_new, z_new).real.astype(b.dtype)
        beta = jnp.where(
            jnp.abs(s["rz"]) > 0, rz_new / jnp.where(
                jnp.abs(s["rz"]) > 0, s["rz"], 1.0
            ), 0.0
        )
        p_new = z_new + beta * p
        done = jnp.linalg.norm(r_new) <= threshold
        return dict(
            x=x_new,
            r=r_new,
            z=z_new,
            p=p_new,
            rz=rz_new,
            it=s["it"] + 1,
            done=done,
        )

    out = jax.lax.while_loop(cond, body, state)
    res_norm = jnp.linalg.norm(b - a_op(out["x"]))
    from ..formats.util import is_concrete

    if is_concrete(res_norm):
        return CgResult(
            x=out["x"],
            converged=bool(out["done"]),
            iterations=int(out["it"]),
            residual_norm=float(res_norm),
        )
    return CgResult(
        x=out["x"],
        converged=out["done"],
        iterations=out["it"],
        residual_norm=res_norm,
    )
