"""BiCGSTAB iterative solver.

Reference: /root/reference/sprs/src/sparse/linalg/bicgstab.rs — an
unpreconditioned BiCGSTAB with two safeguards (rationale comments at
bicgstab.rs:70-88):

* **soft restart** when the shadow residual r̂ becomes (near-)orthogonal
  to the residual (breakdown, rho → 0): restart with r̂ = r
  (bicgstab.rs:177-185);
* **hard restart** before declaring convergence: the *recursive* residual
  drifts from the true residual, so recompute r = b − A·x and only stop
  if the true residual passes the tolerance (bicgstab.rs:162-169,
  186-193).

TPU-native: dense state vectors, one ``lax.while_loop`` with the two
restarts expressed as masked updates — compiles to a single XLA program
whose per-iteration cost is 2 SpMVs + a handful of dots (ICI-friendly:
under shard_map the dots become psums).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Union

import jax
import jax.numpy as jnp

from ..errors import ShapeError
from ..formats.csmat import CsMat
from ..formats.csvec import CsVec


@dataclasses.dataclass
class BiCgStabResult:
    x: jax.Array
    converged: Union[bool, jax.Array]
    iterations: Union[int, jax.Array]
    residual_norm: Union[float, jax.Array]


def bicgstab(
    mat: Union[CsMat, Callable],
    b,
    x0=None,
    *,
    tol: float = 1e-8,
    max_iter: int = 1000,
    restart_eps: float = 1e-30,
    precond: Callable = None,
) -> BiCgStabResult:
    """Solve A x = b. ``mat`` may be a CsMat or a matvec callable.

    ``tol`` is relative: converged when ‖b − A·x‖ ≤ tol·‖b‖, verified on
    the true residual (hard restart otherwise).  Fully jittable.

    ``precond`` applies M⁻¹ (right preconditioning: the recurrences run
    on the original residual, search directions pass through M⁻¹ — e.g.
    :class:`sprs_tpu.linalg.Ilu0`).  Beyond the reference surface, which
    is unpreconditioned (bicgstab.rs:95-112).

    Doctest (mirrors the reference's executable example,
    bicgstab.rs:27-68):

    >>> import numpy as np
    >>> import sprs_tpu as st
    >>> from sprs_tpu.linalg import bicgstab
    >>> a = st.from_dense(np.array([[4.0, 1.0], [1.0, 3.0]]))
    >>> res = bicgstab(a, np.array([1.0, 2.0]), tol=1e-6)
    >>> bool(res.converged)
    True
    >>> np.allclose(np.asarray(res.x), [1.0 / 11.0, 7.0 / 11.0],
    ...             atol=1e-5)
    True
    """
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
    state = dict(
        x=x,
        r=r0,
        rhat=r0,
        p=r0,
        v=jnp.zeros_like(b),
        rho=jnp.vdot(r0, r0).real.astype(b.dtype),
        it=jnp.zeros((), jnp.int32),
        done=jnp.linalg.norm(r0) <= threshold,
    )

    def cond(s):
        return (~s["done"]) & (s["it"] < max_iter)

    def body(s):
        x, r, rhat, p, v, rho = (
            s["x"],
            s["r"],
            s["rhat"],
            s["p"],
            s["v"],
            s["rho"],
        )
        phat = m_op(p)
        v = a_op(phat)
        rhat_v = jnp.vdot(rhat, v).real.astype(r.dtype)
        safe = jnp.abs(rhat_v) > restart_eps
        alpha = jnp.where(safe, rho / jnp.where(safe, rhat_v, 1.0), 0.0)
        sres = r - alpha * v
        shat = m_op(sres)
        t = a_op(shat)
        tt = jnp.vdot(t, t).real.astype(r.dtype)
        omega = jnp.where(
            tt > restart_eps, jnp.vdot(t, sres).real.astype(r.dtype) / jnp.where(tt > restart_eps, tt, 1.0), 0.0
        )
        x_new = x + alpha * phat + omega * shat
        r_new = sres - omega * t

        rho_new = jnp.vdot(rhat, r_new).real.astype(r.dtype)
        # soft restart: shadow residual lost orthogonality signal
        soft = jnp.abs(rho_new) < restart_eps * jnp.maximum(
            jnp.linalg.norm(r_new) * jnp.linalg.norm(rhat), 1e-300
        )
        rhat_new = jnp.where(soft, r_new, rhat)
        rho_next = jnp.where(
            soft, jnp.vdot(r_new, r_new).real.astype(r.dtype), rho_new
        )
        beta = jnp.where(
            safe & ~soft,
            (rho_next / jnp.where(jnp.abs(rho) > 0, rho, 1.0))
            * (alpha / jnp.where(jnp.abs(omega) > 0, omega, 1.0)),
            0.0,
        )
        p_new = jnp.where(
            soft, r_new, r_new + beta * (p - omega * v)
        )

        # hard restart / convergence: verify with the true residual
        rec_small = jnp.linalg.norm(r_new) <= threshold
        true_r = b - a_op(x_new)
        true_small = jnp.linalg.norm(true_r) <= threshold
        done = rec_small & true_small
        # recursive residual lied → continue from the true residual
        lied = rec_small & ~true_small
        r_new = jnp.where(lied, true_r, r_new)
        rhat_new = jnp.where(lied, true_r, rhat_new)
        p_new = jnp.where(lied, true_r, p_new)
        rho_next = jnp.where(
            lied, jnp.vdot(true_r, true_r).real.astype(r.dtype), rho_next
        )

        return dict(
            x=x_new,
            r=r_new,
            rhat=rhat_new,
            p=p_new,
            v=v,
            rho=rho_next,
            it=s["it"] + 1,
            done=done,
        )

    out = jax.lax.while_loop(cond, body, state)
    res_norm = jnp.linalg.norm(b - a_op(out["x"]))
    from ..formats.util import is_concrete

    if is_concrete(res_norm):
        return BiCgStabResult(
            x=out["x"],
            converged=bool(out["done"]),
            iterations=int(out["it"]),
            residual_norm=float(res_norm),
        )
    return BiCgStabResult(
        x=out["x"],
        converged=out["done"],
        iterations=out["it"],
        residual_norm=res_norm,
    )
