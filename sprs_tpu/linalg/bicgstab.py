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


def _with_cap(v: CsVec, cap: int) -> CsVec:
    """Re-pad a CsVec to static capacity ``cap`` (loud on overflow)."""
    if v.cap == cap:
        return v
    from ..errors import CapacityError
    from ..formats.util import is_concrete

    if is_concrete(v.nnz_arr) and int(v.nnz) > cap:
        raise CapacityError(int(v.nnz), cap)
    idx = jnp.zeros((cap,), v.indices.dtype)
    dat = jnp.zeros((cap,), v.data.dtype)
    k = min(v.cap, cap)
    idx = idx.at[:k].set(v.indices[:k])
    dat = dat.at[:k].set(v.data[:k])
    return CsVec(idx, dat, v.nnz_arr, v.dim)


def bicgstab_sparse(
    mat: CsMat,
    b: CsVec,
    x0: CsVec = None,
    *,
    cap: int = None,
    tol: float = 1e-8,
    max_iter: int = 200,
    restart_eps: float = 1e-30,
) -> BiCgStabResult:
    """Sparse-unknown BiCGSTAB: x, r, p, v, s, t stay :class:`CsVec`.

    The reference iterates CsVec unknowns and grows their storage as
    support fills in (bicgstab.rs:95-112).  A traced loop cannot
    reallocate, so the TPU-native contract is a STATIC iterate capacity
    ``cap`` (default: the dimension — always safe): every merge,
    scale, and sparse matvec produces capacity-``cap`` vectors, the
    helper kernels compile once per cap, and support outgrowing ``cap``
    raises :class:`CapacityError` loudly (docs/SCALE.md discipline)
    instead of silently densifying.

    Host-driven eager loop with the same two safeguards as the dense
    path (soft restart on rho-breakdown, hard restart verifying the
    TRUE residual before convergence — bicgstab.rs:162-193).  The
    jitted dense-unknown :func:`bicgstab` is the production path; this
    exists for the sparse-iterate capability and for problems whose
    Krylov iterates genuinely stay sparse (e.g. localized right-hand
    sides on short horizons).
    """
    from ..ops import matmul

    if not isinstance(b, CsVec):
        raise ShapeError("bicgstab_sparse needs a CsVec rhs")
    if mat.shape[0] != mat.shape[1] or mat.shape[1] != b.dim:
        raise ShapeError(f"bicgstab_sparse: {mat.shape} @ ({b.dim},)")
    n = b.dim
    if cap is None:
        cap = n
    a = mat.to_csr()

    def mv(v):
        return _with_cap(
            matmul(a, v, out_cap=cap, prod_cap=None), cap
        )

    def lc(u, alpha, v):
        """u + alpha·v at fixed capacity."""
        return u._binop(v.scale(alpha), jnp.add, out_cap=cap)

    b = _with_cap(b, cap)
    b_norm = float(b.l2_norm())
    threshold = tol * max(b_norm, 1e-300)
    if x0 is None:
        from ..formats.csvec import empty_csvec

        x = _with_cap(empty_csvec(n, b.data.dtype), cap)
        r = b
    else:
        x = _with_cap(x0, cap)
        r = lc(b, -1.0, mv(x))
    r_hat = r  # frozen shadow residual
    rho = float(r_hat.dot(r))
    p = r
    converged = float(r.l2_norm()) <= threshold
    it = 0
    while not converged and it < max_iter:
        it += 1
        v = mv(p)
        denom = float(r_hat.dot(v))
        if abs(denom) < restart_eps:
            # soft restart: shadow residual decorrelated
            r_hat = r
            rho = float(r_hat.dot(r))
            p = r
            v = mv(p)
            denom = float(r_hat.dot(v))
            if abs(denom) < restart_eps:
                break
        alpha = rho / denom
        s = lc(r, -alpha, v)
        t = mv(s)
        tt = float(t.dot(t))
        omega = float(t.dot(s)) / tt if tt > 0 else 0.0
        x = lc(lc(x, alpha, p), omega, s)
        r = lc(s, -omega, t)
        if float(r.l2_norm()) <= threshold:
            # hard restart: verify on the TRUE residual
            r = lc(b, -1.0, mv(x))
            if float(r.l2_norm()) <= threshold:
                converged = True
                break
            r_hat = r
            rho = float(r_hat.dot(r))
            p = r
            continue
        rho_new = float(r_hat.dot(r))
        if abs(rho_new) < restart_eps:
            r_hat = r
            rho_new = float(r_hat.dot(r))
            p = r
            rho = rho_new
            continue
        beta = (rho_new / rho) * (alpha / omega if omega != 0 else 0.0)
        p = lc(r, beta, lc(p, -omega, v))
        rho = rho_new
    return BiCgStabResult(
        x=x,
        converged=bool(converged),
        iterations=it,
        residual_norm=float(r.l2_norm()),
    )
