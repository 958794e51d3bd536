"""Action of the matrix exponential: y = exp(t·A) @ b.

scipy.sparse.linalg.expm_multiply parity (beyond the reference
surface).  Matrix exponentials of sparse operators show up in graph
diffusion, network centrality and stiff ODE stepping; the ACTION never
materializes exp(A) (which is dense) — it is a chain of SpMVs, exactly
this framework's fast path.

Algorithm: substepped truncated Taylor (the Al-Mohy–Higham "expmv"
family, simplified): split t into ``s`` substeps with ``s`` chosen so
the per-step series converges fast (``‖t A‖₁ / s ≤ θ``), then within
each substep accumulate ``Σ (tA/s)^j b / j!`` until the term norm
drops below tolerance (fixed ``m_max`` iterations under jit, masked
once converged).  Everything is jittable: ``lax.fori_loop`` over
substeps, fixed-length masked inner loop.
"""

from __future__ import annotations

from typing import Callable, Union

import jax
import jax.numpy as jnp

from ..formats.csmat import CsMat


def expm_multiply(
    mat: Union[CsMat, Callable],
    b,
    *,
    t: float = 1.0,
    tol: float = 1e-10,
    m_max: int = 55,
) -> jax.Array:
    """y = exp(t A) b for a square sparse A (or matvec callable).

    ``b`` may be a vector (n,) or a block (n, k)."""
    import contextlib

    from ..formats.util import is_concrete
    from ._dispatch import as_matvec

    multi = hasattr(b, "ndim") and jnp.asarray(b).ndim == 2
    concrete = isinstance(mat, CsMat) and is_concrete(
        mat.indptr, mat.indices, mat.data
    )
    # under an enclosing jit the host dispatch/norm on a concrete
    # closed-over matrix would stage tracers (CLAUDE.md gotcha)
    ctx = (
        jax.ensure_compile_time_eval()
        if concrete
        else contextlib.nullcontext()
    )
    with ctx:
        a_op, _ = as_matvec(mat, multi_rhs=multi)
        if concrete:
            anorm = float(jax.device_get(mat.norm(1))) * abs(t)
        else:
            # traced matrix or raw callable: safe fixed substep budget
            anorm = 16.0 * abs(t)
    b = jnp.asarray(b)
    import math

    theta = 3.0  # per-substep series budget: ~20 terms at tol 1e-10
    s = max(1, math.ceil(anorm / theta))  # host math: jnp would stage
    h = t / s

    def substep(_, y):
        def cond(c):
            j, term, acc = c
            return (j <= m_max) & (
                jnp.linalg.norm(term)
                > tol * jnp.maximum(jnp.linalg.norm(acc), 1e-300)
            )

        def inner(c):
            j, term, acc = c
            term = a_op(term) * (h / j)
            return j + 1, term, acc + term

        _, _, acc = jax.lax.while_loop(
            cond, inner, (jnp.asarray(1, jnp.int32), y, y)
        )
        return acc

    return jax.lax.fori_loop(0, s, substep, b)
