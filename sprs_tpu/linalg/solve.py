"""High-level differentiable direct solve: x = A⁻¹ b.

The reference exposes factorizations (LDLᵀ, LU) and expects users to
call ``.solve`` on them.  A JAX framework can do one better: wrap the
factored solve in :func:`jax.lax.custom_linear_solve`, which gives exact
implicit differentiation through the solve — gradients flow to **both**
the right-hand side and the matrix values (∂A = −λ xᵀ restricted to the
pattern, computed by one adjoint solve), without differentiating through
the factorization itself.

``method``: "ldl" (symmetric; adjoint solve is the same solve),
"lu" (general; adjoint uses the transposed-factor solve), or "auto"
(LDL when the matrix is symmetric, else LU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formats.csmat import CsMat
from ..ops.prod import spmv
from ..ops.symmetry import is_symmetric
from .ldl import Ldl
from .lu import splu


def solve(mat: CsMat, b, *, method: str = "auto", **factor_kw):
    """Solve A x = b with a direct factorization, differentiably.

    Factorization happens on the host at trace time (concrete matrix
    required); the returned computation is jittable and reverse-mode
    differentiable in ``b`` and ``mat.data``.
    """
    from ..formats.util import is_concrete

    concrete = is_concrete(mat.indptr, mat.indices, mat.data)
    if not concrete and method in ("auto", "lu"):
        raise ValueError(
            "solve with traced matrix values supports method='ldl' only "
            "(the device LDL numeric re-factorizes under jit; LU needs a "
            "concrete matrix)"
        )

    # Factor on the host at trace time.  ensure_compile_time_eval makes
    # jnp ops on the concrete closed-over matrix execute eagerly even
    # inside an enclosing jit trace (otherwise they stage tracers and
    # the host-side symbolic analysis cannot run).
    import contextlib

    ctx = (
        jax.ensure_compile_time_eval() if concrete else contextlib.nullcontext()
    )
    with ctx:
        if method == "auto":
            method = "ldl" if bool(is_symmetric(mat)) else "lu"

        if method == "ldl":
            fac = Ldl().check_symmetry(False).numeric(mat, **factor_kw)
            fwd = fac.solve
            tr = fac.solve  # symmetric: adjoint solve == solve
        elif method == "lu":
            fac = splu(mat, **factor_kw)
            fwd = fac.solve
            tr = fac.solve_transposed
        else:
            raise ValueError(f"unknown solve method {method!r}")

        csr = mat.to_csr()
    b = jnp.asarray(b)

    def matvec(v):
        return spmv(csr, v) if v.ndim == 1 else (
            jax.vmap(lambda col: spmv(csr, col), in_axes=1, out_axes=1)(v)
        )

    return jax.lax.custom_linear_solve(
        matvec,
        b,
        solve=lambda _, rhs: fwd(rhs),
        transpose_solve=lambda _, rhs: tr(rhs),
    )
