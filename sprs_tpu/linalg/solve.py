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


def solve(mat: CsMat, b, *, method: str = "auto", fill: str = "auto", **factor_kw):
    """Solve A x = b differentiably.

    ``method``: "auto" (LDL if symmetric else LU), "ldl", "lu", or an
    iterative solver "cg" / "bicgstab" / "gmres" (options ``tol``,
    ``max_iter``, ``precond``).  Direct factorization happens on the
    host at trace time (concrete matrix required); iterative methods
    also accept traced values.  Either way the returned computation is
    jittable and reverse-mode differentiable in ``b`` and ``mat.data``
    via ``lax.custom_linear_solve`` — gradients cost one adjoint solve,
    never differentiation through the factorization/iteration.

    ``fill``: fill-reducing ordering for the LDL path ("auto" default:
    AMD when the native library is built, RCM otherwise — the numpy
    AMD fallback is an O(n²) greedy usable only on small inputs;
    scipy's spsolve likewise orders by default).  "camd"/"rcm"/"none"
    to force.  The solution is ordering-independent; fill/flops are
    not.
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
            if fill == "auto":
                from .. import native

                fill = "camd" if native.available() else "rcm"
            fac = (
                Ldl()
                .fill_in_reduction(fill)
                .check_symmetry(False)
                .numeric(mat, **factor_kw)
            )
            fwd = fac.solve
            tr = fac.solve  # symmetric: adjoint solve == solve
        elif method == "lu":
            fac = splu(mat, **factor_kw)
            fwd = fac.solve
            tr = fac.solve_transposed
        elif method in ("cg", "bicgstab", "gmres"):
            # differentiable ITERATIVE solve: custom_linear_solve only
            # needs a solver for A and one for Aᵀ (metadata-free here);
            # gradients then cost one extra solve, never
            # differentiation through the iteration.  ``precond``
            # applies to the forward solve only (preconditioning
            # affects convergence speed, not the solution the implicit
            # gradient is defined by).
            tol = factor_kw.pop("tol", 1e-10)
            max_iter = factor_kw.pop("max_iter", 10000)
            precond = factor_kw.pop("precond", None)
            it_kw = {}
            if method == "gmres":
                it_kw["restart"] = factor_kw.pop("restart", 30)
            if factor_kw:
                raise TypeError(
                    f"unknown solve options {sorted(factor_kw)}"
                )
            # Bind matvecs NOW (host dispatch happens eagerly under
            # ensure_compile_time_eval); the solver callbacks run
            # inside the custom_linear_solve trace where host-side
            # structure analysis would stage tracers and fail.  The
            # transpose operator is only built for the nonsymmetric
            # methods (cg's adjoint solve == solve).
            from ._dispatch import as_matvec

            a_op, _ = as_matvec(mat)
            if method != "cg":
                at_op, _ = as_matvec(
                    mat.T.to_csr() if concrete else mat.T
                )
            if method == "cg":
                from .cg import cg as _it

                fwd = lambda rhs: _it(  # noqa: E731
                    a_op, rhs, tol=tol, max_iter=max_iter,
                    precond=precond,
                ).x
                tr = fwd  # SPD: adjoint solve == solve
            elif method == "bicgstab":
                from .bicgstab import bicgstab as _it

                fwd = lambda rhs: _it(  # noqa: E731
                    a_op, rhs, tol=tol, max_iter=max_iter,
                    precond=precond,
                ).x
                tr = lambda rhs: _it(  # noqa: E731
                    at_op, rhs, tol=tol, max_iter=max_iter
                ).x
            else:
                from .gmres import gmres as _it

                fwd = lambda rhs: _it(  # noqa: E731
                    a_op, rhs, tol=tol, max_iter=max_iter,
                    precond=precond, **it_kw,
                ).x
                tr = lambda rhs: _it(  # noqa: E731
                    at_op, rhs, tol=tol, max_iter=max_iter, **it_kw
                ).x
        else:
            raise ValueError(f"unknown solve method {method!r}")

        csr = mat.to_csr()
    b = jnp.asarray(b)

    def matvec(v):
        return spmv(csr, v) if v.ndim == 1 else (
            jax.vmap(lambda col: spmv(csr, col), in_axes=1, out_axes=1)(v)
        )

    def cols(solver):
        # iterative solvers take 1-D rhs; vmap over columns for 2-D
        def run(rhs):
            if rhs.ndim == 1:
                return solver(rhs)
            return jax.vmap(solver, in_axes=1, out_axes=1)(rhs)

        return run

    return jax.lax.custom_linear_solve(
        matvec,
        b,
        solve=lambda _, rhs: cols(fwd)(rhs),
        transpose_solve=lambda _, rhs: cols(tr)(rhs),
    )
