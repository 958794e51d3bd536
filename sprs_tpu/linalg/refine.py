"""Mixed-precision iterative refinement for direct solves.

The TPU-native accuracy recipe: factor once in f32 (fast — the batched
panel kernels live on the MXU), then recover forward accuracy with a
few refinement sweeps whose RESIDUALS are computed in f64.  An f32
direct solve is backward-stable (measured relative backward error
1.4-1.6e-3·eps-scale at 262k-1M rows, BASELINE.md round 4) but its
FORWARD error is amplified by cond(A) — 0.4-0.5 relative on the 512²/
1024² Laplacians (cond ~1e5-4e5).  Refinement with higher-precision
residuals converges the forward error toward the f64 level at the cost
of one O(nnz) residual + one O(lnz) solve per step (Wilkinson;
standard mixed-precision practice on f32-fast hardware).

Residual precision: on concrete inputs the residual is computed on the
host in numpy f64 (exact A, exact accumulate — O(nnz) at host memory
speed, trivial next to the factorization).  Under jit (traced inputs)
f64 is unavailable without global x64, so the residual falls back to
on-device f32 — that still polishes the backward error but cannot beat
the cond·eps_f32 forward floor; the docstring and return flag say so.

Reference analog: sprs ships no refinement (its LDL is f64-only,
lib.rs); this exists because f32 is the TPU's native fast precision.
"""

from __future__ import annotations

from typing import Callable, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.csmat import CsMat
from ..formats.util import is_concrete


def _host_csr_f64(mat: CsMat):
    import scipy.sparse as sp

    csr = mat.to_csr()
    indptr = np.asarray(csr.indptr).astype(np.int64)
    nnz = int(indptr[-1])
    return sp.csr_matrix(
        (
            np.asarray(csr.data)[:nnz].astype(np.float64),
            np.asarray(csr.indices)[:nnz].astype(np.int64),
            indptr,
        ),
        shape=mat.shape,
    )


def refine_solve(
    mat: CsMat,
    solve: Union[Callable, "object"],
    b,
    *,
    steps: int = 2,
    rtol: float = 0.0,
):
    """Solve ``A x = b`` through ``solve`` with iterative refinement.

    ``solve`` is either a callable ``r -> A⁻¹r`` (approximate — e.g. a
    jitted f32 factor solve) or an object with a ``.solve`` method
    (``LdlNumeric``, ``SpLU``).  Runs ``x ← x + solve(b − A·x)`` up to
    ``steps`` times; with concrete inputs the residual is f64 on the
    host and iteration stops early once the f64 relative backward
    error ``‖b−Ax‖∞/(‖A‖∞‖x‖∞+‖b‖∞)`` is below ``rtol`` (0 = always
    run all steps).

    Returns ``(x, info)`` where ``info`` is a dict with the per-step
    f64 backward errors (concrete path) or ``{"traced": True}``.

    >>> import numpy as np
    >>> import sprs_tpu as st
    >>> from sprs_tpu.linalg import Ldl, refine_solve
    >>> from sprs_tpu.utils.special import dirichlet_laplacian
    >>> a = dirichlet_laplacian((16, 16))
    >>> num = Ldl().fill_in_reduction('nd').check_symmetry(False).numeric(a)
    >>> x, info = refine_solve(a, num, np.ones(256), steps=2)
    >>> bool(info["backward_errors"][-1] < 1e-12)
    True
    """
    solve_fn = solve.solve if hasattr(solve, "solve") else solve
    concrete = is_concrete(mat.data) and not isinstance(
        b, jax.core.Tracer
    )
    if not concrete:
        x = solve_fn(b)
        for _ in range(max(steps, 0)):
            from ..ops.prod import spmv

            r = jnp.asarray(b) - spmv(mat, x)
            x = x + solve_fn(r)
        return x, {"traced": True}

    A = _host_csr_f64(mat)
    b64 = np.asarray(b, np.float64)
    norm_a = float(np.abs(A).sum(axis=1).max())
    x64 = np.asarray(solve_fn(b), np.float64)
    errs = []
    for _ in range(max(steps, 0)):
        r = b64 - A @ x64
        be = float(
            np.abs(r).max()
            / (norm_a * np.abs(x64).max() + np.abs(b64).max() + 1e-300)
        )
        errs.append(be)
        if rtol and be <= rtol:
            break
        # the factor's solve promotes/casts the rhs to its own dtype;
        # an f32 factor refines from the f32-rounded residual, which is
        # precisely the mixed-precision scheme
        dx = np.asarray(solve_fn(r), np.float64)
        x64 = x64 + dx
    r = b64 - A @ x64
    errs.append(
        float(
            np.abs(r).max()
            / (norm_a * np.abs(x64).max() + np.abs(b64).max() + 1e-300)
        )
    )
    return x64, {"backward_errors": errs}
