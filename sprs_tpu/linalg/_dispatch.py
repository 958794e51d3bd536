"""Shared matvec binding for the iterative solvers.

Every Krylov solver accepts either a CsMat or a matvec callable; the
CsMat path must (a) check squareness, (b) bind the structure-dispatched
kernel EAGERLY on concrete matrices (host dispatch inside a trace would
stage tracers), and (c) fall back to the generic spmv under jit.  One
implementation here instead of a copy per solver.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

from ..errors import NonSquareMatrixError
from ..formats.csmat import CsMat


def as_matvec(
    mat: Union[CsMat, Callable],
    *,
    square: bool = True,
    multi_rhs: bool = False,
) -> Tuple[Callable, Optional[int]]:
    """Return ``(a_op, n_rows)``; ``n_rows`` is None for callables.

    ``multi_rhs`` binds the SpMM dispatch instead of SpMV (block
    methods like LOBPCG)."""
    if not isinstance(mat, CsMat):
        return mat, None
    if square and mat.shape[0] != mat.shape[1]:
        raise NonSquareMatrixError(
            f"iterative solver needs square, got {mat.shape}"
        )
    from ..formats.util import is_concrete

    # data must be concrete too: the prepared formats (DIA/ELL/BSR)
    # BAKE the values host-side, so a traced-data matrix (e.g. under
    # jax.grad w.r.t. mat.data) must stay on the generic kernels
    if is_concrete(mat.indptr, mat.indices, mat.data):
        from ..ops.prod import prepare_spmm, prepare_spmv

        prep_fn = prepare_spmm if multi_rhs else prepare_spmv
        fn, prepared = prep_fn(mat)
        return (lambda v: fn(prepared, v)), mat.shape[0]
    from ..ops.prod import spmm, spmv

    op = spmm if multi_rhs else spmv
    return (lambda v: op(mat, v)), mat.shape[0]
