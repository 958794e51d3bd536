"""Sparse×dense products: SpMV and SpMM.

TPU-native designs for the reference product kernels
(/root/reference/sprs/src/sparse/prod.rs:74-298).  The Rust kernels are
scalar row/column sweeps; here both storage orders reduce to two
bandwidth-friendly vector primitives that XLA fuses well:

* CSR (gather form):   y = segment_sum(data * x[indices], row_ids)
* CSC (scatter form):  y[indices] += data * x[col_ids]

Padding entries are free: their segment id is out of range (dropped) and
their data is zero.  A Pallas kernel path for large matrices lives in
``sprs_tpu.ops.pallas``; this module is the portable XLA reference that
also serves as its correctness oracle.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..errors import ShapeError
from ..formats.csmat import CsMat


def _gather_rows(x: jax.Array, ids: jax.Array) -> jax.Array:
    """Clamped gather; padding rides on data==0."""
    return x[jnp.minimum(ids, x.shape[0] - 1)]


def spmv(mat: CsMat, x: jax.Array) -> jax.Array:
    """y = A @ x for a dense vector x.  Fully jittable."""
    x = jnp.asarray(x)
    if x.shape != (mat.cols,):
        raise ShapeError(f"spmv: A is {mat.shape}, x is {x.shape}")
    outer = mat.outer_ids()
    if mat.is_csr:
        contrib = mat.data * _gather_rows(x, mat.indices)
        return jax.ops.segment_sum(contrib, outer, num_segments=mat.rows)
    # CSC: outer ids are columns; scatter-add into rows.
    contrib = mat.data * _gather_rows(x, outer)
    y = jnp.zeros((mat.rows,), dtype=contrib.dtype)
    return y.at[mat.indices].add(contrib, mode="drop")


def spmm(mat: CsMat, x: jax.Array) -> jax.Array:
    """Y = A @ X for a dense matrix X of shape (cols, k)."""
    x = jnp.asarray(x)
    if x.ndim != 2 or x.shape[0] != mat.cols:
        raise ShapeError(f"spmm: A is {mat.shape}, X is {x.shape}")
    outer = mat.outer_ids()
    if mat.is_csr:
        contrib = mat.data[:, None] * _gather_rows(x, mat.indices)
        return jax.ops.segment_sum(contrib, outer, num_segments=mat.rows)
    contrib = mat.data[:, None] * _gather_rows(x, outer)
    y = jnp.zeros((mat.rows, x.shape[1]), dtype=contrib.dtype)
    return y.at[mat.indices].add(contrib, mode="drop")


def prepare_spmv(mat: CsMat, *, use_pallas: Optional[bool] = None):
    """Structure-dispatched SpMV: pick the fastest format for ``mat``
    and return ``(fn, prepared)`` with ``fn(prepared, x) -> y`` jittable.

    The TPU analog of the reference's kernel-choice heuristics
    (csmat.rs:2002-2047), lifted to format level (host-side, once per
    matrix):

    * few populated diagonals → DIA (zero-gather; Pallas kernel on TPU),
    * modest ELL padding overhead → ELL (one gather per entry),
    * otherwise → CSR segment-sum (always correct, scatter-bound).
    """
    from ..formats.dia import dia_from_csmat, dia_spmv, n_diags_of
    from ..formats.ell import ell_from_csmat, ell_overhead, ell_spmv

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    k = n_diags_of(mat)
    n_outer = max(mat.rows, 1)
    nnz = int(mat.nnz)
    # DIA pays k·n streaming traffic regardless of fill; take it when
    # the populated diagonals are reasonably dense (streaming beats the
    # ELL gather even at modest fill: gather is ~50M lookups/s flat
    # while DIA streams at HBM rate) and k is small enough that the
    # Pallas kernel compiles quickly (k=33 measured 0.87x copy peak).
    dia_fill = nnz / max(k * n_outer, 1)
    if k <= 32 or (k <= 64 and dia_fill >= 0.25):
        dia = dia_from_csmat(mat)
        if use_pallas:
            from ..errors import ShapeError
            from .pallas import dia_tile

            try:
                # prepare-once flat tiling: each kernel step streams
                # the row block's diagonals as ONE contiguous DMA
                # transfer
                return (lambda m, x: m.spmv(x)), dia_tile(dia)
            except ShapeError:
                pass  # bandwidth exceeds the row block: XLA DIA below
        return (lambda m, x: dia_spmv(m, x)), dia
    # ELL does (1+overhead)·nnz gathers + a dense reduce; the CSR
    # fallback does nnz gathers + a sorted-segment sum.  Measured on the
    # tunnel v5e (2M-row random, nnz 20M, ELL width 29 = overhead 1.9):
    # ELL 8.45 ns/slot vs CSR 19 ns/nnz → break-even at overhead ~1.2;
    # CSR won that point 1.3x.  Dispatch ELL below 1.2, CSR above.
    if ell_overhead(mat) < 1.2:
        return (lambda m, x: ell_spmv(m, x)), ell_from_csmat(mat)
    return (lambda m, x: spmv(m, x)), mat


def prepare_spmm(mat: CsMat, *, use_pallas: Optional[bool] = None):
    """Structure-dispatched SpMM: ``(fn, prepared)`` with
    ``fn(prepared, X) -> Y`` jittable for a dense RHS ``X (cols, k)``.

    Multi-RHS analog of :func:`prepare_spmv` and of the reference's
    SpMM kernel choice (row-major kernel iff rhs cols >= 8,
    csmat.rs:2002-2047):

    * banded → DIA ``dia_spmm`` (streams diagonals; the fused XLA form
      amortizes x re-reads over the RHS width, measured at or above the
      Pallas twin for k <= 256 — ops/pallas/dia_spmm.py),
    * modest ELL padding overhead → ELL gather SpMM,
    * otherwise → CSR segment-sum.
    """
    from ..formats.dia import dia_from_csmat, dia_spmm, n_diags_of
    from ..formats.ell import ell_from_csmat, ell_overhead, ell_spmm

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    k = n_diags_of(mat)
    n_outer = max(mat.rows, 1)
    nnz = int(mat.nnz)
    dia_fill = nnz / max(k * n_outer, 1)
    if k <= 32 or (k <= 64 and dia_fill >= 0.25):
        dia = dia_from_csmat(mat)
        if use_pallas:
            from .pallas import dia_spmm_pallas

            def fn(m, x):
                # Measured (ops/pallas/dia_spmm.py): XLA wins below 128
                # RHS columns (lane padding wastes X/Y traffic), is
                # still ~1.1-1.25x ahead at k=128, and reaches parity
                # at k=256 — route >= 256 to the Pallas lagflat kernel
                # (fusion/wide-RHS upside, one session measured it
                # 1.75x ahead).  Shapes are static under jit, so this
                # is a trace-time branch.
                if x.shape[1] >= 256:
                    return dia_spmm_pallas(
                        m,
                        x,
                        interpret=jax.default_backend() != "tpu",
                    )
                return dia_spmm(m, x)

            return fn, dia
        return (lambda m, x: dia_spmm(m, x)), dia
    if ell_overhead(mat) < 1.2:
        return (lambda m, x: ell_spmm(m, x)), ell_from_csmat(mat)
    return (lambda m, x: spmm(m, x)), mat


def dense_matmul_sparse(x: jax.Array, mat: CsMat) -> jax.Array:
    """X @ A via the transpose identity (X·A = (Aᵀ·Xᵀ)ᵀ, csmat.rs:2050-2117)."""
    x = jnp.asarray(x)
    if x.ndim == 1:
        # xᵀ A  ==  (Aᵀ x)
        return spmv(mat.T, x)
    if x.shape[-1] != mat.rows:
        raise ShapeError(f"dense@sparse: X is {x.shape}, A is {mat.shape}")
    return spmm(mat.T, x.T).T
