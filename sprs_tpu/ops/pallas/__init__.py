"""Pallas TPU kernels for the hot ops.

Two kernel families, each with an XLA twin that serves as correctness
oracle and portable fallback:

* :func:`ell_spmv_pallas` — row-blocked unstructured SpMV over the ELL
  format (VPU gather + reduce, x resident in VMEM).  XLA twin:
  :func:`sprs_tpu.formats.ell.ell_spmv`.
* :func:`bsr_spmm_pallas` / :func:`bsr_spmv_pallas` — grouped-matmul
  block-sparse SpMM on the MXU with scalar-prefetched block coordinates.
  XLA twin: :func:`sprs_tpu.formats.bsr.bsr_spmm_xla`.
* :func:`dia_spmv_pallas` — shifted-slice diagonal SpMV for banded
  matrices (grid Laplacians, RCM-ordered systems); no gathers at all.
  XLA twin: :func:`sprs_tpu.formats.dia.dia_spmv`.

Both run in interpreter mode on any backend (``interpret=True``), which
is how the CPU test suite exercises them.
"""

from .bsr_spmm import (
    bsr_group,
    bsr_spmm_pallas,
    bsr_spmm_pallas_grouped,
    bsr_spmv_pallas,
)
from .dia_spmm import dia_spmm_pallas
from .dia_spmv import DiaTiledMat, dia_spmv_pallas, dia_tile
from .sort import sort_rows_pallas
from .spmv import ell_spmv_pallas

__all__ = [
    "bsr_group",
    "bsr_spmm_pallas",
    "bsr_spmm_pallas_grouped",
    "bsr_spmv_pallas",
    "dia_spmm_pallas",
    "DiaTiledMat",
    "dia_spmv_pallas",
    "dia_tile",
    "ell_spmv_pallas",
    "sort_rows_pallas",
]
