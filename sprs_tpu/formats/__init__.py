"""Sparse storage formats: CSR/CSC matrices, sparse vectors, COO triplets."""

from .csmat import (
    CSC,
    CSR,
    CsMat,
    csc,
    csmat,
    csmat_from_unsorted,
    csr,
    diag_csmat,
    diags,
    empty,
    eye,
    from_dense,
    from_scipy,
)
from .csvec import (
    CsVec,
    csvec,
    csvec_from_dense,
    csvec_from_unsorted,
    empty_csvec,
)
from .bsr import BsrMat, bsr_from_csmat, bsr_from_dense, bsr_random, bsr_spmm_xla
from .dia import DiaMat, dia_from_csmat, dia_spmm, dia_spmv, dia_to_csmat, n_diags_of
from .ell import (
    EllMat,
    ell_from_csmat,
    ell_overhead,
    ell_spmm,
    ell_spmv,
    ell_to_csmat,
)
from .triplet import TriMat, coo_to_csmat
from .util import compress_coo, INDEX_DTYPE

__all__ = [
    "BsrMat",
    "DiaMat",
    "EllMat",
    "dia_from_csmat",
    "dia_spmm",
    "dia_to_csmat",
    "dia_spmv",
    "n_diags_of",
    "bsr_from_csmat",
    "bsr_from_dense",
    "bsr_random",
    "bsr_spmm_xla",
    "ell_from_csmat",
    "ell_overhead",
    "ell_spmm",
    "ell_spmv",
    "ell_to_csmat",
    "CSC",
    "CSR",
    "CsMat",
    "CsVec",
    "TriMat",
    "csc",
    "csmat",
    "csmat_from_unsorted",
    "csr",
    "csvec",
    "csvec_from_dense",
    "csvec_from_unsorted",
    "diag_csmat",
    "diags",
    "empty",
    "empty_csvec",
    "eye",
    "from_dense",
    "from_scipy",
    "coo_to_csmat",
    "compress_coo",
    "INDEX_DTYPE",
]
