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
from .triplet import TriMat, coo_to_csmat
from .util import compress_coo, INDEX_DTYPE

__all__ = [
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
    "empty",
    "empty_csvec",
    "eye",
    "from_dense",
    "from_scipy",
    "coo_to_csmat",
    "compress_coo",
    "INDEX_DTYPE",
]
