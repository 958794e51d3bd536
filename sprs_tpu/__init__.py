"""sprs_tpu — a TPU-native sparse linear-algebra framework.

Built from scratch on JAX/XLA/Pallas with the capability surface of the
reference Rust library ``sprs`` (see SURVEY.md): CSR/CSC/COO formats,
sparse vectors, SpMV/SpMM/SpGEMM, sparse binary ops, Kronecker products,
stacking/block construction, permutations, triangular solves, LDLᵀ
factorization with fill-reducing ordering, BiCGSTAB, Matrix Market IO,
and reproducible random generation — all as statically-shaped,
capacity-padded pytrees that compile once and serve any nnz up to
capacity, scaling over device meshes with shard_map.
"""

from . import io, linalg, ops, utils
from .errors import (
    CapacityError,
    LinalgError,
    NonSquareMatrixError,
    ShapeError,
    SingularMatrixError,
    SprsError,
    StructureError,
)
from .formats import (
    CSC,
    CSR,
    CsMat,
    CsVec,
    INDEX_DTYPE,
    TriMat,
    coo_to_csmat,
    csc,
    csmat,
    csmat_from_unsorted,
    csr,
    csvec,
    csvec_from_dense,
    csvec_from_unsorted,
    diag_csmat,
    diags,
    empty,
    empty_csvec,
    eye,
    from_dense,
    from_scipy,
)
from .ops import (
    Permutation,
    add,
    bmat,
    hstack,
    is_symmetric,
    kronecker_product,
    matmul,
    permute_cols,
    permute_rows,
    spgemm,
    spgemm_dense,
    spmm,
    spmv,
    sub,
    transform_mat_papt,
    transform_mat_paq,
    vstack,
)

__version__ = "0.1.0"
