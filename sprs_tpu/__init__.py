"""sprs_tpu — a TPU-native sparse linear-algebra framework.

Built from scratch on JAX/XLA/Pallas with the capability surface of the
reference Rust library ``sprs`` (see SURVEY.md): CSR/CSC/COO formats,
sparse vectors, SpMV/SpMM/SpGEMM, sparse binary ops, Kronecker products,
stacking/block construction, permutations, triangular solves, LDLᵀ
factorization with fill-reducing ordering, BiCGSTAB, Matrix Market IO,
and reproducible random generation — all as statically-shaped,
capacity-padded pytrees that compile once and serve any nnz up to
capacity, scaling over device meshes with shard_map.

Example (executed by tests/test_doctests.py — the reference ships
doctests throughout, e.g. csmat.rs:195-206):

>>> import numpy as np
>>> import sprs_tpu as st
>>> a = st.from_dense(np.array([[1.0, 0.0, 2.0],
...                             [0.0, 0.0, 3.0],
...                             [4.0, 5.0, 6.0]]))
>>> a.nnz
6
>>> np.asarray(st.spmv(a, np.ones(3))).tolist()
[3.0, 3.0, 15.0]
>>> c = st.spgemm(a, a)
>>> np.allclose(np.asarray(c.to_dense()),
...             np.asarray(a.to_dense()) @ np.asarray(a.to_dense()))
True
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
    spgemm_caps,
    spgemm_dense,
    spgemm_dense_bsr,
    spmm,
    spmv,
    sub,
    transform_mat_papt,
    transform_mat_paq,
    vstack,
)

__version__ = "0.1.0"
