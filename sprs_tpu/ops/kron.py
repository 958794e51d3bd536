"""Kronecker product (reference: /root/reference/sprs/src/sparse/kronecker.rs:50-99).

nnz(C) = nnz(A)·nnz(B) exactly; every output entry is a distinct
(row, col), so the expand step needs no dedup — but the sort-compress
still establishes CSR order in one vectorized pass.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..formats.csmat import CsMat
from ..formats.util import compress_coo, is_concrete


def kronecker_product(
    a: CsMat, b: CsMat, *, out_cap: Optional[int] = None
) -> CsMat:
    """Sparse Kronecker product A ⊗ B (kronecker.rs surface).

    >>> import numpy as np
    >>> import sprs_tpu as st
    >>> a = st.from_dense(np.array([[1.0, 2.0]]))
    >>> b = st.from_dense(np.array([[0.0, 3.0]]))
    >>> np.asarray(st.kronecker_product(a, b).to_dense()).tolist()
    [[0.0, 3.0, 0.0, 6.0]]
    """
    a_csr, b_csr = a.to_csr(), b.to_csr()
    ra, ca, va = a_csr.coo_arrays()
    rb, cb, vb = b_csr.coo_arrays()
    br, bc = b.shape
    live = (
        a_csr.live_mask()[:, None] & b_csr.live_mask()[None, :]
    ).reshape(-1)
    rows = (
        jnp.minimum(ra, a.shape[0] - 1)[:, None] * br
        + jnp.minimum(rb, br - 1)[None, :]
    ).reshape(-1)
    cols = (ca[:, None] * bc + cb[None, :]).reshape(-1)
    vals = (va[:, None] * vb[None, :]).reshape(-1)
    n_rows = a.shape[0] * br
    rows = jnp.where(live, rows, n_rows)
    vals = jnp.where(live, vals, jnp.zeros((), vals.dtype))
    if out_cap is None:
        if is_concrete(a.indptr, b.indptr):
            out_cap = max(int(a.nnz) * int(b.nnz), 1)
        else:
            out_cap = max(a.cap * b.cap, 1)
    res = compress_coo(
        rows=rows,
        cols=cols,
        value_channels=(vals,),
        nvalid=rows.shape[0],
        n_outer=n_rows,
        n_inner=a.shape[1] * bc,
        out_cap=out_cap,
    )
    return CsMat(
        res.indptr,
        res.indices,
        res.values[0],
        (n_rows, a.shape[1] * bc),
        "csr",
    )
