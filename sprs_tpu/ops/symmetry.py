"""Symmetry check (reference: /root/reference/sprs/src/sparse/symmetric.rs:7-34).

The reference probes A[j, i] for every stored A[i, j] with per-entry
binary searches.  The TPU formulation compares A against its re-sorted
transpose: both land in identical CSR order iff the pattern is symmetric,
and a vectorized equality over (indptr, indices, data) decides the rest.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..formats.csmat import CsMat
from ..formats.util import is_concrete


def is_symmetric(mat: CsMat, *, rtol: float = 0.0, atol: float = 0.0):
    """True iff A == Aᵀ structurally and numerically.

    Returns a Python bool on concrete inputs, a traced bool under jit.
    With default tolerances the comparison is exact, like the reference.
    """
    if mat.shape[0] != mat.shape[1]:
        return False
    a = mat.to_csr()
    at = mat.T.to_csr().with_cap(a.cap)
    same_ptr = jnp.all(a.indptr == at.indptr)
    same_idx = jnp.all(a.indices == at.indices)
    if rtol == 0.0 and atol == 0.0:
        same_val = jnp.all(a.data == at.data)
    else:
        same_val = jnp.all(
            jnp.abs(a.data - at.data)
            <= atol + rtol * jnp.abs(at.data)
        )
    ok = same_ptr & same_idx & same_val
    return bool(ok) if is_concrete(ok) else ok
