"""Truncated sparse SVD: largest singular triplets via LOBPCG.

scipy.sparse.linalg.svds parity (beyond the reference surface).  The
largest singular values of A are the square roots of the largest
eigenvalues of the Gram operator G = AᵀA; LOBPCG finds SMALLEST
eigenpairs, so it runs on −G (one extra negation).  Each G matvec is
two structure-dispatched SpMMs — and Aᵀ is free (transpose is
metadata).  Left vectors come out as ``A v / σ``.
"""

from __future__ import annotations

import dataclasses
from typing import Union

import jax
import jax.numpy as jnp

from ..formats.csmat import CsMat
from .lobpcg import lobpcg


@dataclasses.dataclass
class SvdsResult:
    u: jax.Array  # (m, k) left singular vectors
    s: jax.Array  # (k,) singular values, DESCENDING
    vt: jax.Array  # (k, n) right singular vectors (rows)
    iterations: Union[int, jax.Array]
    converged: Union[bool, jax.Array]


def svds(
    mat: CsMat,
    k: int = 4,
    *,
    tol: float = 1e-6,
    max_iter: int = 300,
    x0=None,
    seed: int = 0,
) -> SvdsResult:
    """Largest ``k`` singular triplets of a (possibly rectangular)
    sparse matrix."""
    from ._dispatch import as_matvec

    a_op, _ = as_matvec(mat, square=False, multi_rhs=True)
    at_op, _ = as_matvec(
        mat.T.to_csr(), square=False, multi_rhs=True
    )
    n = mat.shape[1]

    def neg_gram(v):
        return -at_op(a_op(v))

    if x0 is None:
        import numpy as np

        x0 = np.random.default_rng(seed).standard_normal((n, k))
    res = lobpcg(neg_gram, x0, tol=tol, max_iter=max_iter)
    lam = -res.eigenvalues  # eigenvalues of G, ascending in -G => desc
    s = jnp.sqrt(jnp.maximum(lam, 0.0))
    v = res.eigenvectors
    av = a_op(v)
    u = av / jnp.maximum(s, 1e-300)[None, :]
    return SvdsResult(
        u=u,
        s=s,
        vt=v.T,
        iterations=res.iterations,
        converged=res.converged,
    )
