"""Stationary iterative methods: Jacobi (device) and Gauss–Seidel (host).

The reference's heat-diffusion example iterates Gauss–Seidel
(/root/reference/sprs/examples/heat.rs:103-139).  Pure Gauss–Seidel is a
sequential row sweep — a poor TPU program — so the device-native
iteration here is (weighted) Jacobi, which is embarrassingly parallel and
converges on the same SPD Laplacians; a host Gauss–Seidel reference is
kept for exact example parity, and the level-scheduled trisolve makes a
device Gauss–Seidel possible when needed (each sweep is one lower solve).
"""

from __future__ import annotations

import dataclasses
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import NonSquareMatrixError
from ..formats.csmat import CsMat
from ..ops.prod import spmv


@dataclasses.dataclass
class IterativeResult:
    x: jax.Array
    iterations: Union[int, jax.Array]
    residual_norm: Union[float, jax.Array]
    converged: Union[bool, jax.Array]


def jacobi(
    mat: CsMat,
    b,
    x0=None,
    *,
    tol: float = 1e-8,
    max_iter: int = 1000,
    omega: float = 1.0,
) -> IterativeResult:
    """(Weighted) Jacobi iteration; fully jittable.

    x ← x + ω·D⁻¹·(b − A·x).  Residual criterion matches heat.rs:112:
    ‖A·x − b‖₂ ≤ tol.
    """
    if mat.shape[0] != mat.shape[1]:
        raise NonSquareMatrixError(f"jacobi needs square, got {mat.shape}")
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    d = mat.diag()

    def cond(s):
        x, it, res = s
        return (res > tol) & (it < max_iter)

    def body(s):
        x, it, _ = s
        r = b - spmv(mat, x)
        x = x + omega * (r / d)
        res = jnp.linalg.norm(b - spmv(mat, x))
        return (x, it + 1, res)

    res0 = jnp.linalg.norm(b - spmv(mat, x))
    x, it, res = jax.lax.while_loop(cond, body, (x, jnp.zeros((), jnp.int32), res0))
    from ..formats.util import is_concrete

    if is_concrete(res):
        return IterativeResult(x, int(it), float(res), bool(res <= tol))
    return IterativeResult(x, it, res, res <= tol)


def gauss_seidel(
    mat: CsMat,
    b,
    x0=None,
    *,
    tol: float = 1e-8,
    max_iter: int = 300,
) -> IterativeResult:
    """Host Gauss–Seidel row sweep — exact parity with heat.rs:103-139.

    Numpy, eager, f64: the oracle the device solvers are checked against.
    """
    csr = mat.to_csr()
    n = csr.shape[0]
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices)
    data = np.asarray(csr.data)
    b_h = np.asarray(b, dtype=np.float64)
    x = (
        np.zeros(n, dtype=np.float64)
        if x0 is None
        else np.array(x0, dtype=np.float64)
    )
    from .. import native

    fast = native.gauss_seidel(indptr, indices, data, b_h, x, tol, max_iter)
    if fast is not None:
        xf, it, res = fast
        return IterativeResult(jnp.asarray(xf), it, res, res <= tol)
    res = float(np.linalg.norm(np.asarray(spmv(csr, x)) - b_h))
    it = 0
    while res > tol and it < max_iter:
        for i in range(n):
            sigma = 0.0
            diag = 0.0
            for p in range(indptr[i], indptr[i + 1]):
                j = indices[p]
                if j == i:
                    diag = data[p]
                else:
                    sigma += data[p] * x[j]
            x[i] = (b_h[i] - sigma) / diag
        it += 1
        # SpMV residual per sweep, like heat.rs:112,131
        res = float(np.linalg.norm(np.asarray(spmv(csr, jnp.asarray(x))) - b_h))
    return IterativeResult(jnp.asarray(x), it, res, res <= tol)
