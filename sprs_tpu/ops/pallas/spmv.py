"""Pallas TPU SpMV kernel over the ELL format.

Replaces the reference's scalar CSR/CSC row-sweep SpMV
(/root/reference/sprs/src/sparse/prod.rs:74-127) with a row-blocked
VMEM-pipelined kernel:

* grid over row blocks; each step DMAs a ``(row_block, width)`` tile of
  indices+data HBM→VMEM (Pallas double-buffers grid inputs automatically),
* ``x`` is resident in VMEM for the whole kernel (one HBM read total,
  instead of one gather per nnz touching HBM),
* the body is a gather + multiply + row-reduce on the VPU.

This is the speed-of-light schedule for unstructured SpMV on TPU: every
operand byte crosses HBM exactly once.  The XLA fallback
(:func:`sprs_tpu.formats.ell.ell_spmv`) is the correctness oracle and the
path for backends/shapes the kernel does not support (``x`` larger than
VMEM).

A custom VJP makes the kernel differentiable: d/dx is the scatter-form
transpose SpMV, d/d(data) is the same gather as the forward pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-specific bits are optional at import time (CPU test runs).
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

from ...formats.ell import EllMat, ell_spmv
from ._common import compiler_params as _compiler_params

# VMEM budget for keeping x resident.  With the raised scoped-VMEM
# limit (_common.VMEM_LIMIT_BYTES) x can stay resident up to ~48 MB
# while leaving half the limit for the streamed row tiles.
_X_VMEM_BYTES = 48 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(idx_ref, dat_ref, x_ref, o_ref):
    idx = idx_ref[:]
    x = x_ref[:]
    gathered = jnp.take(x, idx.reshape(-1), axis=0).reshape(idx.shape)
    o_ref[:] = jnp.sum(dat_ref[:] * gathered, axis=1)


def _pick_row_block(rows_pad: int, width: int, dtype_bytes: int) -> int:
    """Largest row block that divides rows_pad, is a multiple of 8, and
    keeps the (idx, dat) tiles within a modest VMEM slice."""
    budget = 2 * 1024 * 1024  # bytes for idx+dat tiles (x sits separately)
    per_row = width * (4 + dtype_bytes)
    cap = max(budget // max(per_row, 1), 8)
    blk = min(rows_pad, _round_up(min(cap, 1024), 8))
    while rows_pad % blk:
        blk -= 8
    return max(blk, 8)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ell_spmv_pallas(indices, data, x, shape, interpret):
    rows_pad, width = indices.shape
    blk = _pick_row_block(rows_pad, width, data.dtype.itemsize)
    grid = (rows_pad // blk,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (blk, width), lambda i: (i, 0), memory_space=_VMEM
            ),
            pl.BlockSpec(
                (blk, width), lambda i: (i, 0), memory_space=_VMEM
            ),
            pl.BlockSpec(memory_space=_VMEM),  # x resident
        ],
        out_specs=pl.BlockSpec((blk,), lambda i: (i,), memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad,), data.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * width,
            bytes_accessed=rows_pad
            * width
            * (4 + data.dtype.itemsize)
            + x.size * x.dtype.itemsize
            + rows_pad * data.dtype.itemsize,
            transcendentals=0,
        ),
        **_compiler_params(interpret),
    )(indices, data, x)
    return out[: shape[0]]


def _fwd(indices, data, x, shape, interpret):
    return _ell_spmv_pallas(indices, data, x, shape, interpret), (
        indices,
        data,
        x,
    )


def _bwd(shape, interpret, res, g):
    indices, data, x = res
    rows_pad = indices.shape[0]
    gp = jnp.zeros((rows_pad,), g.dtype).at[: shape[0]].set(g)
    # d/dx: transpose SpMV in scatter form (one pass over the same tiles).
    dx = jnp.zeros_like(x).at[indices].add(data * gp[:, None])
    # d/d(data): forward gather against the cotangent rows.
    ddata = jnp.take(x, indices.reshape(-1), axis=0).reshape(indices.shape)
    ddata = ddata * gp[:, None]
    return jnp.zeros_like(indices), ddata, dx


_ell_spmv_pallas.defvjp(_fwd, _bwd)


_COMPILED_GATHER = None


def _compiled_gather_supported() -> bool:
    """Probe (once per process) whether Mosaic can lower this kernel's
    gather.  As of this JAX, ``tpu.dynamic_gather`` only accepts
    same-shape 2-D take_along_axis patterns, so the arbitrary ELL gather
    fails to compile on TPU; banded matrices should use the DIA kernel
    (ops/pallas/dia_spmv.py) instead, which needs no gather at all.
    """
    global _COMPILED_GATHER
    if _COMPILED_GATHER is None:
        try:
            import numpy as np

            idx = jnp.zeros((8, 8), jnp.int32)
            dat = jnp.zeros((8, 8), jnp.float32)
            xs = jnp.zeros((16,), jnp.float32)
            np.asarray(_ell_spmv_pallas(idx, dat, xs, (8, 16), False))
            _COMPILED_GATHER = True
        except Exception:
            _COMPILED_GATHER = False
    return _COMPILED_GATHER


def ell_spmv_pallas(
    ell: EllMat, x: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """y = A @ x with the Pallas row-blocked kernel.

    Falls back to the XLA ELL path when ``x`` would not fit in VMEM or
    when the backend cannot lower the gather (probed once).
    ``interpret=True`` runs the kernel in interpreter mode (any backend),
    used by the CPU test suite.
    """
    x = jnp.asarray(x)
    if x.size * x.dtype.itemsize > _X_VMEM_BYTES:
        return ell_spmv(ell, x)
    if not interpret and not _compiled_gather_supported():
        return ell_spmv(ell, x)
    return _ell_spmv_pallas(
        ell.indices, ell.data, x, ell.shape, interpret
    )
