"""Pallas TPU SpMM kernel over the DIA format (banded × dense RHS).

Same structure as the SpMV kernel (ops/pallas/dia_spmv.py) lifted to a
2-D grid: (k-tile, row-block) with the row dimension innermost so the
left-neighbor row block of X can be carried in VMEM scratch across
steps of each k-sweep.  Diagonal shifts are sublane rolls of the
(3·blk, kt) window — static shifts, no gathers.

Used by multi-RHS banded solves and as the building block for banded
blocks inside level-scheduled factorizations.

Measured (v5e, 512² Laplacian, k=128): 3.3 ms vs fused XLA 2.8 ms — for
SpMM the x re-reads that hurt the XLA SpMV path amortize over k while
the kernel's window shuffles scale with k, so the XLA twin
(formats/dia.dia_spmm) is the production default; this kernel exists
for fusion contexts and as the multi-RHS member of the Pallas family.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

from ...errors import ShapeError
from ...formats.dia import DiaMat, dia_spmm
from ._common import compiler_params as _compiler_params


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(offsets, blk, kt, acc_dtype):
    def kernel(dat_ref, c_ref, r_ref, o_ref, carry_ref):
        i = pl.program_id(1)  # row block (innermost)
        c = c_ref[:]

        @pl.when(i == 0)
        def _zero():
            carry_ref[:] = jnp.zeros_like(carry_ref)

        whole = jnp.concatenate([carry_ref[:], c, r_ref[:]], axis=0)
        acc = jnp.zeros((blk, kt), acc_dtype)
        for d, off in enumerate(offsets):
            if off % (3 * blk) == 0:
                rolled = whole
            else:
                rolled = jnp.roll(whole, -off, axis=0)
            xs = jax.lax.slice(rolled, (blk, 0), (2 * blk, kt))
            acc = acc + (
                dat_ref[d, :].reshape(blk, 1) * xs
            ).astype(acc_dtype)
        o_ref[:] = acc.astype(o_ref.dtype)
        carry_ref[:] = c

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _dia_spmm_pallas(data, xg, offsets, blk, kt, interpret):
    n_diags, rows_blk = data.shape
    n_blocks = rows_blk // blk
    kp = xg.shape[1]
    k_tiles = kp // kt
    out_dtype = jnp.promote_types(data.dtype, xg.dtype)
    acc_dtype = jnp.promote_types(out_dtype, jnp.float32)
    y = pl.pallas_call(
        _make_kernel(offsets, blk, kt, acc_dtype),
        grid=(k_tiles, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (n_diags, blk), lambda j, i: (0, i), memory_space=_VMEM
            ),
            pl.BlockSpec(
                (blk, kt), lambda j, i: (i + 1, j), memory_space=_VMEM
            ),
            pl.BlockSpec(
                (blk, kt), lambda j, i: (i + 2, j), memory_space=_VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (blk, kt), lambda j, i: (i, j), memory_space=_VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks * blk, kp), out_dtype),
        scratch_shapes=[pltpu.VMEM((blk, kt), xg.dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_diags * rows_blk * kp,
            bytes_accessed=(
                data.size * data.dtype.itemsize * k_tiles
                + 2 * xg.size * xg.dtype.itemsize
                + rows_blk * kp * out_dtype.itemsize
            ),
            transcendentals=0,
        ),
        **_compiler_params(interpret),
    )(data, xg, xg)
    return y


def _fwd(data, xg, offsets, blk, kt, interpret):
    return _dia_spmm_pallas(data, xg, offsets, blk, kt, interpret), (
        data,
        xg,
    )


def _bwd(offsets, blk, kt, interpret, res, g):
    data, xg = res
    rows_blk = data.shape[1]
    ddata = []
    dxg = jnp.zeros_like(xg)
    for d, off in enumerate(offsets):
        xs = jax.lax.dynamic_slice(
            xg, (blk + off, 0), (rows_blk, xg.shape[1])
        )
        ddata.append(jnp.sum(g * xs, axis=1))
        dxg = jax.lax.dynamic_update_slice(
            dxg,
            jax.lax.dynamic_slice(
                dxg, (blk + off, 0), (rows_blk, xg.shape[1])
            )
            + data[d][:, None] * g,
            (blk + off, 0),
        )
    return jnp.stack(ddata).astype(data.dtype), dxg


_dia_spmm_pallas.defvjp(_fwd, _bwd)


def _pick_tiles(band: int, n_diags: int, k: int, itemsize: int):
    kt = min(_round_up(k, 128), 512)
    budget = 10 * 1024 * 1024
    blk = 65536
    # VMEM per step ~ 2x double-buffered (2 x-blocks + out) + carry +
    # window temps (~2x 3blk) + data tile
    while blk > 1024 and (
        (2 * 3 + 1 + 8) * blk * kt * itemsize
        + 2 * n_diags * blk * itemsize
    ) > budget:
        blk //= 2
    return max(blk, _round_up(max(band, 1), 1024)), kt


def dia_spmm_pallas(
    dia: DiaMat, x: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """Y = A @ X with the Pallas diagonal kernel (X dense, (cols, k)).

    Falls back to the XLA DIA path when the bandwidth exceeds the row
    block."""
    x = jnp.asarray(x)
    if x.ndim != 2 or x.shape[0] != dia.cols:
        raise ShapeError(f"dia_spmm: A is {dia.shape}, X is {x.shape}")
    band = dia.bandwidth
    k = x.shape[1]
    blk, kt = _pick_tiles(
        band, dia.n_diags, k, dia.data.dtype.itemsize
    )
    if band > blk:
        return dia_spmm(dia, x)
    kp = _round_up(max(k, 1), kt)
    rows_blk = _round_up(max(dia.rows, dia.cols, 1), blk)
    data = dia.data
    if data.shape[1] != rows_blk:
        data = jnp.zeros((dia.n_diags, rows_blk), data.dtype).at[
            :, : min(data.shape[1], rows_blk)
        ].set(data[:, :rows_blk])
    xg = jnp.zeros((rows_blk + 2 * blk, kp), x.dtype)
    xg = xg.at[blk : blk + dia.cols, :k].set(x)
    y = _dia_spmm_pallas(data, xg, dia.offsets, blk, kt, interpret)
    return y[: dia.rows, :k]
