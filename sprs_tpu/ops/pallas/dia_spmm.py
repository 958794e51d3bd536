"""Pallas TPU SpMM kernel over the DIA format (banded × dense RHS).

Same structure as the SpMV kernel (ops/pallas/dia_spmv.py) lifted to a
2-D grid: (k-tile, row-block) with the row dimension innermost so
neighbor row blocks of X can be carried in VMEM scratch across steps of
each k-sweep.  Diagonal shifts are sublane rolls of the (3·blk, kt)
window — static shifts, no gathers.

The default "lagflat" schedule combines the two SpMV tricks
(ops/pallas/dia_spmv.py): X crosses HBM once via a one-step output lag,
and the diagonal data is flat-tiled so each step streams it as one
contiguous DMA transfer.  It beats the older "carry" variant in every
measurement, but vs the fused XLA twin (formats/dia.dia_spmm, which
re-reads X per diagonal) results are process-dependent on the tunnel
chip: one process measured lagflat 1.75x faster (2M rows, 5 diagonals,
128 RHS: 9.6 vs 16.8 ms), while two later processes measured 0.80-0.90x
at the same config and a clean XLA win for RHS width < 128 (the kernel
pads the lane dim to 128, so k=8..64 wastes 16x..2x of the X/Y
traffic).  **formats/dia.dia_spmm stays the production default**; this
kernel is the opt-in Pallas family member for fusion contexts and wide
RHS.  The per-call retile of the diagonals costs 2·k·n of the
k·n + 2·n·R total traffic — ~4% at R=128.

Used by multi-RHS banded solves and as the building block for banded
blocks inside level-scheduled factorizations.
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
from .dia_spmv import tile_dia_data, untile_dia_data


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_lagflat_kernel(offsets, blk, kt, acc_dtype):
    def kernel(dat_ref, c_ref, o_ref, c1_ref, c2_ref):
        i = pl.program_id(1)  # row block (innermost)
        c = c_ref[:]

        @pl.when(i == 0)
        def _zero():
            c1_ref[:] = jnp.zeros_like(c1_ref)
            c2_ref[:] = jnp.zeros_like(c2_ref)

        @pl.when(i > 0)
        def _compute():
            whole = jnp.concatenate([c2_ref[:], c1_ref[:], c], axis=0)
            acc = jnp.zeros((blk, kt), acc_dtype)
            for d, off in enumerate(offsets):
                if off % 8 == 0:
                    # sublane-aligned offset: pure static slice, no
                    # cross-sublane shuffle
                    xs = jax.lax.slice(
                        whole, (blk + off, 0), (2 * blk + off, kt)
                    )
                else:
                    rolled = jnp.roll(whole, -off, axis=0)
                    xs = jax.lax.slice(
                        rolled, (blk, 0), (2 * blk, kt)
                    )
                acc = acc + (
                    dat_ref[d * blk : (d + 1) * blk].reshape(blk, 1)
                    * xs
                ).astype(acc_dtype)
            o_ref[:] = acc.astype(o_ref.dtype)

        c2_ref[:] = c1_ref[:]
        c1_ref[:] = c

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _dia_spmm_lagflat(dflat, xg, offsets, blk, kt, interpret):
    n_diags = len(offsets)
    rows_blk = dflat.shape[0] // n_diags
    n_blocks = rows_blk // blk
    kp = xg.shape[1]
    k_tiles = kp // kt
    out_dtype = jnp.promote_types(dflat.dtype, xg.dtype)
    acc_dtype = jnp.promote_types(out_dtype, jnp.float32)
    return pl.pallas_call(
        _make_lagflat_kernel(offsets, blk, kt, acc_dtype),
        grid=(k_tiles, n_blocks + 1),
        in_specs=[
            pl.BlockSpec(
                (n_diags * blk,),
                lambda j, i: (jnp.maximum(i - 1, 0),),
                memory_space=_VMEM,
            ),
            pl.BlockSpec(
                (blk, kt), lambda j, i: (i + 1, j), memory_space=_VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (blk, kt),
            lambda j, i: (jnp.maximum(i - 1, 0), j),
            memory_space=_VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((rows_blk, kp), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((blk, kt), xg.dtype),
            pltpu.VMEM((blk, kt), xg.dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_diags * rows_blk * kp,
            bytes_accessed=dflat.size * dflat.dtype.itemsize * k_tiles
            + xg.size * xg.dtype.itemsize
            + rows_blk * kp * out_dtype.itemsize,
            transcendentals=0,
        ),
        **_compiler_params(interpret),
    )(dflat, xg)


def _lagflat_fwd(dflat, xg, offsets, blk, kt, interpret):
    return _dia_spmm_lagflat(dflat, xg, offsets, blk, kt, interpret), (
        dflat,
        xg,
    )


def _lagflat_bwd(offsets, blk, kt, interpret, res, g):
    dflat, xg = res
    data = untile_dia_data(dflat, len(offsets), blk)
    ddata, dxg = _bwd(offsets, blk, kt, interpret, (data, xg), g)
    return tile_dia_data(ddata, blk), dxg


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
            if off % 8 == 0:
                xs = jax.lax.slice(
                    whole, (blk + off, 0), (2 * blk + off, kt)
                )
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
_dia_spmm_lagflat.defvjp(_lagflat_fwd, _lagflat_bwd)


def _pick_tiles(band: int, n_diags: int, k: int, itemsize: int):
    """blk=4096/kt=128 measured best for the lagflat schedule (2M rows,
    k=5, 128 RHS; blk=65536 OOMs VMEM — the X window carries a x kt
    factor).  Per step: ~12·blk·kt window/buffer elements + 2·k·blk
    data, against half the raised scoped-VMEM limit."""
    kt = min(_round_up(k, 128), 256)
    budget = 48 * 1024 * 1024
    blk = 4096
    while blk > 1024 and (
        12 * blk * kt * itemsize + 2 * n_diags * blk * itemsize
    ) > budget:
        blk //= 2
    return max(blk, _round_up(max(band, 1), 1024)), kt


def dia_spmm_pallas(
    dia: DiaMat,
    x: jax.Array,
    *,
    variant: str = "lagflat",
    interpret: bool = False,
) -> jax.Array:
    """Y = A @ X with the Pallas diagonal kernel (X dense, (cols, k)).

    ``variant``: "lagflat" (default; X read once via a one-step output
    lag, diagonals flat-tiled into one contiguous transfer per step) or
    "carry" (X read twice, strided diagonal tile).  Falls back to the
    XLA DIA path when the bandwidth exceeds the row block."""
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
    if variant == "lagflat":
        dflat = tile_dia_data(data, blk)
        y = _dia_spmm_lagflat(dflat, xg, dia.offsets, blk, kt, interpret)
    else:
        y = _dia_spmm_pallas(data, xg, dia.offsets, blk, kt, interpret)
    return y[: dia.rows, :k]
