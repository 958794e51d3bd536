"""Pallas TPU SpMV kernel over the DIA format — the zero-gather path.

One grid step per row block.  The (n_diags, blk) data tile streams
HBM→VMEM (auto double-buffered).  ``x`` is laid out as ``(n_blocks+2,
blk)`` with zero guard blocks at both ends; each step receives the
left/center/right neighbor blocks, so a diagonal shifted by
``off`` (|off| <= blk) is a static rotation of the concatenated
``(1, 3*blk)`` window followed by an aligned slice — no gathers, no
unaligned vector loads (Mosaic rejects both for dynamic 1-D indexing).
The body is k fused multiply-adds on the VPU.

HBM traffic per SpMV: data once (k·n), x twice (center + right-neighbor
blocks; the left neighbor is last step's center carried in VMEM scratch),
y once — within ~1.3x of the k·n+2n speed-of-light for k >= 5, and
materially less than the XLA path, which re-reads x once per diagonal.

This is the production SpMV for banded matrices (grid Laplacians,
RCM-ordered systems) and the kernel behind bench.py's roofline number.
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
from ...formats.dia import DiaMat, dia_spmv


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _roll(v, shift, axis):
    """Static circular shift.  jnp.roll measured faster than pltpu.roll
    for this access pattern on v5e (600us vs 1060us at blk=65536 on the
    4.2M-row Laplacian), and it accepts negative shifts.  shift==0 must
    be skipped: Mosaic rejects the zero-width slice jnp.roll emits."""
    if shift % v.shape[axis] == 0:
        return v
    return jnp.roll(v, shift, axis=axis)


def _make_kernel(offsets, blk, acc_dtype):
    def kernel(dat_ref, center_ref, right_ref, o_ref, carry_ref):
        # The left-neighbor block is last step's center, carried in VMEM
        # scratch (TPU grids run sequentially) — one fewer HBM fetch of
        # x per step (traffic k·n + 2n + n instead of k·n + 3n).
        i = pl.program_id(0)
        c = center_ref[:].reshape(1, blk)

        @pl.when(i == 0)
        def _zero():
            carry_ref[:] = jnp.zeros_like(carry_ref)

        left = carry_ref[:].reshape(1, blk)
        whole = jnp.concatenate(
            [left, c, right_ref[:].reshape(1, blk)], axis=1
        )  # (1, 3*blk); whole[0, blk + j] = x[base + j]
        acc = jnp.zeros((1, blk), acc_dtype)
        for d, off in enumerate(offsets):
            # xs[0, j] = whole[0, blk + j + off]
            rolled = _roll(whole, -off, axis=1)
            xs = jax.lax.slice(rolled, (0, blk), (1, 2 * blk))
            acc = acc + (dat_ref[d, :].reshape(1, blk) * xs).astype(
                acc_dtype
            )
        o_ref[:] = acc.reshape(blk).astype(o_ref.dtype)
        carry_ref[:] = c.reshape(blk)

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _dia_spmv_pallas(data, xg, offsets, blk, interpret):
    n_diags, rows_blk = data.shape
    n_blocks = rows_blk // blk
    out_dtype = jnp.promote_types(data.dtype, xg.dtype)
    acc_dtype = jnp.promote_types(out_dtype, jnp.float32)
    y = pl.pallas_call(
        _make_kernel(offsets, blk, acc_dtype),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (n_diags, blk), lambda i: (0, i), memory_space=_VMEM
            ),
            pl.BlockSpec((blk,), lambda i: (i + 1,), memory_space=_VMEM),
            pl.BlockSpec((blk,), lambda i: (i + 2,), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((blk,), lambda i: (i,), memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * blk,), out_dtype),
        scratch_shapes=[_scratch(blk, xg.dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_diags * rows_blk,
            bytes_accessed=data.size * data.dtype.itemsize
            + 2 * xg.size * xg.dtype.itemsize
            + rows_blk * out_dtype.itemsize,
            transcendentals=0,
        ),
    )(data, xg, xg)
    return y


def _fwd(data, xg, offsets, blk, interpret):
    return _dia_spmv_pallas(data, xg, offsets, blk, interpret), (data, xg)


def _bwd(offsets, blk, interpret, res, g):
    data, xg = res
    rows_blk = data.shape[1]
    ddata = []
    dxg = jnp.zeros_like(xg)
    for d, off in enumerate(offsets):
        xs = jax.lax.dynamic_slice(xg, (blk + off,), (rows_blk,))
        ddata.append(g * xs)
        dxg = jax.lax.dynamic_update_slice(
            dxg,
            jax.lax.dynamic_slice(dxg, (blk + off,), (rows_blk,))
            + data[d] * g,
            (blk + off,),
        )
    return jnp.stack(ddata).astype(data.dtype), dxg


_dia_spmv_pallas.defvjp(_fwd, _bwd)


def _scratch(blk: int, dtype):
    """VMEM carry buffer for the left-neighbor block."""
    if pltpu is None:  # pragma: no cover
        raise RuntimeError("pallas tpu backend unavailable")
    return pltpu.VMEM((blk,), dtype)


def _pick_blk(band: int, rows: int, n_diags: int, itemsize: int) -> int:
    """Row-block autotune: large blocks amortize per-step overhead
    (65536 measured best on v5e: 600us vs 816us at 4096 for the 4.2M-row
    Laplacian); cap by a VMEM budget.  Per step the kernel holds ~2x
    double-buffered (n_diags+4)*blk elements plus ~6*blk of temporaries.
    """
    budget = 10 * 1024 * 1024
    blk = 65536
    while blk > 1024 and (2 * (n_diags + 4) + 6) * blk * itemsize > budget:
        blk //= 2
    return max(blk, _round_up(band, 1024), 1024)


def dia_spmv_pallas(
    dia: DiaMat, x: jax.Array, *, blk: int = None, interpret: bool = False
) -> jax.Array:
    """y = A @ x with the Pallas diagonal kernel.

    Requires bandwidth <= block size; wider bands fall back to the XLA
    DIA path.  ``blk`` overrides the autotuned row-block size (must be a
    multiple of 1024).
    """
    x = jnp.asarray(x)
    if x.shape != (dia.cols,):
        raise ShapeError(f"dia_spmv: A is {dia.shape}, x is {x.shape}")
    band = dia.bandwidth
    if blk is None:
        blk = _pick_blk(
            band, dia.rows, dia.n_diags, dia.data.dtype.itemsize
        )
    if band > blk:
        return dia_spmv(dia, x)

    rows_blk = _round_up(max(dia.rows, dia.cols, 1), blk)
    # data padded to (n_diags, rows_blk); x embedded with guard blocks:
    # xg[blk + t] = x[t] for t < cols, zero elsewhere.
    data = dia.data
    if data.shape[1] != rows_blk:
        data = jnp.zeros((dia.n_diags, rows_blk), data.dtype).at[
            :, : data.shape[1]
        ].set(data[:, :rows_blk] if data.shape[1] > rows_blk else data)
    xg = jnp.zeros((rows_blk + 2 * blk,), x.dtype).at[
        blk : blk + dia.cols
    ].set(x)
    y = _dia_spmv_pallas(data, xg, dia.offsets, blk, interpret)
    return y[: dia.rows]
