"""Pallas TPU batched bitonic sort (experimental).

Each matrix row of a ``(rows, 128)`` tile is co-sorted along the lane
axis by a bitonic network whose compare-exchange partners are static
circular ``jnp.roll`` shifts — no gathers, no scalar loops, one HBM
round trip for the whole batch.  Within a stage of shift ``j``,
element ``i`` pairs with ``i ^ j``; because the tile width is a power
of two and ``j < P``, ``roll(x, -j)`` (resp ``+j``) provides the
partner for lanes with bit ``j`` clear (resp set) without wraparound
corruption — the wrapped lanes are exactly the ones that read the
other roll.

Measured reality (v5e via the axon tunnel): lane-axis rolls are far
from VPU speed — the 28-stage network on 5.6M elements ran 159 ms,
NOT faster than the batched ``lax.sort`` twin (62-194 ms depending on
process health), whose dim-1 batched form costs about the same as a
trivial elementwise op.  **Use ``lax.sort(dimension=1)`` in
production**; this kernel is kept as tested infrastructure for fusion
contexts (sort fused with compare/dedup stages inside one VMEM pass,
where XLA would pay extra HBM round trips).

The reference has no analog (Rust ``sort_unstable`` serves everything:
triplet_iter.rs:143-150, smmp.rs:126).
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

from ._common import compiler_params as _compiler_params

LANES = 128


def _stage(key, val, lane, j, k):
    """One bitonic compare-exchange stage along the lane axis.

    Every predicate is an int comparison feeding a select over i32/f32
    operands; Mosaic cannot lower i1-valued selects or i1 vector
    algebra (trunci i8->i1), so booleans never combine with booleans
    here.  ``swap = new_key != key`` is tie-safe: equal keys keep their
    own value on both sides of the pair, so the network stays a
    permutation of (key, value) pairs."""
    pk_lo = jnp.roll(key, -j, axis=1)
    pk_hi = jnp.roll(key, j, axis=1)
    pv_lo = jnp.roll(val, -j, axis=1)
    pv_hi = jnp.roll(val, j, axis=1)
    use_lo = (lane & j) == 0
    pk = jnp.where(use_lo, pk_lo, pk_hi)
    pv = jnp.where(use_lo, pv_lo, pv_hi)
    # keep_min <=> bit_j(lane) == bit_k(lane) (partner-low in an
    # ascending block, or partner-high in a descending one); one int
    # compare, no i1 algebra.
    tj = j.bit_length() - 1
    tk = k.bit_length() - 1
    keep_min = (((lane >> tj) ^ (lane >> tk)) & 1) == 0
    kmin = jnp.minimum(key, pk)
    kmax = jnp.maximum(key, pk)
    new_key = jnp.where(keep_min, kmin, kmax)
    swap = new_key != key
    return new_key, jnp.where(swap, pv, val)


def _make_kernel(rows_blk):
    def kernel(k_ref, v_ref, ko_ref, vo_ref):
        key = k_ref[:]
        val = v_ref[:]
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (rows_blk, LANES), 1
        )
        k = 2
        while k <= LANES:
            j = k // 2
            while j >= 1:
                key, val = _stage(key, val, lane, j, k)
                j //= 2
            k *= 2
        ko_ref[:] = key
        vo_ref[:] = val

    return kernel


@functools.partial(jax.jit, static_argnames=("rows_blk", "interpret"))
def _sort_rows_128(keys, vals, rows_blk, interpret):
    n_rows = keys.shape[0]
    grid = (n_rows // rows_blk,)
    kernel = _make_kernel(rows_blk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (rows_blk, LANES), lambda i: (i, 0), memory_space=_VMEM
            ),
            pl.BlockSpec(
                (rows_blk, LANES), lambda i: (i, 0), memory_space=_VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (rows_blk, LANES), lambda i: (i, 0), memory_space=_VMEM
            ),
            pl.BlockSpec(
                (rows_blk, LANES), lambda i: (i, 0), memory_space=_VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(keys.shape, keys.dtype),
            jax.ShapeDtypeStruct(vals.shape, vals.dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=40 * 28 * keys.size,
            bytes_accessed=2
            * (
                keys.size * keys.dtype.itemsize
                + vals.size * vals.dtype.itemsize
            ),
            transcendentals=0,
        ),
        **_compiler_params(interpret),
    )(keys, vals)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def sort_rows_pallas(
    keys: jax.Array,
    vals: jax.Array,
    *,
    rows_blk: int = 512,
    interpret: bool = False,
):
    """Co-sort each row of ``(n_rows, 128)`` ``keys``/``vals`` ascending
    along the last axis, entirely in VMEM.

    ``keys`` must be int32 or float32 with exactly 128 columns (pad
    shorter segments with a +inf / INT32_MAX sentinel); ``vals`` rides
    the same permutation.  Rows are padded to a multiple of
    ``rows_blk`` internally.
    """
    if keys.ndim != 2 or keys.shape[1] != LANES:
        raise ValueError(
            f"sort_rows_pallas: keys must be (n, {LANES}), got "
            f"{keys.shape}"
        )
    n_rows = keys.shape[0]
    rows_blk = min(rows_blk, _round_up(max(n_rows, 8), 8))
    pad = _round_up(n_rows, rows_blk) - n_rows
    if pad:
        keys = jnp.concatenate(
            [keys, jnp.zeros((pad, LANES), keys.dtype)], axis=0
        )
        vals = jnp.concatenate(
            [vals, jnp.zeros((pad, LANES), vals.dtype)], axis=0
        )
    ks, vs = _sort_rows_128(keys, vals, rows_blk, interpret)
    return ks[:n_rows], vs[:n_rows]
