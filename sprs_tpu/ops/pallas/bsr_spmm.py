"""Pallas TPU block-sparse SpMM: grouped dense matmuls on the MXU.

The TPU-native answer to the reference's SpMM kernels (prod.rs:189-298)
for matrices with block structure.  One grid step per stored block:

  grid = (n_block_slots,)
  scalar-prefetch: brows[], bcols[]   (drive the BlockSpec index maps)
  A block  (bs, bs)   <- blocks[i]
  X block  (bs, k)    <- x[bcols[i]]
  Y block  (bs, k)    -> out[brows[i]]   (revisited across a block row)

Blocks are sorted by block row, so each output tile is revisited by
consecutive grid steps: the kernel zeroes a VMEM accumulator on the first
visit, accumulates ``A_blk @ X_blk`` on the MXU in f32, and writes the
tile on the last visit — the classic grouped-matmul (megablox) schedule.
Pallas double-buffers the A/X tile DMAs against the matmul, so the kernel
runs at MXU speed for dense-enough rows and at HBM speed otherwise.

Padding blocks carry zero data and the last real block row, so they
accumulate nothing and never break the revisit pattern; empty block rows
received an explicit zero block at conversion (see formats/bsr.py).
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
from ._common import compiler_params as _compiler_params
from ...formats.bsr import BsrMat


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(brows_ref, bcols_ref, blk_ref, x_ref, o_ref, acc_ref):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    row = brows_ref[i]
    prev = brows_ref[jnp.maximum(i - 1, 0)]
    nxt = brows_ref[jnp.minimum(i + 1, n - 1)]

    @pl.when((i == 0) | (row != prev))
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        blk_ref[0], x_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when((i == n - 1) | (row != nxt))
    def _flush():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _pallas_spmm(brows, bcols, blocks, xp, n_block_rows, interpret):
    cap, bs, _ = blocks.shape
    k = xp.shape[1]
    out_dtype = jnp.promote_types(blocks.dtype, xp.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cap,),
        in_specs=[
            pl.BlockSpec(
                (1, bs, bs),
                lambda i, br, bc: (i, 0, 0),
                memory_space=_VMEM,
            ),
            pl.BlockSpec(
                (bs, k),
                lambda i, br, bc: (bc[i], 0),
                memory_space=_VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (bs, k), lambda i, br, bc: (br[i], 0), memory_space=_VMEM
        ),
        scratch_shapes=[pltpu.VMEM((bs, k), jnp.float32)],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_block_rows * bs, k), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * cap * bs * bs * k,
            bytes_accessed=cap * bs * bs * blocks.dtype.itemsize
            + cap * bs * k * xp.dtype.itemsize
            + n_block_rows * bs * k * out_dtype.itemsize,
            transcendentals=0,
        ),
        **_compiler_params(interpret),
    )(brows, bcols, blocks, xp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _bsr_spmm(brows, bcols, blocks, xp, n_block_rows, n_block_cols, interpret):
    return _pallas_spmm(brows, bcols, blocks, xp, n_block_rows, interpret)


def _spmm_fwd(brows, bcols, blocks, xp, nbr, nbc, interpret):
    y = _bsr_spmm(brows, bcols, blocks, xp, nbr, nbc, interpret)
    return y, (brows, bcols, blocks, xp)


def _spmm_bwd(nbr, nbc, interpret, res, g):
    brows, bcols, blocks, xp = res
    bs = blocks.shape[1]
    k = xp.shape[1]
    gb = g.reshape(nbr, bs, k)
    xb = xp.reshape(nbc, bs, k)
    # dBlocks[n] = G[brows[n]] @ X[bcols[n]]^T  (zero-padding rides along)
    dblocks = jnp.einsum(
        "nik,njk->nij",
        gb[brows],
        xb[bcols],
        preferred_element_type=jnp.float32,
    ).astype(blocks.dtype)
    # dX[bcols[n]] += Blocks[n]^T @ G[brows[n]]
    contrib = jnp.einsum(
        "nji,njk->nik",
        blocks,
        gb[brows],
        preferred_element_type=jnp.float32,
    )
    dxb = jnp.zeros((nbc, bs, k), contrib.dtype).at[bcols].add(
        contrib, mode="drop"
    )
    return (
        jnp.zeros_like(brows),
        jnp.zeros_like(bcols),
        dblocks,
        dxb.reshape(nbc * bs, k).astype(xp.dtype),
    )


_bsr_spmm.defvjp(_spmm_fwd, _spmm_bwd)


def bsr_spmm_pallas(
    bsr: BsrMat, x: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """Y = A @ X on the MXU.  X is (cols, k); k is padded to 128 lanes."""
    x = jnp.asarray(x)
    if x.ndim != 2 or x.shape[0] != bsr.cols:
        raise ShapeError(f"bsr_spmm: A is {bsr.shape}, X is {x.shape}")
    bs = bsr.block_size
    k = x.shape[1]
    kp = _round_up(max(k, 1), 128)
    xp = jnp.zeros((bsr.n_block_cols * bs, kp), x.dtype)
    xp = xp.at[: bsr.cols, :k].set(x)
    y = _bsr_spmm(
        bsr.brows,
        bsr.bcols,
        bsr.blocks,
        xp,
        bsr.n_block_rows,
        bsr.n_block_cols,
        interpret,
    )
    return y[: bsr.rows, :k]


def bsr_spmv_pallas(
    bsr: BsrMat, x: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """y = A @ x via the SpMM kernel with a single padded lane block."""
    return bsr_spmm_pallas(bsr, jnp.asarray(x)[:, None], interpret=interpret)[
        :, 0
    ]


# ---------------------------------------------------------------------------
# grouped kernel: G blocks per grid step
# ---------------------------------------------------------------------------


def bsr_group(bsr: BsrMat, group: int) -> BsrMat:
    """Host-side repack: pad each block row's block count to a multiple
    of ``group`` with zero blocks so every grid step of the grouped
    kernel sees blocks of a single row.

    Measured motivation: each Pallas grid step costs ~10us of fixed
    dispatch overhead on the axon v5e (a trivial copy kernel pays the
    same), so at low block density the G=1 kernel is overhead-bound;
    grouping divides the step count by G.
    """
    import numpy as np

    nb = bsr.n_blocks
    brows = np.asarray(bsr.brows)[:nb]
    bcols = np.asarray(bsr.bcols)[:nb]
    blocks = np.asarray(bsr.blocks)[:nb]
    bs = bsr.block_size
    out_r, out_c, out_b = [], [], []
    for r in range(bsr.n_block_rows):
        sel = brows == r
        k = int(sel.sum())
        pad = (-k) % group
        out_r.append(np.full(k + pad, r, np.int32))
        out_c.append(
            np.concatenate([bcols[sel], np.zeros(pad, np.int32)])
        )
        out_b.append(
            np.concatenate(
                [blocks[sel], np.zeros((pad, bs, bs), blocks.dtype)]
            )
        )
    brows2 = np.concatenate(out_r)
    return BsrMat(
        jnp.asarray(brows2),
        jnp.asarray(np.concatenate(out_c)),
        jnp.asarray(np.concatenate(out_b)),
        bsr.shape,
        int(brows2.shape[0]),
    )


def _grouped_kernel(group, bs, k):
    def kernel(brows_ref, bcols_ref, blk_ref, x_ref, o_ref, acc_ref):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        row = brows_ref[i * group]
        prev = brows_ref[jnp.maximum(i - 1, 0) * group]
        nxt = brows_ref[jnp.minimum(i + 1, n - 1) * group]

        @pl.when((i == 0) | (row != prev))
        def _zero():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        for g in range(group):
            start = pl.multiple_of(bcols_ref[i * group + g] * bs, bs)
            xg = x_ref[pl.ds(start, bs), :]
            acc_ref[:] += jnp.dot(
                blk_ref[g], xg, preferred_element_type=jnp.float32
            )

        @pl.when((i == n - 1) | (row != nxt))
        def _flush():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kernel


def bsr_spmm_pallas_grouped(
    bsr: BsrMat,
    x: jax.Array,
    *,
    group: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Y = A @ X processing ``group`` blocks per grid step.

    ``bsr`` must be row-group-aligned (use :func:`bsr_group`).  X stays
    resident in VMEM (falls back to the per-block kernel when it would
    not fit).  The per-step x lookups are aligned dynamic slices of the
    resident X — the one dynamic-indexing pattern Mosaic supports.
    """
    x = jnp.asarray(x)
    if x.ndim != 2 or x.shape[0] != bsr.cols:
        raise ShapeError(f"bsr_spmm: A is {bsr.shape}, X is {x.shape}")
    bs = bsr.block_size
    k = x.shape[1]
    kp = _round_up(max(k, 1), 128)
    xp = jnp.zeros((bsr.n_block_cols * bs, kp), x.dtype)
    xp = xp.at[: bsr.cols, :k].set(x)
    if (
        bsr.cap % group != 0
        or xp.size * xp.dtype.itemsize > 10 * 1024 * 1024
    ):
        return bsr_spmm_pallas(bsr, x, interpret=interpret)

    out_dtype = jnp.promote_types(bsr.dtype, x.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsr.cap // group,),
        in_specs=[
            pl.BlockSpec(
                (group, bs, bs),
                lambda i, br, bc: (i, 0, 0),
                memory_space=_VMEM,
            ),
            pl.BlockSpec(memory_space=_VMEM),  # X resident
        ],
        out_specs=pl.BlockSpec(
            (bs, kp),
            lambda i, br, bc, g=group: (br[i * g], 0),
            memory_space=_VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((bs, kp), jnp.float32)],
    )
    y = pl.pallas_call(
        _grouped_kernel(group, bs, kp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (bsr.n_block_rows * bs, kp), out_dtype
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bsr.cap * bs * bs * kp,
            bytes_accessed=bsr.cap * bs * bs * bsr.dtype.itemsize
            + xp.size * xp.dtype.itemsize
            + bsr.n_block_rows * bs * kp * out_dtype.itemsize,
            transcendentals=0,
        ),
        **_compiler_params(interpret),
    )(bsr.brows, bsr.bcols, bsr.blocks, xp)
    return y[: bsr.rows, :k]
