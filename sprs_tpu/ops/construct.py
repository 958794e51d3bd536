"""Stacking and block construction.

Reference: /root/reference/sprs/src/sparse/construct.rs — vstack (CSR
native), hstack (CSC native), and scipy-style ``bmat`` from an optional
grid with shape inference (construct.rs:94-160).

TPU design: every variant lowers to "offset the COO coordinates of each
block, concatenate, sort-compress".  There are no duplicates across
blocks, so the compress is purely a vectorized re-sort establishing the
output's CSR invariant; the capacity is the exact sum of the block
capacities.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from ..errors import ShapeError
from ..formats.csmat import CSC, CSR, CsMat
from ..formats.util import compress_coo, is_concrete


def _stack_coo(blocks, row_offsets, col_offsets, shape, storage):
    if storage == CSR:
        n_outer, n_inner = shape
    else:
        n_outer, n_inner = shape[1], shape[0]
    outer_l, inner_l, vals_l = [], [], []
    dtype = blocks[0].data.dtype
    for m, ro, co in zip(blocks, row_offsets, col_offsets):
        r, c, v = m.coo_arrays()
        live = m.live_mask()
        r = jnp.minimum(r, m.shape[0] - 1) + ro
        c = jnp.minimum(c, m.shape[1] - 1) + co
        o, i = (r, c) if storage == CSR else (c, r)
        outer_l.append(jnp.where(live, o, n_outer))
        inner_l.append(jnp.where(live, i, 0))
        vals_l.append(
            jnp.where(live, v.astype(dtype), jnp.zeros((), dtype))
        )
    rows = jnp.concatenate(outer_l)
    cols = jnp.concatenate(inner_l)
    vals = jnp.concatenate(vals_l)
    concrete = is_concrete(*(m.indptr for m in blocks))
    out_cap = (
        max(sum(int(m.nnz) for m in blocks), 1)
        if concrete
        else max(int(rows.shape[0]), 1)
    )
    res = compress_coo(
        rows=rows,
        cols=cols,
        value_channels=(vals,),
        nvalid=rows.shape[0],
        n_outer=n_outer,
        n_inner=n_inner,
        out_cap=out_cap,
    )
    return CsMat(res.indptr, res.indices, res.values[0], shape, storage)


def vstack(blocks: Sequence[CsMat]) -> CsMat:
    """Stack matrices vertically (construct.rs:48-62). Result is CSR."""
    blocks = list(blocks)
    if not blocks:
        raise ShapeError("vstack of zero matrices")
    cols = blocks[0].shape[1]
    if any(m.shape[1] != cols for m in blocks):
        raise ShapeError("vstack: inconsistent column counts")
    row_offsets, acc = [], 0
    for m in blocks:
        row_offsets.append(acc)
        acc += m.shape[0]
    return _stack_coo(
        blocks, row_offsets, [0] * len(blocks), (acc, cols), CSR
    )


def hstack(blocks: Sequence[CsMat]) -> CsMat:
    """Stack matrices horizontally (construct.rs:66-81). Result is CSC."""
    blocks = list(blocks)
    if not blocks:
        raise ShapeError("hstack of zero matrices")
    rows = blocks[0].shape[0]
    if any(m.shape[0] != rows for m in blocks):
        raise ShapeError("hstack: inconsistent row counts")
    col_offsets, acc = [], 0
    for m in blocks:
        col_offsets.append(acc)
        acc += m.shape[1]
    return _stack_coo(
        blocks, [0] * len(blocks), col_offsets, (rows, acc), CSC
    )


def bmat(grid: Sequence[Sequence[Optional[CsMat]]]) -> CsMat:
    """Block matrix from an optional grid, scipy-style (construct.rs:94-160).

    ``None`` blocks are zero; their shapes are inferred from the
    row/column they sit in, and every row/column must contain at least
    one concrete block.
    """
    nrows_g = len(grid)
    if nrows_g == 0 or len(grid[0]) == 0:
        raise ShapeError("bmat of empty grid")
    ncols_g = len(grid[0])
    if any(len(row) != ncols_g for row in grid):
        raise ShapeError("bmat: ragged grid")

    row_h = [None] * nrows_g
    col_w = [None] * ncols_g
    for i, row in enumerate(grid):
        for j, m in enumerate(row):
            if m is None:
                continue
            if row_h[i] is None:
                row_h[i] = m.shape[0]
            elif row_h[i] != m.shape[0]:
                raise ShapeError(f"bmat: block row {i} height mismatch")
            if col_w[j] is None:
                col_w[j] = m.shape[1]
            elif col_w[j] != m.shape[1]:
                raise ShapeError(f"bmat: block col {j} width mismatch")
    if any(h is None for h in row_h):
        raise ShapeError("bmat: a block row has no entries")
    if any(w is None for w in col_w):
        raise ShapeError("bmat: a block col has no entries")

    row_off = [0] * nrows_g
    for i in range(1, nrows_g):
        row_off[i] = row_off[i - 1] + row_h[i - 1]
    col_off = [0] * ncols_g
    for j in range(1, ncols_g):
        col_off[j] = col_off[j - 1] + col_w[j - 1]
    shape = (row_off[-1] + row_h[-1], col_off[-1] + col_w[-1])

    blocks, ros, cos = [], [], []
    for i, row in enumerate(grid):
        for j, m in enumerate(row):
            if m is None:
                continue
            blocks.append(m)
            ros.append(row_off[i])
            cos.append(col_off[j])
    return _stack_coo(blocks, ros, cos, shape, CSR)


def block_diag(mats: Sequence[CsMat]) -> CsMat:
    """Block-diagonal matrix from a sequence of blocks
    (scipy.sparse.block_diag parity) — a diagonal :func:`bmat`."""
    mats = list(mats)
    n = len(mats)
    if n == 0:
        raise ShapeError("block_diag needs at least one block")
    grid = [
        [mats[i] if i == j else None for j in range(n)]
        for i in range(n)
    ]
    return bmat(grid)
