"""BSR (block compressed sparse row) — the MXU-native sparse format.

The reference has no block format; its scalar `MulAcc` genericity lets
callers use 2×2 ndarray blocks as the scalar type instead
(/root/reference/sprs/tests/block_matrix.rs:1-108).  On TPU the right
answer is structural: store nonzero **tiles** whose shape matches the
MXU/VPU native tiles (multiples of 8×128, canonically 128×128), so that
SpMM becomes a stream of dense ``block @ rhs_block`` matmuls at full MXU
utilization — the grouped-matmul pattern.  Density above a few percent at
block granularity already beats any gather-based kernel.

Layout: blocks are sorted by (block_row, block_col) and stored as a dense
``(n_blocks_cap, bs, bs)`` stack plus per-block coordinate vectors.  Two
invariants make the Pallas kernel trivial:

* every block row stores **at least one** block (conversion inserts an
  explicit zero block into empty rows) so each output tile is written;
* padding blocks (slots >= n_blocks) carry the last real block's row, a
  column of 0, and zero data — they accumulate nothing and preserve the
  sorted-by-row order the kernel's first/last-visit logic relies on.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import ShapeError
from .csmat import CsMat
from .util import INDEX_DTYPE


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BsrMat:
    """Block-sparse matrix with square ``block_size`` tiles.

    Leaves: ``brows (cap,) i32``, ``bcols (cap,) i32``,
    ``blocks (cap, bs, bs)``.  Static: ``shape`` (logical), ``n_blocks``
    (live count — static so the Pallas grid can be built from it).
    """

    brows: jax.Array
    bcols: jax.Array
    blocks: jax.Array
    shape: Tuple[int, int]
    n_blocks: int

    def tree_flatten(self):
        return (self.brows, self.bcols, self.blocks), (
            self.shape,
            self.n_blocks,
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        shape, n_blocks = aux
        brows, bcols, blocks = leaves
        return cls(brows, bcols, blocks, shape, n_blocks)

    @property
    def block_size(self) -> int:
        return self.blocks.shape[1]

    @property
    def rows(self) -> int:
        return self.shape[0]

    @property
    def cols(self) -> int:
        return self.shape[1]

    @property
    def n_block_rows(self) -> int:
        return _round_up(self.shape[0], self.block_size) // self.block_size

    @property
    def n_block_cols(self) -> int:
        return _round_up(self.shape[1], self.block_size) // self.block_size

    @property
    def cap(self) -> int:
        return self.blocks.shape[0]

    @property
    def dtype(self):
        return self.blocks.dtype

    @property
    def block_density(self) -> float:
        return self.n_blocks / max(
            self.n_block_rows * self.n_block_cols, 1
        )

    def to_dense(self) -> jax.Array:
        bs = self.block_size
        out = jnp.zeros(
            (self.n_block_rows, self.n_block_cols, bs, bs),
            dtype=self.blocks.dtype,
        )
        out = out.at[self.brows, self.bcols].add(self.blocks, mode="drop")
        dense = out.transpose(0, 2, 1, 3).reshape(
            self.n_block_rows * bs, self.n_block_cols * bs
        )
        return dense[: self.rows, : self.cols]

    def slice_block_rows(self, r0: int, r1: int) -> "BsrMat":
        """Rows ``[r0, r1)`` as a new BsrMat (bounds must be
        ``block_size``-aligned except ``r1 == rows``; concrete-only —
        the surviving block list is fetched to fix static shapes)."""
        bs = self.block_size
        if r0 % bs or (r1 % bs and r1 != self.rows):
            raise ShapeError(
                f"slice_block_rows bounds ({r0}, {r1}) must align to "
                f"block_size {bs}"
            )
        br = np.asarray(self.brows)[: self.n_blocks]
        keep = np.nonzero((br >= r0 // bs) & (br < -(-r1 // bs)))[0]
        nb = keep.size
        if nb == 0:
            return BsrMat(
                jnp.zeros((1,), INDEX_DTYPE),
                jnp.zeros((1,), INDEX_DTYPE),
                jnp.zeros((1, bs, bs), self.dtype),
                (r1 - r0, self.cols),
                1,
            )
        ids = jnp.asarray(keep, INDEX_DTYPE)
        return BsrMat(
            jnp.asarray(br[keep] - r0 // bs, INDEX_DTYPE),
            self.bcols[ids],
            self.blocks[ids],
            (r1 - r0, self.cols),
            int(nb),
        )

    def to_csmat(self, *, eps: float = 0.0, cap: Optional[int] = None):
        """CSR view of this block matrix (``from_dense`` on the
        densified blocks — the expensive exit from the BSR chain: CSR
        placement is per-element and scatter-unit bound, which is
        exactly what the BSR product path avoids; convert once at the
        end of a pipeline, not between products)."""
        from .csmat import from_dense

        return from_dense(self.to_dense(), eps=eps, cap=cap)

    def __matmul__(self, other):
        from ..ops import matmul

        return matmul(self, other)

    def __repr__(self):
        return (
            f"BsrMat(shape={self.shape}, bs={self.block_size}, "
            f"n_blocks={self.n_blocks}/{self.cap}, "
            f"block_density={self.block_density:.4f}, dtype={self.dtype})"
        )


def bsr_from_dense(
    arr,
    block_size: int = 128,
    *,
    eps: float = 0.0,
    cap: Optional[int] = None,
    dtype=None,
) -> BsrMat:
    """Host-side conversion: keep blocks with any |entry| > eps.

    Empty block rows get one explicit zero block (kernel invariant)."""
    a = np.asarray(arr)
    if a.ndim != 2:
        raise ShapeError("bsr_from_dense expects a 2-D array")
    r, c = a.shape
    bs = block_size
    nbr, nbc = _round_up(r, bs) // bs, _round_up(c, bs) // bs
    padded = np.zeros((nbr * bs, nbc * bs), dtype=a.dtype)
    padded[:r, :c] = a
    tiles = padded.reshape(nbr, bs, nbc, bs).transpose(0, 2, 1, 3)
    keep = np.abs(tiles).max(axis=(2, 3)) > eps

    brows, bcols, blocks = [], [], []
    for i in range(nbr):
        cols_i = np.nonzero(keep[i])[0]
        if cols_i.size == 0:
            cols_i = np.array([0])  # explicit zero block
            tiles_i = np.zeros((1, bs, bs), dtype=a.dtype)
        else:
            tiles_i = tiles[i, cols_i]
        brows.append(np.full(cols_i.shape, i, dtype=np.int32))
        bcols.append(cols_i.astype(np.int32))
        blocks.append(tiles_i)
    brows = np.concatenate(brows)
    bcols = np.concatenate(bcols)
    blocks = np.concatenate(blocks)
    n_blocks = brows.shape[0]

    if cap is None:
        cap = n_blocks
    if cap < n_blocks:
        raise ShapeError(f"cap {cap} < n_blocks {n_blocks}")
    if cap > n_blocks:
        pad = cap - n_blocks
        brows = np.concatenate(
            [brows, np.full((pad,), brows[-1], dtype=np.int32)]
        )
        bcols = np.concatenate([bcols, np.zeros((pad,), dtype=np.int32)])
        blocks = np.concatenate(
            [blocks, np.zeros((pad, bs, bs), dtype=a.dtype)]
        )
    out_dtype = dtype or a.dtype
    return BsrMat(
        jnp.asarray(brows, INDEX_DTYPE),
        jnp.asarray(bcols, INDEX_DTYPE),
        jnp.asarray(blocks, out_dtype),
        (r, c),
        int(n_blocks),
    )


def bsr_from_csmat(
    mat: CsMat, block_size: int = 128, *, cap: Optional[int] = None
) -> BsrMat:
    """Host-side CSR → BSR conversion (concrete matrices only).

    Sparse-native: blocks are derived from the entry coordinates alone
    (O(nnz) host work), never by densifying — a 1M² matrix with 10M
    entries converts in milliseconds where the old dense detour would
    have materialized 4 TB.  A block exists iff it contains at least
    one STRUCTURAL entry (explicit stored zeros keep their block, a
    minor semantic difference from ``bsr_from_dense``'s eps filter);
    empty block rows get one explicit zero block (kernel invariant),
    matching :func:`bsr_from_dense`.
    """
    a = mat.to_csr()
    indptr = np.asarray(a.indptr)
    nnz = int(indptr[-1])
    cols = np.asarray(a.indices)[:nnz]
    vals = np.asarray(a.data)[:nnz]
    rows = np.repeat(
        np.arange(a.rows, dtype=np.int64), np.diff(indptr)
    )
    r, c = a.shape
    bs = block_size
    nbr, nbc = _round_up(r, bs) // bs, _round_up(c, bs) // bs

    br = rows // bs
    bc = cols.astype(np.int64) // bs
    key = br * nbc + bc
    uniq = np.unique(key)  # sorted == (brow, bcol) lexicographic
    blk_of = np.searchsorted(uniq, key)
    u_br = (uniq // nbc).astype(np.int32)
    u_bc = (uniq % nbc).astype(np.int32)

    # explicit zero block for empty block rows
    present = np.zeros(nbr, dtype=bool)
    present[u_br] = True
    missing = np.nonzero(~present)[0].astype(np.int32)
    all_br = np.concatenate([u_br, missing])
    all_bc = np.concatenate(
        [u_bc, np.zeros(missing.size, np.int32)]
    )
    order = np.lexsort((all_bc, all_br))
    pos = np.empty(all_br.size, np.int64)
    pos[order] = np.arange(all_br.size)
    blk_new = pos[blk_of]  # real blocks are the first uniq.size slots

    n_blocks = all_br.size
    blocks = np.zeros((n_blocks, bs, bs), dtype=vals.dtype)
    blocks[blk_new, rows % bs, cols % bs] = vals
    brows = all_br[order]
    bcols = all_bc[order]

    if cap is None:
        cap = n_blocks
    if cap < n_blocks:
        raise ShapeError(f"cap {cap} < n_blocks {n_blocks}")
    if cap > n_blocks:
        pad = cap - n_blocks
        brows = np.concatenate(
            [brows, np.full((pad,), brows[-1], dtype=np.int32)]
        )
        bcols = np.concatenate(
            [bcols, np.zeros((pad,), dtype=np.int32)]
        )
        blocks = np.concatenate(
            [blocks, np.zeros((pad, bs, bs), dtype=vals.dtype)]
        )
    return BsrMat(
        jnp.asarray(brows, INDEX_DTYPE),
        jnp.asarray(bcols, INDEX_DTYPE),
        jnp.asarray(blocks, mat.data.dtype),
        (r, c),
        int(n_blocks),
    )


def bsr_spmm_xla(bsr: BsrMat, x: jax.Array) -> jax.Array:
    """Y = A @ X, pure-XLA reference (batched block matmul + scatter-add).

    The correctness oracle for the Pallas kernel and the portable path on
    non-TPU backends.  Fully jittable.
    """
    x = jnp.asarray(x)
    if x.ndim != 2 or x.shape[0] != bsr.cols:
        raise ShapeError(f"bsr_spmm: A is {bsr.shape}, X is {x.shape}")
    bs = bsr.block_size
    k = x.shape[1]
    xp = jnp.zeros((bsr.n_block_cols * bs, k), x.dtype).at[: bsr.cols].set(x)
    xb = xp.reshape(bsr.n_block_cols, bs, k)
    prods = jnp.einsum(
        "nij,njk->nik",
        bsr.blocks,
        xb[bsr.bcols],
        preferred_element_type=jnp.float32,
    )
    out = jnp.zeros(
        (bsr.n_block_rows, bs, k), dtype=prods.dtype
    ).at[bsr.brows].add(prods, mode="drop")
    out = out.reshape(bsr.n_block_rows * bs, k)[: bsr.rows]
    return out.astype(x.dtype) if x.dtype == bsr.dtype else out


def bsr_random(
    key,
    shape: Tuple[int, int],
    block_size: int = 128,
    block_density: float = 0.1,
    dtype=jnp.float32,
) -> BsrMat:
    """Random block-sparse matrix for benches/tests (host-side)."""
    rng = np.random.default_rng(
        int(jax.random.randint(key, (), 0, 2**31 - 1))
    )
    bs = block_size
    nbr = _round_up(shape[0], bs) // bs
    nbc = _round_up(shape[1], bs) // bs
    keep = rng.random((nbr, nbc)) < block_density
    dense = np.zeros((nbr * bs, nbc * bs), dtype=np.float32)
    for i, j in zip(*np.nonzero(keep)):
        dense[i * bs : (i + 1) * bs, j * bs : (j + 1) * bs] = rng.standard_normal((bs, bs))
    return bsr_from_dense(
        dense[: shape[0], : shape[1]], bs, dtype=dtype
    )


def bsr_from_dense_device(
    arr: jax.Array,
    block_size: int = 128,
    *,
    eps: float = 0.0,
) -> BsrMat:
    """Device-side dense → BSR: the scatter-free compaction path.

    `from_dense` (CSR) places every nonzero individually and tops out
    at the TPU's ~50M elem/s scatter-unit rate — 2.0 s for the 104M-nnz
    dense-SpGEMM product (BASELINE.md round 4).  Block extraction has
    no per-element placement: the block mask is a reduction, and the
    kept blocks are ONE gather of contiguous (bs·bs)-element slices —
    one gather index per 16K elements at bs=128, so the whole
    conversion runs at HBM bandwidth.

    Concrete-only (the live block list must be fetched to pick static
    shapes); the transfer is the tiny (nbr·nbc) block mask, never the
    dense array.  Rows/cols are zero-padded up to a block multiple;
    empty block rows get the explicit zero block the SpMM kernels
    require.
    """
    if arr.ndim != 2:
        raise ShapeError("bsr_from_dense_device expects a 2-D array")
    r, c = arr.shape
    bs = block_size
    nbr, nbc = _round_up(r, bs) // bs, _round_up(c, bs) // bs

    @jax.jit
    def _tiles_and_mask(a):
        pad = jnp.zeros((nbr * bs, nbc * bs), a.dtype)
        pad = pad.at[:r, :c].set(a)
        t = pad.reshape(nbr, bs, nbc, bs).transpose(0, 2, 1, 3)
        keep = jnp.abs(t).max(axis=(2, 3)) > eps
        return t.reshape(nbr * nbc, bs, bs), keep

    tiles, keep = _tiles_and_mask(arr)
    keep_h = np.asarray(keep)  # (nbr, nbc) bools — the only transfer

    brows, bcols, flat_ids = [], [], []
    for i in range(nbr):
        cols_i = np.nonzero(keep_h[i])[0]
        if cols_i.size == 0:
            # explicit zero block: gather block (i, 0) and zero it below
            cols_i = np.array([0])
            zero_row = True
        else:
            zero_row = False
        brows.append(np.full(cols_i.shape, i, dtype=np.int32))
        bcols.append(cols_i.astype(np.int32))
        ids = (i * nbc + cols_i).astype(np.int32)
        if zero_row:
            ids = -ids - 1  # mark for zeroing (any block works)
        flat_ids.append(ids)
    brows = np.concatenate(brows)
    bcols = np.concatenate(bcols)
    flat_ids = np.concatenate(flat_ids)
    live = flat_ids >= 0
    gather_ids = np.where(live, flat_ids, -flat_ids - 1)
    n_blocks = brows.shape[0]

    @jax.jit
    def _gather(t, ids, live_mask):
        out = t[ids]
        return out * live_mask[:, None, None].astype(t.dtype)

    blocks = _gather(
        tiles,
        jnp.asarray(gather_ids, INDEX_DTYPE),
        jnp.asarray(live),
    )
    return BsrMat(
        jnp.asarray(brows, INDEX_DTYPE),
        jnp.asarray(bcols, INDEX_DTYPE),
        blocks,
        (r, c),
        int(n_blocks),
    )
