"""Multi-device distribution: row/block-sharded sparse kernels."""

from .dist import (
    Dist2DCsMat,
    DistCsMat,
    dist_spgemm,
    dist_spgemm_bshard,
    dist_spmm,
    dist_spmv,
    dist_spmv_2d,
    shard_csr_2d,
    shard_csr_rows,
)
from .halo import (
    HaloCsMat,
    HaloSplitCsMat,
    dist_spmv_halo,
    dist_spmv_halo_overlap,
    shard_csr_rows_halo,
    shard_csr_rows_halo_split,
)

__all__ = [
    "Dist2DCsMat",
    "DistCsMat",
    "HaloCsMat",
    "HaloSplitCsMat",
    "dist_spmv_halo_overlap",
    "shard_csr_rows_halo_split",
    "dist_spgemm",
    "dist_spgemm_bshard",
    "dist_spmm",
    "dist_spmv",
    "dist_spmv_2d",
    "dist_spmv_halo",
    "shard_csr_2d",
    "shard_csr_rows",
    "shard_csr_rows_halo",
]
