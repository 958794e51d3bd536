"""Multi-device distribution: row/block-sharded sparse kernels."""

from .dist import (
    Dist2DCsMat,
    DistCsMat,
    dist_spgemm,
    dist_spgemm_bshard,
    dist_spmv,
    dist_spmv_2d,
    shard_csr_2d,
    shard_csr_rows,
)
from .halo import HaloCsMat, dist_spmv_halo, shard_csr_rows_halo

__all__ = [
    "Dist2DCsMat",
    "DistCsMat",
    "HaloCsMat",
    "dist_spgemm",
    "dist_spgemm_bshard",
    "dist_spmv",
    "dist_spmv_2d",
    "dist_spmv_halo",
    "shard_csr_2d",
    "shard_csr_rows",
    "shard_csr_rows_halo",
]
