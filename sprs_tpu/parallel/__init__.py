"""Multi-device distribution: row/block-sharded sparse kernels."""

from .dist import (
    Dist2DCsMat,
    DistCsMat,
    dist_spgemm,
    dist_spmv,
    dist_spmv_2d,
    shard_csr_2d,
    shard_csr_rows,
)

__all__ = [
    "Dist2DCsMat",
    "DistCsMat",
    "dist_spgemm",
    "dist_spmv",
    "dist_spmv_2d",
    "shard_csr_2d",
    "shard_csr_rows",
]
