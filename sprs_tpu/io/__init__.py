"""IO: Matrix Market text format and validated binary persistence."""

from .matrix_market import (
    MatrixMarketError,
    dumps,
    loads,
    read_matrix_market,
    read_matrix_market_csr,
    write_matrix_market,
    write_matrix_market_sym,
)
from .checkpoint import load_checkpoint, save_checkpoint
from .serialize import load_npz, save_npz

__all__ = [
    "MatrixMarketError",
    "dumps",
    "loads",
    "read_matrix_market",
    "read_matrix_market_csr",
    "write_matrix_market",
    "write_matrix_market_sym",
    "load_checkpoint",
    "save_checkpoint",
    "load_npz",
    "save_npz",
]
