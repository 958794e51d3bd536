"""Nonzero-pattern visualization.

Reference: /root/reference/sprs/src/sparse/visu.rs — ASCII pattern
printer (visu.rs:8-65) and u8 pattern image (visu.rs:72-90), used by the
fill-in-reduction example to show ordering quality.
"""

from __future__ import annotations

import numpy as np

from ..formats.csmat import CsMat


def nnz_pattern(mat: CsMat) -> np.ndarray:
    """Boolean dense pattern of stored entries."""
    csr = mat.to_csr()
    nnz = int(csr.nnz)
    rows = np.asarray(csr.outer_ids())[:nnz]
    cols = np.asarray(csr.indices)[:nnz]
    out = np.zeros(csr.shape, dtype=bool)
    out[rows, cols] = True
    return out


def nnz_pattern_str(mat: CsMat, *, nnz_char: str = "x", zero_char: str = " ") -> str:
    """ASCII art of the pattern (visu.rs:8-65)."""
    pat = nnz_pattern(mat)
    lines = ["|" + "".join(nnz_char if v else zero_char for v in row) + "|" for row in pat]
    return "\n".join(lines)


def nnz_image(mat: CsMat) -> np.ndarray:
    """u8 image of the pattern: 0 where stored, 255 elsewhere
    (visu.rs:72-90 convention: nonzeros dark)."""
    pat = nnz_pattern(mat)
    return np.where(pat, np.uint8(0), np.uint8(255))
