"""Reproducible random sparse matrix generation.

Reference: /root/reference/sprs-rand/src/lib.rs:24-88 — ``rand_csr``
samples nnz ≈ density·rows·cols entry slots, histograms them into rows,
then rejection-samples unique sorted column indices per row;
``rand_csr_std`` fixes PCG64 + standard normal.

TPU-native version: the *structure* is drawn host-side with numpy's
PCG64 (structure generation is pointer-chasing, not device work), the
*values* with either the same host RNG or a JAX PRNG key so value
streams are reproducible across backends.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from ..formats.csmat import CSR, CsMat, csmat


def rand_csr(
    shape: tuple,
    density: float,
    *,
    seed: int = 0,
    dtype=np.float64,
    values: Optional[Callable] = None,
    storage: str = CSR,
    cap: Optional[int] = None,
) -> CsMat:
    """Random CSR with expected ``density`` fill, reproducible by seed.

    ``values(rng, nnz)`` customizes the value distribution; default is
    standard normal (rand_csr_std, sprs-rand/src/lib.rs:85-88).
    """
    if not (0.0 <= density <= 1.0):
        raise ValueError("density must be within [0, 1]")
    rows, cols = shape
    rng = np.random.default_rng(np.random.PCG64(seed))
    exp_nnz = int(density * rows * cols)
    # histogram target rows (lib.rs:36-44)
    row_hits = rng.integers(0, rows, size=exp_nnz) if exp_nnz else np.empty(0, np.int64)
    counts = np.bincount(row_hits, minlength=rows)
    counts = np.minimum(counts, cols)  # a row cannot exceed cols uniques
    indptr = np.zeros(rows + 1, dtype=np.int64)
    indptr[1:] = np.cumsum(counts)
    nnz = int(indptr[-1])
    indices = np.empty(nnz, dtype=np.int64)
    for r in range(rows):
        k = counts[r]
        if k == 0:
            continue
        if k > cols // 2:
            chosen = rng.permutation(cols)[:k]
        else:
            # rejection-sample unique columns (lib.rs:52-74)
            seen = set()
            while len(seen) < k:
                seen.add(int(rng.integers(0, cols)))
            chosen = np.fromiter(seen, dtype=np.int64, count=k)
        chosen.sort()
        indices[indptr[r] : indptr[r + 1]] = chosen
    if values is None:
        data = rng.standard_normal(nnz).astype(dtype)
    else:
        data = np.asarray(values(rng, nnz), dtype=dtype)
    m = csmat(
        (rows, cols),
        indptr.astype(np.int32),
        indices.astype(np.int32),
        data,
        storage=CSR,
        cap=cap,
        validate=False,
    )
    return m if storage == CSR else m.to_csc()
