"""Same-pattern batching: N small systems for one dispatch floor.

A parameter sweep / ensemble workload: the SAME sparsity pattern with
N different value sets (here: a Dirichlet Laplacian scaled per
member, the refactorization shape).  On the TPU every tiny op pays a
multi-ms launch floor, so looping N small factorizations or products
loses 2-100x to a host loop; the batch API runs them as ONE vmapped
dispatch (hardware: 1.9-36x over idle scipy loops at N>=16,
BASELINE.md round 5).

Reference contrast: sprs prices calls at host cost and just reuses
workspaces across calls (smmp.rs:256-416) — batching is the TPU-native
replacement for that reuse.
"""

import numpy as np

import sprs_tpu as st
from sprs_tpu.linalg import Ldl
from sprs_tpu.ops import BatchedLdl, batch_spmv
from sprs_tpu.utils.special import dirichlet_laplacian


def main():
    mat = dirichlet_laplacian((12, 12))  # n=144 SPD pattern
    n = mat.shape[0]
    N = 8
    rng = np.random.default_rng(0)
    scales = rng.random(N) + 0.5

    # one symbolic analysis + plan for the whole family
    sym = Ldl().fill_in_reduction("camd").check_symmetry(False).symbolic(mat)
    bl = BatchedLdl(sym)

    a = mat.to_csr()
    data = np.asarray(a.data)[None] * scales[:, None]  # (N, nnz)

    # N factorizations in one dispatch
    lx, d = bl.factor(data)

    # N solves in one dispatch (panel solve works in permuted space)
    b = rng.standard_normal((N, n))
    b_p = b[:, np.asarray(sym.perm.perm)] if sym.perm is not None else b
    x = np.asarray(bl.solve(lx, d, b_p))
    if sym.perm is not None:
        x = x[:, np.asarray(sym.perm.inv)]

    # N residual checks in one dispatch: r = A_i x_i - b_i
    r = np.asarray(batch_spmv(mat, data, x)) - b
    rel = np.abs(r).max(axis=1) / np.abs(b).max(axis=1)
    print("max relative residual over", N, "systems:", float(rel.max()))
    assert rel.max() < 1e-4
    print("OK")


if __name__ == "__main__":
    main()
