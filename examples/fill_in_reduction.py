"""Fill-in reduction with RCM / min-degree orderings — parity with the
reference example (/root/reference/sprs/examples/fill_in_reduction.rs):
factor a mesh Laplacian-like SPD system with no ordering, with reverse
Cuthill-McKee, and with the min-degree (CAMD-class) ordering, and
compare the LDL factor fill and the matrix bandwidth.

Run: python examples/fill_in_reduction.py [n]
"""

import sys

import numpy as np

import sprs_tpu as st
from sprs_tpu.linalg import (
    FILL_CAMD,
    FILL_NONE,
    FILL_RCM,
    Ldl,
    bandwidth,
    reverse_cuthill_mckee,
)
from sprs_tpu.ops.permutation import transform_mat_papt


def random_spd(n, density=0.05, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, n))
    d[rng.random((n, n)) > density] = 0.0
    d = (d + d.T) / 2
    d += np.eye(n) * (np.abs(d).sum(axis=1).max() + 1.0)
    return d


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    mat = st.from_dense(random_spd(n))
    print(f"matrix: {mat.shape}, nnz={mat.nnz}, bandwidth={bandwidth(mat)}")

    rcm = reverse_cuthill_mckee(mat)
    permuted = transform_mat_papt(mat, rcm.permutation())
    print(f"after RCM: bandwidth={bandwidth(permuted)}")

    for name, fill in (
        ("none", FILL_NONE),
        ("rcm", FILL_RCM),
        ("min-degree", FILL_CAMD),
    ):
        num = Ldl().fill_in_reduction(fill).numeric(mat)
        lnnz = int(num.l().nnz)
        print(f"LDL fill with {name:>10}: nnz(L) = {lnnz}")
        # round-trip check
        b = np.linspace(1.0, 2.0, n)
        x = np.asarray(num.solve(b))
        dense = np.asarray(mat.to_dense())
        err = float(np.abs(dense @ x - b).max())
        print(f"    solve residual (inf-norm): {err:.2e}")

    if n <= 60:
        print("pattern before / after RCM:")
        print(st.utils.nnz_pattern_str(mat))
        print()
        print(st.utils.nnz_pattern_str(permuted))


if __name__ == "__main__":
    main()
