"""Mixed-precision direct solve: f32 MXU factor + f64-residual
refinement.

The TPU's fast precision is f32 (bf16 on the MXU); a 262k-row f32
LDLᵀ factorization is backward-stable (relative backward error
~1.5e-3·scale, i.e. ~1e4·eps_f32 from the deep accumulation chains)
but forward error is amplified by cond(A).  `refine_solve` runs
Wilkinson iterative refinement with f64 residuals on the host:
each step costs one O(nnz) residual plus one O(lnz) panel solve,
and converges the solution toward f64 accuracy while all heavy
compute stays in f32 on the device.

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python \
          examples/mixed_precision_refinement.py
"""

import numpy as np

from sprs_tpu.linalg import Ldl, refine_solve
from sprs_tpu.utils.special import dirichlet_laplacian


def main(grid=64):
    a = dirichlet_laplacian((grid, grid))
    n = a.shape[0]
    print(f"Poisson system: n={n}")

    # factor once (f32 on TPU; the suite's CPU run may be f64 — force
    # f32 data so the demo shows the mixed-precision effect)
    import sprs_tpu as st

    csr = a.to_csr()
    a32 = st.csmat(
        a.shape,
        csr.indptr,
        csr.indices,
        np.asarray(csr.data, np.float32),
        storage="csr",
        validate=False,
    )
    num = Ldl().fill_in_reduction("nd").check_symmetry(False).numeric(a32)

    b = np.linspace(1.0, 2.0, n)
    x, info = refine_solve(a, num, b, steps=4, rtol=1e-14)
    errs = info["backward_errors"]
    print("backward error per refinement step:")
    for i, e in enumerate(errs):
        print(f"  step {i}: {e:.3e}")
    assert errs[-1] < 1e-12, "refinement should reach f64-class accuracy"
    print("refined solve reached f64-class backward error with an f32 factor")
    return errs


if __name__ == "__main__":
    import sys

    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
