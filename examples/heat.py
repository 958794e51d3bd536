"""Heat diffusion on a 2-D grid — parity with the reference example
(/root/reference/sprs/examples/heat.rs:141-175).

Builds the 5-point grid Laplacian with Dirichlet borders
(heat.rs:45-80), prints the nonzero pattern (heat.rs:146), then solves
the steady-state system three ways:

* host Gauss–Seidel (exact parity with heat.rs:103-139),
* device weighted-Jacobi (the parallel iteration with the same fixture
  and tolerance — the TPU-native counterpart),
* device BiCGSTAB through the DIA fast path.

Run: python examples/heat.py [side]
"""

import sys

import numpy as np

import sprs_tpu as st
from sprs_tpu.formats.dia import dia_spmv
from sprs_tpu.linalg import bicgstab, gauss_seidel, jacobi


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    lap = st.utils.grid_laplacian((side, side), dtype=np.float64)

    if side <= 20:
        print("Laplacian nonzero pattern:")
        print(st.utils.nnz_pattern_str(lap))

    # rhs: unit heat source at the grid center, borders pinned to 0
    n = side * side
    rhs = np.zeros(n)
    rhs[(side // 2) * side + side // 2] = 1.0

    gs = gauss_seidel(lap, rhs, tol=1e-8, max_iter=300)
    print(
        f"gauss-seidel: iters={gs.iterations} residual={gs.residual_norm:.2e} "
        f"converged={gs.converged}"
    )

    jac = jacobi(lap, rhs, tol=1e-7, max_iter=8000, omega=0.9)
    print(
        f"jacobi(w=0.9): iters={jac.iterations} residual={jac.residual_norm:.2e} "
        f"converged={jac.converged}"
    )

    dia = lap.to_dia()
    res = bicgstab(lambda v: dia_spmv(dia, v), rhs, tol=1e-8, max_iter=500)
    print(
        f"bicgstab(dia): iters={res.iterations} residual={res.residual_norm:.2e} "
        f"converged={res.converged}"
    )

    x_gs = np.asarray(gs.x)
    x_j = np.asarray(jac.x)
    x_b = np.asarray(res.x)
    print(
        "max |jacobi - gauss_seidel| =", float(np.abs(x_j - x_gs).max())
    )
    print("max |bicgstab - gauss_seidel| =", float(np.abs(x_b - x_gs).max()))

    if side <= 12:
        print("steady-state grid (gauss-seidel):")
        for i in range(side):
            print(
                " ".join(f"{x_gs[i * side + j]:6.3f}" for j in range(side))
            )


if __name__ == "__main__":
    main()
