"""Preconditioned iterative solves — capability beyond the reference.

The reference ships only unpreconditioned BiCGSTAB
(/root/reference/sprs/src/sparse/linalg/bicgstab.rs); this framework
adds zero-fill incomplete factorizations (ILU(0)/IC(0), host numeric +
level-scheduled device application) and plugs them into CG and
BiCGSTAB.  This example shows the iteration counts on:

* the SPD interior Laplacian (CG vs IC(0)-PCG), and
* a nonsymmetric convection-diffusion operator (BiCGSTAB vs
  ILU(0)-BiCGSTAB).

Run: python examples/preconditioned_solve.py [side]
"""

import sys

import numpy as np

import sprs_tpu as st
from sprs_tpu.linalg import bicgstab, cg, ic0, ilu0


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    lap = st.utils.dirichlet_laplacian((side, side), dtype=np.float64)
    n = lap.shape[0]
    b = np.ones(n)

    plain = cg(lap, b, tol=1e-8, max_iter=4 * n)
    pre = cg(lap, b, tol=1e-8, max_iter=4 * n, precond=ic0(lap))
    print(
        f"cg      plain: iters={plain.iterations} "
        f"residual={plain.residual_norm:.2e} converged={plain.converged}"
    )
    print(
        f"cg   ic0-pcg: iters={pre.iterations} "
        f"residual={pre.residual_norm:.2e} converged={pre.converged}"
    )

    # nonsymmetric: add an advection term on the Laplacian pattern
    d = np.asarray(lap.to_dense())
    rng = np.random.default_rng(0)
    adv = np.zeros_like(d)
    off_diag = (d != 0) & ~np.eye(n, dtype=bool)
    adv[off_diag] = 0.3 * rng.standard_normal(int(off_diag.sum()))
    a = st.from_dense(d + adv)

    plain_b = bicgstab(a, b, tol=1e-8, max_iter=4 * n)
    pre_b = bicgstab(a, b, tol=1e-8, max_iter=4 * n, precond=ilu0(a))
    print(
        f"bicgstab plain: iters={plain_b.iterations} "
        f"residual={plain_b.residual_norm:.2e} "
        f"converged={plain_b.converged}"
    )
    print(
        f"bicgstab ilu0: iters={pre_b.iterations} "
        f"residual={pre_b.residual_norm:.2e} converged={pre_b.converged}"
    )

    # smallest eigenpairs of the SPD operator, IC(0)-accelerated
    from sprs_tpu.linalg import lobpcg

    x0 = np.random.default_rng(1).standard_normal((n, 3))
    eig_plain = lobpcg(lap, x0, tol=1e-7, max_iter=300)
    eig_pre = lobpcg(lap, x0, tol=1e-7, max_iter=300, precond=ic0(lap))
    print(
        f"lobpcg  plain: iters={eig_plain.iterations} "
        f"eigs={np.asarray(eig_plain.eigenvalues).round(5)}"
    )
    print(
        f"lobpcg ic0   : iters={eig_pre.iterations} "
        f"eigs={np.asarray(eig_pre.eigenvalues).round(5)}"
    )


if __name__ == "__main__":
    main()
