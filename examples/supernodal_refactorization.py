"""Supernodal MXU refactorization in a time-stepping loop.

The framework's "train loop": a Newton/implicit-time-stepping solver
refactorizes the SAME sparsity pattern with new values every step.  The
reference re-runs its up-looking scalar numeric per step
(/root/reference/sprs-ldl/src/lib.rs:502-593 via update()); the
TPU-native answer is

  1. symbolic once on the host — AMD fill-reducing ordering, etree,
     supernode detection with relaxed amalgamation (linalg/ldl_super.py);
  2. per step, ONE jitted device call — supernodal left-looking numeric
     whose frontal updates are dense GEMMs on the MXU, followed by the
     level-scheduled triangular solves.

Workload: implicit heat step (I + dt·c(t)·L) x_new = x on an n×n
Dirichlet grid with a time-varying diffusion coefficient c(t) (values
change, pattern does not).  A(c)'s values are linear in c on the fixed
pattern, so each step passes a scalar and a data vector — no host
re-analysis, no retracing.

Run: python examples/supernodal_refactorization.py [n] [steps]
(n is the grid side; CPU runs the supernode schedule as a slow scalar
scan — the MXU frontal-GEMM speedup needs the TPU backend, where the
128² refactorization measured 406x over the row-scan numeric.)
"""

import sys
import time

import jax

jax.config.update("jax_enable_x64", True)  # direct solve: f64 factors

import jax.numpy as jnp
import numpy as np

import sprs_tpu as st
from sprs_tpu.linalg import Ldl
from sprs_tpu.linalg.ldl import LdlNumeric
from sprs_tpu.linalg.ldl_super import numeric_supernodal


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    dt = 1e-2

    lap = st.utils.dirichlet_laplacian((n, n), dtype=np.float64)
    m = lap.shape[0]
    ident = st.eye(m, dtype=np.float64)
    # A(c) = I + dt*c*L; its values are linear in c on a fixed pattern:
    # data(c) = d1 + (c-1)*(d2-d1) with d1=A(1), d2=A(2)
    a1 = st.ops.add(ident, lap.scale(dt)).to_csr()
    a2 = st.ops.add(ident, lap.scale(2 * dt)).to_csr()
    d1, dd = a1.data, a2.data - a1.data

    t0 = time.perf_counter()
    sym = (
        Ldl().fill_in_reduction("camd").check_symmetry(False).symbolic(a1)
    )
    plan = sym.super_plan()
    t_sym = time.perf_counter() - t0
    print(
        f"symbolic: n={sym.n} l_nnz={sym.nnz} "
        f"supernodes={plan.S} ({t_sym*1e3:.1f} ms, host, once)"
    )

    # the plan rides through jit as a PYTREE ARGUMENT: its O(lnz)
    # index maps transfer once as device buffers instead of embedding
    # as HLO constants in the (remote) compile payload
    @jax.jit
    def step(pl, c, d1, dd, b):
        data = d1 + (c - 1.0) * dd
        lx, d = numeric_supernodal(pl, data)
        return LdlNumeric(sym, lx, d).solve(b, method="super")

    rng = np.random.default_rng(0)
    b0 = rng.standard_normal(m)
    x = jnp.asarray(b0)
    for k in range(steps):
        c = 1.0 + 0.5 * np.sin(0.3 * k)
        t0 = time.perf_counter()
        x = step(plan, c, d1, dd, x)
        x.block_until_ready()
        print(f"step {k}: c={c:.3f} factor+solve {1e3*(time.perf_counter()-t0):.1f} ms")

    # verify one step against the dense oracle
    c = 0.7
    xs = np.asarray(step(plan, c, d1, dd, b0))
    a_np = np.eye(m) + dt * c * np.asarray(lap.to_dense())
    res = np.linalg.norm(a_np @ xs - b0) / np.linalg.norm(b0)
    print(f"relative residual at c={c}: {res:.2e}")
    assert res < 1e-10


if __name__ == "__main__":
    main()
