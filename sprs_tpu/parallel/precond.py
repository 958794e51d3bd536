"""Distributed preconditioners.

Block-Jacobi with per-shard supernodal LDLᵀ block solves: the natural
upgrade over diagonal Jacobi for distributed CG/BiCGSTAB (the reference
has no distributed anything — SURVEY §2.1 "threading strategy" is its
only parallelism; this is the TPU-native extension of that role).

Design: the global rows are split into S equal chunks; shard s owns the
diagonal block A[s·m:(s+1)·m, s·m:(s+1)·m].  All blocks are factored
against ONE static symbolic plan — the UNION of the block patterns
(entries a block lacks are explicit zeros; LDLᵀ on a pattern superset
is exact) — so the per-shard numeric and solves are a single SPMD
program: ``vmap``/``shard_map`` over a shared ``SuperPlan``, dense
panel GEMMs on each device's MXU, zero cross-device communication.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import ShapeError
from ..formats.csmat import CSR, CsMat, csmat
from ..formats.util import INDEX_DTYPE


@dataclasses.dataclass
class BlockJacobiLdl:
    """Factored block-Jacobi preconditioner; ``precond`` applies M⁻¹.

    ``precond(r)`` is jittable and shard_map/pjit-friendly: the only
    array state is ``panels (S, P)`` / ``d (S, m)`` (shard these on the
    mesh axis that shards ``r``) plus small host permutation maps.
    """

    n: int
    S: int
    m: int
    plan: object  # SuperPlan shared by every block
    panels: jax.Array  # (S, P)
    d: jax.Array  # (S, m)
    perm: Optional[np.ndarray]  # block-local fill-reducing permutation
    inv: Optional[np.ndarray]

    def precond(self, r: jax.Array) -> jax.Array:
        """x = M⁻¹ r with M = blockdiag(A₀₀, …, A_{S-1,S-1})."""
        from ..linalg.ldl_super import solve_supernodal

        r = jnp.asarray(r)
        if r.shape[0] != self.n:
            raise ShapeError(f"precond rhs {r.shape} vs n={self.n}")
        rs = r.reshape(self.S, self.m)
        if self.perm is not None:
            rs = rs[:, jnp.asarray(self.perm, INDEX_DTYPE)]
        xs = jax.vmap(
            lambda p, dv, v: solve_supernodal(self.plan, p, dv, v)
        )(self.panels, self.d, rs)
        if self.inv is not None:
            xs = xs[:, jnp.asarray(self.inv, INDEX_DTYPE)]
        return xs.reshape(-1).astype(r.dtype)

    __call__ = precond


def dist_cg(dmat, b, mesh, *, precond=None, **cg_kw):
    """Distributed preconditioned CG on a row-sharded SPD system.

    Convenience front door composing :func:`~sprs_tpu.parallel.dist_spmv`
    (the matvec, all-gathered x over the mesh) with a preconditioner:
    ``precond`` may be None, the string ``"jacobi"`` (diagonal),
    ``"block_ldl"`` (per-shard supernodal LDL block solves — see
    :func:`block_jacobi_ldl`), or any callable ``r -> M⁻¹ r``.
    Returns :class:`~sprs_tpu.linalg.cg.CgResult`.
    """
    import jax

    from ..linalg import cg
    from .dist import dist_spmv

    matvec = jax.jit(lambda v: dmat.assemble(dist_spmv(dmat, v, mesh)))
    if precond == "jacobi":
        mat = dmat.to_csmat()
        diag = jnp.asarray(mat.diag())
        pc = lambda r: r / diag  # noqa: E731
    elif precond == "block_ldl":
        M = block_jacobi_ldl(dmat.to_csmat(), dmat.n_shards)
        pc = M.precond
    else:
        pc = precond
    return cg(matvec, jnp.asarray(b), precond=pc, **cg_kw)


def block_jacobi_ldl(
    mat: CsMat, n_shards: int, *, fill: str = "camd"
) -> BlockJacobiLdl:
    """Factor a block-Jacobi LDLᵀ preconditioner for SPD ``mat``.

    Host: extracts the S diagonal blocks, forms their pattern UNION
    (one static symbolic/plan serves every shard — explicit zeros where
    a block lacks an entry keep the factorization exact), runs the
    symbolic once.  Device: one vmapped supernodal numeric factors all
    blocks; panels are kept for the solves.  Requires
    ``mat.shape[0] % n_shards == 0``.
    """
    n = mat.shape[0]
    if mat.shape[0] != mat.shape[1]:
        raise ShapeError(f"block_jacobi_ldl needs square, got {mat.shape}")
    if n % n_shards:
        raise ShapeError(
            f"rows {n} not divisible by n_shards {n_shards}"
        )
    m = n // n_shards
    csr = mat.to_csr()
    ip = np.asarray(csr.indptr)
    ix = np.asarray(csr.indices)
    dt = np.asarray(csr.data)
    nnz = int(ip[-1])
    rows = np.repeat(
        np.arange(csr.rows, dtype=np.int64), np.diff(ip)
    )[:nnz]
    cols = ix[:nnz].astype(np.int64)
    vals = dt[:nnz]

    shard_of = rows // m
    in_block = shard_of == (cols // m)
    br = (rows - shard_of * m)[in_block]
    bc = (cols - shard_of * m)[in_block]
    bs = shard_of[in_block]
    bv = vals[in_block]
    key = br * np.int64(m) + bc  # block-local (row, col) key

    # union pattern over shards
    ukeys = np.unique(key)
    kn = ukeys.shape[0]
    urows = (ukeys // m).astype(np.int64)
    ucols = (ukeys % m).astype(np.int32)
    uptr = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(np.bincount(urows, minlength=m), out=uptr[1:])
    # per-shard values aligned to the union slots (zeros where absent)
    slot = np.searchsorted(ukeys, key)
    data_s = np.zeros((n_shards, kn), dtype=vals.dtype)
    data_s[bs, slot] = bv

    from ..linalg import Ldl
    from ..linalg.ldl_super import numeric_supernodal, panels_from_csc

    pattern = csmat(
        (m, m),
        uptr.astype(np.int32),
        ucols,
        np.ones(kn, dtype=np.float64),
        storage=CSR,
        validate=False,
    )
    sym = (
        Ldl()
        .fill_in_reduction(fill)
        .check_symmetry(False)
        .symbolic(pattern)
    )
    plan = sym.super_plan()

    def _factor(v):
        lx, d = numeric_supernodal(plan, v)
        return panels_from_csc(plan, lx), d

    panels, d = jax.vmap(_factor)(jnp.asarray(data_s))
    perm = inv = None
    if sym.perm is not None:
        perm = np.asarray(sym.perm.perm)
        inv = np.asarray(sym.perm.inv)
    return BlockJacobiLdl(
        n=n,
        S=n_shards,
        m=m,
        plan=plan,
        panels=panels,
        d=d,
        perm=perm,
        inv=inv,
    )
