"""Same-pattern batch API — vmap-first entry points (round-5 #4).

Everything below ~1M partial products on this chip is dispatch-floor
bound: a single tiny SpMV/SpGEMM/solve pays the same ~3-8 ms tunnel
launch cost as a 5M-row one, so N small independent problems lose
2-100x to a host loop.  The TPU-native answer the reference never
needed (its calls are host-priced, smmp.rs:256-416 just reuses
workspaces): batch N *same-pattern* matrices — ONE ``indptr/indices``
structure, a leading batch axis on ``data`` only — and run one fused
dispatch.  The refactorization workloads (``Ldl.update``-style) already
prove the shape: pattern fixed, values change per instance.

All entry points are jit-compatible with the structural operands passed
as ARGUMENTS (never close over a big pytree — it embeds as HLO
constants and blows the remote-compile payload, CLAUDE.md).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..errors import ShapeError
from ..formats.csmat import CsMat


def _bdims(arr, n: int) -> int:
    if arr.ndim == n:
        return None
    if arr.ndim == n + 1:
        return 0
    raise ShapeError(f"expected {n}- or {n+1}-D operand, got {arr.ndim}-D")


def batch_spmv(mat: CsMat, data: jax.Array, x: jax.Array) -> jax.Array:
    """y[i] = A(data[i]) @ x[i] for N same-pattern matrices.

    ``data`` is ``(N, cap)`` (or ``(cap,)`` to broadcast one matrix),
    ``x`` is ``(N, n)`` (or ``(n,)`` to broadcast one vector); at least
    one operand must carry the batch axis.  One fused dispatch instead
    of N launch floors.

    >>> import numpy as np
    >>> import sprs_tpu as st
    >>> m = st.from_dense(np.array([[2.0, 0.0], [0.0, 3.0]]))
    >>> d = np.stack([np.asarray(m.data), 2 * np.asarray(m.data)])
    >>> np.asarray(st.ops.batch.batch_spmv(m, d, np.ones(2))).tolist()
    [[2.0, 3.0], [4.0, 6.0]]
    """
    from .prod import spmv

    data = jnp.asarray(data)
    x = jnp.asarray(x)
    dd, dx = _bdims(data, 1), _bdims(x, 1)
    if dd is None and dx is None:
        return spmv(mat, x)
    return jax.vmap(
        lambda dt, xv: spmv(mat.with_data(dt), xv), in_axes=(dd, dx)
    )(data, x)


def batch_spmm(mat: CsMat, data: jax.Array, x: jax.Array) -> jax.Array:
    """Y[i] = A(data[i]) @ X[i] — multi-RHS twin of :func:`batch_spmv`
    (``X`` is ``(N, n, k)`` or ``(n, k)``)."""
    from .prod import spmm

    data = jnp.asarray(data)
    x = jnp.asarray(x)
    dd, dx = _bdims(data, 1), _bdims(x, 2)
    if dd is None and dx is None:
        return spmm(mat, x)
    return jax.vmap(
        lambda dt, xv: spmm(mat.with_data(dt), xv), in_axes=(dd, dx)
    )(data, x)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BatchedCsMat:
    """N same-pattern matrices: shared structure, batched values.

    ``indptr``/``indices`` are the single shared pattern; ``data`` is
    ``(N, cap)``.  ``member(i)`` materializes one :class:`CsMat`.
    """

    indptr: jax.Array
    indices: jax.Array
    data: jax.Array  # (N, cap)
    shape: Tuple[int, int]
    storage: str

    def tree_flatten(self):
        return (self.indptr, self.indices, self.data), (
            self.shape,
            self.storage,
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, aux[0], aux[1])

    @property
    def n_batch(self) -> int:
        return self.data.shape[0]

    def member(self, i) -> CsMat:
        return CsMat(
            self.indptr, self.indices, self.data[i], self.shape, self.storage
        )


def batch_spgemm(
    a: CsMat,
    b: CsMat,
    a_data: jax.Array,
    b_data: jax.Array,
    *,
    prod_cap: Optional[int] = None,
    out_cap: Optional[int] = None,
) -> BatchedCsMat:
    """C[i] = A(a_data[i]) @ B(b_data[i]) over shared patterns.

    The ESC pipeline's sort keys depend only on the PATTERNS, so every
    batch member lands on the same output structure; the result shares
    one ``indptr/indices`` with ``(N, out_cap)`` values.  Caps default
    to the exact symbolic counts (:func:`~sprs_tpu.ops.spgemm.spgemm_caps`)
    on concrete patterns; under jit pass both explicitly.
    """
    from .spgemm import spgemm, spgemm_caps

    a_data = jnp.asarray(a_data)
    b_data = jnp.asarray(b_data)
    da, db = _bdims(a_data, 1), _bdims(b_data, 1)
    if prod_cap is None or out_cap is None:
        p, o = spgemm_caps(a, b)
        prod_cap = prod_cap if prod_cap is not None else max(p, 1)
        out_cap = out_cap if out_cap is not None else max(o, 1)

    def one(ad, bd):
        return spgemm(
            a.with_data(ad),
            b.with_data(bd),
            prod_cap=prod_cap,
            out_cap=out_cap,
            check_capacity=False,
        )

    c = jax.vmap(one, in_axes=(da, db))(a_data, b_data)
    # identical patterns per member: collapse the batched structure
    return BatchedCsMat(
        c.indptr[0], c.indices[0], c.data, c.shape, c.storage
    )


class BatchedLdl:
    """Batched same-pattern LDLᵀ refactorization + solves.

    One symbolic/plan/schedule (host, once), then ``factor`` runs the
    level-batched numeric vmapped over ``(N, nnz)`` value sets and
    ``solve`` runs the panel solve vmapped over ``(N, n)`` right-hand
    sides — N factorizations/solves for ~one dispatch.  Reference
    capability bar: ``sprs-ldl``'s ``update``+``solve`` loop
    (/root/reference/sprs-ldl/src/lib.rs:502-593) priced at the TPU
    launch floor.
    """

    def __init__(self, sym, *, kind: str = "super", **plan_kwargs):
        from ..linalg.ldl_batched import build_round_schedule

        self.sym = sym
        if kind == "mf":
            plan = sym.mf_plan(**plan_kwargs)
        else:
            plan = sym.super_plan(**plan_kwargs)
        self.plan = plan
        self.sched = sym.round_schedule(plan)

    def factor(self, data: jax.Array):
        """``(N, nnz_a)`` CSR values -> ``(l_data (N, lnz), d (N, n))``."""
        return batched_ldl_factor(self.plan, self.sched, jnp.asarray(data))

    def solve(self, l_data: jax.Array, d: jax.Array, b: jax.Array):
        """Per-member panel solve; ``b`` is ``(N, n)`` or ``(n,)``."""
        return batched_ldl_solve(
            self.plan, l_data, d, jnp.asarray(b), sched=self.sched
        )


def batched_ldl_factor(plan, sched, data: jax.Array):
    """vmapped level-batched numeric (jit with plan/sched as args)."""
    from ..linalg.ldl_batched import numeric_batched

    if data.ndim == 1:
        return numeric_batched(plan, sched, data)
    return jax.vmap(lambda dd: numeric_batched(plan, sched, dd))(data)


def batched_ldl_solve(
    plan, l_data: jax.Array, d: jax.Array, b: jax.Array, *, sched=None
):
    """vmapped panel solve on batched factor values.

    With ``sched`` (the factor's round schedule) each member runs the
    ROUND-batched sweeps (R scan steps instead of S,
    :func:`~sprs_tpu.linalg.ldl_batched.solve_batched`) — but only
    when the plan is big enough to amortize the per-round gather
    floor (``plan.S >= SOLVE_BATCHED_MIN_S``; the measured crossover,
    see ldl_batched.py)."""
    from ..linalg.ldl_batched import SOLVE_BATCHED_MIN_S
    from ..linalg.ldl_super import panels_from_csc, solve_supernodal

    if sched is not None and plan.S >= SOLVE_BATCHED_MIN_S:
        from ..linalg.ldl_batched import solve_batched

        def one(lx, dv, bv):
            return solve_batched(
                plan, sched, panels_from_csc(plan, lx), dv, bv
            )

    else:

        def one(lx, dv, bv):
            return solve_supernodal(
                plan, panels_from_csc(plan, lx), dv, bv
            )

    db = 0 if b.ndim == 2 else None
    return jax.vmap(one, in_axes=(0, 0, db))(l_data, d, b)
