"""Solvers: triangular solves, LDLᵀ factorization, orderings, iterative methods."""

from .bicgstab import BiCgStabResult, bicgstab, bicgstab_sparse
from .refine import refine_solve
from .cg import CgResult, cg
from .expm import expm_multiply
from .gmres import GmresResult, gmres
from .lobpcg import LobpcgResult, lobpcg
from .lsqr import LsqrResult, lsqr
from .etree import etree_from_pattern, postorder, tree_levels
from .ilu import Ic0, Ilu0, ic0, ilu0
from .iterative import IterativeResult, gauss_seidel, jacobi
from .ldl import FILL_CAMD, FILL_NONE, FILL_RCM, Ldl, LdlNumeric, LdlSymbolic
from .lu import SpLu, splu
from .solve import solve
from .svds import SvdsResult, svds
from .ldl_super import (
    SuperPlan,
    SupernodalPlanError,
    build_super_plan,
    numeric_supernodal,
    panels_from_csc,
    solve_supernodal,
)
from .ldl_mf import MfPlan, build_mf_plan, numeric_multifrontal
from .supernodes import (
    Supernodes,
    amalgamate,
    amalgamate_union,
    fundamental_supernodes,
)
from .ordering import (
    OrderingResult,
    bandwidth,
    cuthill_mckee,
    cuthill_mckee_custom,
    reverse_cuthill_mckee,
)
from .nd import nd_order
from .trisolve import (
    FlatTriSchedule,
    TriSchedule,
    build_flat_schedule,
    build_schedule,
    diag_solve,
    lsolve,
    lsolve_csc_sparse_rhs,
    usolve,
)

__all__ = [
    "BiCgStabResult",
    "bicgstab",
    "bicgstab_sparse",
    "refine_solve",
    "CgResult",
    "cg",
    "Ic0",
    "Ilu0",
    "ic0",
    "ilu0",
    "expm_multiply",
    "GmresResult",
    "gmres",
    "LobpcgResult",
    "lobpcg",
    "LsqrResult",
    "lsqr",
    "etree_from_pattern",
    "postorder",
    "tree_levels",
    "IterativeResult",
    "gauss_seidel",
    "jacobi",
    "FILL_CAMD",
    "FILL_NONE",
    "FILL_RCM",
    "Ldl",
    "LdlNumeric",
    "LdlSymbolic",
    "SpLu",
    "splu",
    "solve",
    "Supernodes",
    "amalgamate",
    "amalgamate_union",
    "MfPlan",
    "build_mf_plan",
    "numeric_multifrontal",
    "SuperPlan",
    "SupernodalPlanError",
    "build_super_plan",
    "numeric_supernodal",
    "panels_from_csc",
    "solve_supernodal",
    "fundamental_supernodes",
    "SvdsResult",
    "svds",
    "OrderingResult",
    "bandwidth",
    "cuthill_mckee",
    "cuthill_mckee_custom",
    "reverse_cuthill_mckee",
    "nd_order",
    "FlatTriSchedule",
    "TriSchedule",
    "build_flat_schedule",
    "build_schedule",
    "diag_solve",
    "lsolve",
    "lsolve_csc_sparse_rhs",
    "usolve",
]
