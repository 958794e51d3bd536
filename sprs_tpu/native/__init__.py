"""Native host library: build, load, and ctypes bindings.

The reference accelerates its host-side symbolic layer with C
(suitesparse_bindings/suitesparse-src/build.rs compiles vendored
SuiteSparse).  Here the equivalent C++ (sprs_host.cpp) is compiled on
first use with the system g++ into a cached shared library and bound
with ctypes.  Every entry point has a pure-numpy fallback in the Python
layer, so ``available()`` gates a fast path, never a capability.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "sprs_host.cpp")
_LIB_PATH = os.path.join(_DIR, "libsprs_host.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_I32P = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
_I64P = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
_F64P = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-march=native",
                # no FMA contraction: numeric entry points (lu, ilu0,
                # ic0) stay BIT-identical to their numpy fallbacks,
                # which is what the parity tests assert
                "-ffp-contract=off",
                "-shared",
                "-fPIC",
                "-std=c++17",
                _SRC,
                "-o",
                _LIB_PATH,
            ],
            check=True,
            capture_output=True,
            timeout=240,
        )
        return True
    except Exception:
        return False


def _bind(lib: ctypes.CDLL) -> None:
    lib.sprs_etree.argtypes = [_I32P, _I32P, ctypes.c_int64, _I32P]
    lib.sprs_etree.restype = None
    lib.sprs_ldl_symbolic.argtypes = [
        _I32P,
        _I32P,
        ctypes.c_int64,
        _I32P,
        _I32P,
        _I32P,
    ]
    lib.sprs_ldl_symbolic.restype = ctypes.c_int64
    lib.sprs_ldl_pattern.argtypes = [
        _I32P,
        _I32P,
        ctypes.c_int64,
        _I32P,
        _I64P,
        ctypes.c_int64,
        _I32P,
        _I64P,
        _I32P,
    ]
    lib.sprs_ldl_pattern.restype = None
    lib.sprs_ldl_pattern_flat.argtypes = [
        _I32P,
        _I32P,
        ctypes.c_int64,
        _I32P,
        _I64P,
        _I64P,
        _I32P,
        _I64P,
        _I32P,
    ]
    lib.sprs_ldl_pattern_flat.restype = None
    lib.sprs_etree_postorder.argtypes = [_I32P, ctypes.c_int64, _I32P]
    lib.sprs_etree_postorder.restype = None
    lib.sprs_super_rmap.argtypes = [
        _I64P,
        _I64P,
        ctypes.c_int64,
        _I64P,
        _I64P,
        _I64P,
        _I64P,
        ctypes.c_int64,
        _I32P,
    ]
    lib.sprs_super_rmap.restype = None
    lib.sprs_amalgamate_union.argtypes = [
        _I64P,
        _I64P,
        ctypes.c_int64,
        _I64P,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_double,
        _I64P,
        _I64P,
        _I64P,
    ]
    lib.sprs_amalgamate_union.restype = ctypes.c_int64
    lib.sprs_rcm.argtypes = [
        _I32P,
        _I32P,
        ctypes.c_int64,
        _I32P,
        _I64P,
        ctypes.c_int32,
    ]
    lib.sprs_rcm.restype = ctypes.c_int64
    lib.sprs_tri_levels.argtypes = [
        _I32P,
        _I32P,
        ctypes.c_int64,
        ctypes.c_int32,
        _I64P,
    ]
    lib.sprs_tri_levels.restype = ctypes.c_int64
    lib.sprs_gauss_seidel.argtypes = [
        _I32P,
        _I32P,
        _F64P,
        _F64P,
        _F64P,
        ctypes.c_int64,
        ctypes.c_double,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.sprs_gauss_seidel.restype = ctypes.c_int64
    lib.sprs_min_degree.argtypes = [_I32P, _I32P, ctypes.c_int64, _I32P]
    lib.sprs_min_degree.restype = None
    lib.sprs_amd.argtypes = [_I32P, _I32P, ctypes.c_int64, _I32P]
    lib.sprs_amd.restype = None
    lib.sprs_nd_order.argtypes = [
        _I32P,
        _I32P,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_double,
        _I32P,
    ]
    lib.sprs_nd_order.restype = ctypes.c_int64
    lib.sprs_lu.argtypes = [
        _I32P,
        _I32P,
        _F64P,
        ctypes.c_int64,
        ctypes.c_double,
        ctypes.c_int64,
        _I64P,
        _I32P,
        _F64P,
        _I64P,
        _I32P,
        _F64P,
        _I32P,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.sprs_lu.restype = ctypes.c_int64
    for fn in (lib.sprs_ilu0, lib.sprs_ic0):
        fn.argtypes = [
            _I32P,
            _I32P,
            _F64P,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        fn.restype = ctypes.c_int32
    lib.sprs_spgemm_count.argtypes = [
        _I32P,
        _I32P,
        ctypes.c_int64,
        _I32P,
        _I32P,
        ctypes.c_int64,
        _I32P,
    ]
    lib.sprs_spgemm_count.restype = ctypes.c_int64
    lib.sprs_spgemm.argtypes = [
        _I32P,
        _I32P,
        _F64P,
        ctypes.c_int64,
        _I32P,
        _I32P,
        _F64P,
        ctypes.c_int64,
        _I32P,
        _I32P,
        _F64P,
    ]
    lib.sprs_spgemm.restype = None


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native library, or None."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed or os.environ.get("SPRS_TPU_NO_NATIVE"):
        return None
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            _bind(lib)
            _lib = lib
        except OSError:
            _build_failed = True
            return None
    return _lib


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# typed wrappers (numpy in, numpy out)
# ---------------------------------------------------------------------------


def etree(indptr: np.ndarray, indices: np.ndarray, n: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    parent = np.empty(n, dtype=np.int32)
    lib.sprs_etree(
        np.ascontiguousarray(indptr, np.int32),
        np.ascontiguousarray(indices, np.int32),
        n,
        parent,
    )
    return parent


def ldl_symbolic(row_ptr, row_cols, n):
    lib = get_lib()
    if lib is None:
        return None
    parent = np.empty(n, dtype=np.int32)
    col_count = np.empty(n, dtype=np.int32)
    row_count = np.empty(n, dtype=np.int32)
    total = lib.sprs_ldl_symbolic(
        np.ascontiguousarray(row_ptr, np.int32),
        np.ascontiguousarray(row_cols, np.int32),
        n,
        parent,
        col_count,
        row_count,
    )
    return parent, col_count, row_count, int(total)


def ldl_pattern(row_ptr, row_cols, n, parent, l_indptr, wl, lnz):
    lib = get_lib()
    if lib is None:
        return None
    row_pattern = np.empty((n, wl), dtype=np.int32)
    insert_pos = np.empty((n, wl), dtype=np.int64)
    l_indices = np.empty(lnz, dtype=np.int32)
    lib.sprs_ldl_pattern(
        np.ascontiguousarray(row_ptr, np.int32),
        np.ascontiguousarray(row_cols, np.int32),
        n,
        np.ascontiguousarray(parent, np.int32),
        np.ascontiguousarray(l_indptr, np.int64),
        wl,
        row_pattern,
        insert_pos,
        l_indices,
    )
    return row_pattern, insert_pos, l_indices


def amalgamate_union_native(
    l_indptr, l_indices, n, ptr0, max_width, max_zeros, rel_zeros
):
    """(ptr, below_ptr, below_flat) via the C++ greedy union merger, or
    None without the native library."""
    lib = get_lib()
    if lib is None:
        return None
    S0 = ptr0.shape[0] - 1
    lp = np.ascontiguousarray(l_indptr, np.int64)
    # capacity: sum of the strips' first-column below counts bounds
    # every union (merging only shrinks or keeps row sets)
    c0s = ptr0[:-1]
    cap = int(np.sum(lp[c0s + 1] - lp[c0s] - 1)) if S0 else 0
    out_ptr = np.empty(S0 + 1, dtype=np.int64)
    out_bptr = np.empty(S0 + 1, dtype=np.int64)
    out_flat = np.empty(max(cap, 1), dtype=np.int64)
    S = lib.sprs_amalgamate_union(
        lp,
        np.ascontiguousarray(l_indices, np.int64),
        n,
        np.ascontiguousarray(ptr0, np.int64),
        S0,
        max_width,
        max_zeros,
        float(rel_zeros),
        out_ptr,
        out_bptr,
        out_flat,
    )
    S = int(S)
    return (
        out_ptr[: S + 1].copy(),
        out_bptr[: S + 1].copy(),
        out_flat[: int(out_bptr[S])].copy(),
    )


def super_rmap(pair_d, pair_t, c0, w, below_ptr, below_flat, MR):
    """(npairs, MR) supernodal update row maps via two-pointer merges,
    or None without the native library."""
    lib = get_lib()
    if lib is None:
        return None
    npairs = pair_d.shape[0]
    rmap = np.empty((max(npairs, 1), MR), dtype=np.int32)
    lib.sprs_super_rmap(
        np.ascontiguousarray(pair_d, np.int64),
        np.ascontiguousarray(pair_t, np.int64),
        npairs,
        np.ascontiguousarray(c0, np.int64),
        np.ascontiguousarray(w, np.int64),
        np.ascontiguousarray(below_ptr, np.int64),
        np.ascontiguousarray(below_flat, np.int64),
        MR,
        rmap,
    )
    return rmap[:npairs]


def etree_postorder(parent, n):
    """Postorder permutation (new -> old) of an elimination tree, or
    None without the native library (callers fall back to numpy)."""
    lib = get_lib()
    if lib is None:
        return None
    post = np.empty(max(n, 1), dtype=np.int32)
    lib.sprs_etree_postorder(
        np.ascontiguousarray(parent, np.int32), n, post
    )
    return post[:n]


def ldl_pattern_flat(row_ptr, row_cols, n, parent, l_indptr, rp_indptr, lnz):
    """Compact O(lnz) pattern: per-row update lists at ``rp_indptr[k]``.

    The padded ``(n, wl)`` form of :func:`ldl_pattern` costs O(n*wl)
    memory — tens of GB at 10^6 rows under fill-reducing orderings; this
    is the at-scale path (the padded grid is derived lazily only for
    the sequential scan numeric)."""
    lib = get_lib()
    if lib is None:
        return None
    total = int(rp_indptr[-1])
    rp_cols = np.empty(max(total, 1), dtype=np.int32)
    rp_slots = np.empty(max(total, 1), dtype=np.int64)
    l_indices = np.empty(max(lnz, 1), dtype=np.int32)
    lib.sprs_ldl_pattern_flat(
        np.ascontiguousarray(row_ptr, np.int32),
        np.ascontiguousarray(row_cols, np.int32),
        n,
        np.ascontiguousarray(parent, np.int32),
        np.ascontiguousarray(l_indptr, np.int64),
        np.ascontiguousarray(rp_indptr, np.int64),
        rp_cols,
        rp_slots,
        l_indices,
    )
    return rp_cols[:total], rp_slots[:total], l_indices[:lnz]


def rcm(indptr, indices, n, reversed_order=True):
    lib = get_lib()
    if lib is None:
        return None
    perm = np.empty(n, dtype=np.int32)
    parts = np.empty(n + 1, dtype=np.int64)
    ncomp = lib.sprs_rcm(
        np.ascontiguousarray(indptr, np.int32),
        np.ascontiguousarray(indices, np.int32),
        n,
        perm,
        parts,
        1 if reversed_order else 0,
    )
    return perm, parts[: ncomp + 1].tolist()


def tri_levels(indptr, indices, n, lower=True):
    lib = get_lib()
    if lib is None:
        return None
    level = np.zeros(n, dtype=np.int64)
    n_levels = lib.sprs_tri_levels(
        np.ascontiguousarray(indptr, np.int32),
        np.ascontiguousarray(indices, np.int32),
        n,
        1 if lower else 0,
        level,
    )
    return level, int(n_levels)


def gauss_seidel(indptr, indices, data, b, x, tol, max_iter):
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float64)
    res = ctypes.c_double(0.0)
    n = x.shape[0]
    it = lib.sprs_gauss_seidel(
        np.ascontiguousarray(indptr, np.int32),
        np.ascontiguousarray(indices, np.int32),
        np.ascontiguousarray(data, np.float64),
        np.ascontiguousarray(b, np.float64),
        x,
        n,
        tol,
        max_iter,
        ctypes.byref(res),
    )
    return x, int(it), float(res.value)


def min_degree(indptr, indices, n):
    lib = get_lib()
    if lib is None:
        return None
    perm = np.empty(n, dtype=np.int32)
    lib.sprs_min_degree(
        np.ascontiguousarray(indptr, np.int32),
        np.ascontiguousarray(indices, np.int32),
        n,
        perm,
    )
    return perm


def nd_order_native(indptr, indices, n, leaf_size, balance_window):
    """Nested-dissection ordering fast path (bit-identical to
    ``linalg.nd``'s numpy implementation — the 1M-row symbolic spent
    146-196 s in the numpy BFS, round-3 measurement).  Input pattern
    must be symmetric.  Returns the order array or None."""
    lib = get_lib()
    if lib is None:
        return None
    order = np.empty(max(n, 1), dtype=np.int32)
    done = lib.sprs_nd_order(
        np.ascontiguousarray(indptr, np.int32),
        np.ascontiguousarray(indices, np.int32),
        n,
        int(leaf_size),
        float(balance_window),
        order,
    )
    if done != n:
        return None
    return order[:n]


def amd(indptr, indices, n):
    """Approximate minimum degree (AMD-class) ordering; the CAMD-role
    fast path (reference: sprs_suitesparse_camd/src/lib.rs:22-60).
    Input pattern must be symmetric.  Returns perm or None."""
    lib = get_lib()
    if lib is None:
        return None
    perm = np.empty(n, dtype=np.int32)
    lib.sprs_amd(
        np.ascontiguousarray(indptr, np.int32),
        np.ascontiguousarray(indices, np.int32),
        n,
        perm,
    )
    return perm


def lu(indptr, indices, data, n, pivot_threshold):
    """Gilbert–Peierls LU with threshold partial pivoting.

    Returns (l_indptr, l_indices, l_data, u_indptr, u_indices, u_data,
    perm_r) or None when the native library is unavailable.  Raises
    SingularMatrixError-compatible ValueError on singular columns (the
    caller translates).  Retries with doubled capacity on overflow.
    """
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    data = np.ascontiguousarray(data, np.float64)
    cap = max(4 * len(indices) + 4 * n + 16, 64)
    for _ in range(20):
        l_indptr = np.zeros(n + 1, dtype=np.int64)
        u_indptr = np.zeros(n + 1, dtype=np.int64)
        l_indices = np.empty(cap, dtype=np.int32)
        l_data = np.empty(cap, dtype=np.float64)
        u_indices = np.empty(cap, dtype=np.int32)
        u_data = np.empty(cap, dtype=np.float64)
        perm_r = np.empty(n, dtype=np.int32)
        err = ctypes.c_int64(-1)
        ret = lib.sprs_lu(
            indptr,
            indices,
            data,
            n,
            float(pivot_threshold),
            cap,
            l_indptr,
            l_indices,
            l_data,
            u_indptr,
            u_indices,
            u_data,
            perm_r,
            ctypes.byref(err),
        )
        if ret == 0:
            lnnz, unnz = int(l_indptr[-1]), int(u_indptr[-1])
            return (
                l_indptr,
                l_indices[:lnnz],
                l_data[:lnnz],
                u_indptr,
                u_indices[:unnz],
                u_data[:unnz],
                perm_r,
            )
        if ret == -2:
            raise ValueError(f"singular:{int(err.value)}")
        cap *= 2
    raise MemoryError("sprs_lu: capacity growth did not converge")


def ilu0_numeric(indptr, indices, vals):
    """In-place ILU(0) on CSR arrays; returns the factor values, or
    None when the native library is unavailable.  Raises ValueError
    with the offending row on a structural/zero pivot (the Python
    caller re-raises as SingularMatrixError)."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.ascontiguousarray(vals, np.float64).copy()
    bad = ctypes.c_int64(-1)
    rc = lib.sprs_ilu0(
        np.ascontiguousarray(indptr, np.int32),
        np.ascontiguousarray(indices, np.int32),
        out,
        indptr.shape[0] - 1,
        ctypes.byref(bad),
    )
    if rc != 0:
        raise ValueError(f"ilu0 pivot failure at row {bad.value}")
    return out


def ic0_numeric(indptr, indices, vals):
    """In-place IC(0) on CSR lower-triangle arrays; returns L values,
    or None when the native library is unavailable.  Raises ValueError
    on a missing diagonal / non-positive pivot."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.ascontiguousarray(vals, np.float64).copy()
    bad = ctypes.c_int64(-1)
    rc = lib.sprs_ic0(
        np.ascontiguousarray(indptr, np.int32),
        np.ascontiguousarray(indices, np.int32),
        out,
        indptr.shape[0] - 1,
        ctypes.byref(bad),
    )
    if rc != 0:
        raise ValueError(f"ic0 pivot failure at row {bad.value}")
    return out


def spgemm_host(a_indptr, a_indices, a_data, b_indptr, b_indices,
                b_data, n_cols):
    """Gustavson two-phase CSR SpGEMM on the host (C++): the
    Eigen-class second bench baseline (the reference times against
    both scipy and Eigen, sprs-benches/src/main.rs:27-82).  Returns
    (indptr, indices, data) with sorted columns, or None when the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    ap = np.ascontiguousarray(a_indptr, np.int32)
    ai = np.ascontiguousarray(a_indices, np.int32)
    av = np.ascontiguousarray(a_data, np.float64)
    bp = np.ascontiguousarray(b_indptr, np.int32)
    bi = np.ascontiguousarray(b_indices, np.int32)
    bv = np.ascontiguousarray(b_data, np.float64)
    n_rows = ap.shape[0] - 1
    cp = np.zeros(n_rows + 1, np.int32)
    nnz = lib.sprs_spgemm_count(ap, ai, n_rows, bp, bi, n_cols, cp)
    ci = np.zeros(max(int(nnz), 1), np.int32)
    cv = np.zeros(max(int(nnz), 1), np.float64)
    lib.sprs_spgemm(ap, ai, av, n_rows, bp, bi, bv, n_cols, cp, ci, cv)
    return cp, ci[: int(nnz)], cv[: int(nnz)]
