"""Matrix Market IO.

Reference: /root/reference/sprs/src/io.rs — header parsing (io.rs:84-111),
the four symmetry modes General/Symmetric/SkewSymmetric/Hermitian expanded
to a full triplet set on read (io.rs:239-258), data kinds
integer/real/complex/pattern with type-match enforcement (io.rs:158-170),
and general + symmetric writers (io.rs:294-430).

Host-side text IO (numpy), producing capacity-padded device matrices.
The ``Pattern`` kind maps to a matrix of ones (the reference uses a ZST
scalar; JAX arrays need a real dtype, so structure-only files load with
unit values and ``write`` accepts ``kind="pattern"`` to drop values).
"""

from __future__ import annotations

import io as _io
from dataclasses import dataclass
from typing import Optional, TextIO, Union

import numpy as np

from ..errors import StructureError
from ..formats.csmat import CsMat
from ..formats.triplet import TriMat

SYMMETRY_MODES = ("general", "symmetric", "skew-symmetric", "hermitian")
DATA_KINDS = ("real", "integer", "complex", "pattern")


@dataclass
class MmHeader:
    kind: str  # real | integer | complex | pattern
    symmetry: str  # general | symmetric | skew-symmetric | hermitian
    rows: int
    cols: int
    entries: int


class MatrixMarketError(StructureError):
    def __init__(self, msg: str):
        super().__init__("matrix_market", msg)


def _parse_header_line(line: str) -> tuple:
    parts = line.strip().split()
    if len(parts) != 5 or parts[0] != "%%MatrixMarket":
        raise MatrixMarketError(f"bad banner: {line.strip()!r}")
    _, obj, fmt, kind, symmetry = (p.lower() for p in parts)
    if obj != "matrix":
        raise MatrixMarketError(f"unsupported object {obj!r}")
    if fmt != "coordinate":
        raise MatrixMarketError(f"only coordinate format supported, got {fmt!r}")
    if kind not in DATA_KINDS:
        raise MatrixMarketError(f"unknown data kind {kind!r}")
    if symmetry not in SYMMETRY_MODES:
        raise MatrixMarketError(f"unknown symmetry {symmetry!r}")
    return kind, symmetry


def _dtype_for(kind: str):
    return {
        "real": np.float64,
        "integer": np.int64,
        "complex": np.complex128,
        "pattern": np.float64,
    }[kind]


def read_matrix_market(
    source: Union[str, TextIO],
) -> TriMat:
    """Read a coordinate Matrix Market file into a TriMat.

    Symmetric/skew/hermitian entries are expanded to the full pattern on
    read (io.rs:239-258); diagonal entries are not duplicated, and skew
    diagonals are rejected per the format spec.
    """
    if isinstance(source, str):
        with open(source, "r") as f:
            return read_matrix_market(f)

    first = source.readline()
    kind, symmetry = _parse_header_line(first)
    dtype = _dtype_for(kind)

    # skip comments / blank lines to the size line
    size_line = None
    for line in source:
        s = line.strip()
        if not s or s.startswith("%"):
            continue
        size_line = s
        break
    if size_line is None:
        raise MatrixMarketError("missing size line")
    parts = size_line.split()
    if len(parts) != 3:
        raise MatrixMarketError(f"bad size line: {size_line!r}")
    rows, cols, entries = (int(p) for p in parts)
    if symmetry != "general" and rows != cols:
        raise MatrixMarketError("symmetric matrix must be square")

    want_vals = kind != "pattern"
    ri, ci, vs = [], [], []
    count = 0
    for line in source:
        s = line.strip()
        if not s or s.startswith("%"):
            continue
        toks = s.split()
        if kind == "complex":
            if len(toks) != 4:
                raise MatrixMarketError(f"complex entry needs 4 fields: {s!r}")
            val = complex(float(toks[2]), float(toks[3]))
        elif want_vals:
            if len(toks) != 3:
                raise MatrixMarketError(f"entry needs 3 fields: {s!r}")
            val = dtype(toks[2]) if kind == "integer" else float(toks[2])
        else:
            if len(toks) != 2:
                raise MatrixMarketError(f"pattern entry needs 2 fields: {s!r}")
            val = 1.0
        r, c = int(toks[0]) - 1, int(toks[1]) - 1  # 1-based in the format
        if not (0 <= r < rows and 0 <= c < cols):
            raise MatrixMarketError(f"index out of range: {s!r}")
        ri.append(r)
        ci.append(c)
        vs.append(val)
        if symmetry != "general" and r != c:
            ri.append(c)
            ci.append(r)
            if symmetry == "symmetric":
                vs.append(val)
            elif symmetry == "skew-symmetric":
                vs.append(-val)
            else:  # hermitian
                vs.append(np.conj(val))
        if symmetry == "skew-symmetric" and r == c:
            raise MatrixMarketError("skew-symmetric file stores a diagonal entry")
        count += 1
    if count != entries:
        raise MatrixMarketError(
            f"expected {entries} entries, found {count}"
        )
    t = TriMat((rows, cols), dtype=dtype)
    if ri:
        return TriMat.from_triplets(
            (rows, cols),
            np.asarray(ri),
            np.asarray(ci),
            np.asarray(vs, dtype=dtype),
        )
    return t


def read_matrix_market_csr(source) -> CsMat:
    return read_matrix_market(source).to_csr()


def _format_value(v, kind: str) -> str:
    if kind == "pattern":
        return ""
    if kind == "complex":
        return f" {float(v.real)!r} {float(v.imag)!r}"
    if kind == "integer":
        return f" {int(v)}"
    return f" {float(v)!r}"


def _infer_kind(dtype) -> str:
    if np.issubdtype(dtype, np.complexfloating):
        return "complex"
    if np.issubdtype(dtype, np.integer):
        return "integer"
    return "real"


def write_matrix_market(
    dest: Union[str, TextIO],
    mat: Union[CsMat, TriMat],
    *,
    kind: Optional[str] = None,
    symmetry: str = "general",
) -> None:
    """Write in coordinate format (io.rs:294-360; symmetric writer
    io.rs:362+).

    ``symmetry="symmetric"`` stores only the lower triangle; callers are
    responsible for the matrix actually being symmetric (checked when
    concrete, like the reference's write_matrix_market_sym).
    """
    if isinstance(dest, str):
        with open(dest, "w") as f:
            write_matrix_market(f, mat, kind=kind, symmetry=symmetry)
        return
    if symmetry not in ("general", "symmetric", "skew-symmetric", "hermitian"):
        raise MatrixMarketError(f"unknown symmetry {symmetry!r}")

    if isinstance(mat, TriMat):
        rows = mat.row_inds()
        cols = mat.col_inds()
        vals = mat.data()
        shape = mat.shape
    else:
        csr = mat.to_csr()
        nnz = int(csr.nnz)
        rows = np.asarray(csr.outer_ids())[:nnz]
        cols = np.asarray(csr.indices)[:nnz]
        vals = np.asarray(csr.data)[:nnz]
        shape = csr.shape

    if symmetry != "general":
        if shape[0] != shape[1]:
            raise MatrixMarketError("symmetric write requires square matrix")
        keep = rows >= cols if symmetry != "skew-symmetric" else rows > cols
        rows, cols, vals = rows[keep], cols[keep], vals[keep]

    k = kind or _infer_kind(vals.dtype)
    dest.write(f"%%MatrixMarket matrix coordinate {k} {symmetry}\n")
    dest.write("% written by sprs_tpu\n")
    dest.write(f"{shape[0]} {shape[1]} {len(rows)}\n")
    for r, c, v in zip(rows, cols, vals):
        dest.write(f"{r + 1} {c + 1}{_format_value(v, k)}\n")


def write_matrix_market_sym(dest, mat, **kw) -> None:
    write_matrix_market(dest, mat, symmetry="symmetric", **kw)


def dumps(mat, **kw) -> str:
    buf = _io.StringIO()
    write_matrix_market(buf, mat, **kw)
    return buf.getvalue()


def loads(text: str) -> TriMat:
    return read_matrix_market(_io.StringIO(text))
