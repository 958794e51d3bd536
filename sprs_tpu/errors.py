"""Typed errors for structure and linear-algebra failures.

Mirrors the error taxonomy of the reference library
(/root/reference/sprs/src/errors.rs:4-8,66-71) with Python exceptions:
structure violations are raised eagerly by host-side validators, while
device-side numerical failures (e.g. a singular diagonal inside a jitted
solve) are reported through NaN-poisoning plus an optional host check,
since XLA programs cannot raise.
"""

from __future__ import annotations


class SprsError(Exception):
    """Base class for all sprs_tpu errors."""


class StructureError(SprsError):
    """A sparse structure invariant is violated.

    Variants carried as the ``kind`` attribute: ``unsorted``,
    ``size_mismatch``, ``out_of_range``.
    """

    def __init__(self, kind: str, msg: str):
        self.kind = kind
        super().__init__(f"{kind}: {msg}")

    @classmethod
    def unsorted(cls, msg: str) -> "StructureError":
        return cls("unsorted", msg)

    @classmethod
    def size_mismatch(cls, msg: str) -> "StructureError":
        return cls("size_mismatch", msg)

    @classmethod
    def out_of_range(cls, msg: str) -> "StructureError":
        return cls("out_of_range", msg)

    @classmethod
    def index_overflow(cls, msg: str) -> "StructureError":
        """The i32 index type cannot address the requested dims/nnz —
        the eager analog of the reference's "Index type is not large
        enough" panic (sprs/tests/gh374.rs:10-33)."""
        return cls("index_overflow", msg)


class ShapeError(SprsError):
    """Operand shapes are incompatible for the requested operation."""


class LinalgError(SprsError):
    """Base class for linear-algebra failures."""


class NonSquareMatrixError(LinalgError):
    """A square matrix was required."""


class SingularMatrixError(LinalgError):
    """The matrix is singular (zero pivot / zero diagonal entry)."""


class CapacityError(SprsError):
    """An operation produced more nonzeros than the provided capacity.

    Raised only on host-side (concrete) execution paths; traced paths
    surface the required capacity through the ``required_nnz`` field of
    op results so callers can re-run with a larger bound.
    """

    def __init__(self, required: int, cap: int, message: str = None):
        self.required = required
        self.cap = cap
        super().__init__(
            message
            or f"operation requires capacity {required} but only {cap} "
            "provided"
        )

    @classmethod
    def index_limit(
        cls, what: str, value: int, hint: str = None
    ) -> "CapacityError":
        """A size crossed the i32 index ceiling — the TPU-native analog
        of SpIndex's 'index type is not large enough' panic
        (sprs/src/indexing.rs:18-46).  ``hint`` names the working
        escape hatch (docs/SCALE.md documents all of them)."""
        from .formats.util import MAX_INDEX

        return cls(
            int(value),
            MAX_INDEX,
            f"{what}={int(value)} exceeds the i32 index limit "
            f"{MAX_INDEX}; i32 positions would wrap silently"
            + (f". {hint}" if hint else " (see docs/SCALE.md)"),
        )
