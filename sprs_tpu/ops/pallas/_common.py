"""Shared Mosaic configuration for the Pallas kernels."""

from __future__ import annotations

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

# Mosaic's default scoped-VMEM limit is 16MB.  XLA's memory-space
# assignment places whole small operands/results of the custom call on
# the VMEM stack when they fit under the limit (measured faster: x then
# streams from VMEM), but at 16MB it hard-fails for >=2M-row operands
# instead of spilling to HBM.  100MB leaves headroom out of v5e's
# 128MB VMEM.
VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def compiler_params(interpret: bool) -> dict:
    """kwargs for pl.pallas_call raising the scoped-VMEM limit."""
    if interpret or pltpu is None:
        return {}
    return {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES
        )
    }
