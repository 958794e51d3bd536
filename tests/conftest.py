"""Test configuration: CPU backend with 8 virtual devices, f64 enabled.

This is the analog of the reference's deterministic multithread testing
(ThreadingStrategy::Fixed, smmp.rs:491-513): sharding tests run on a
virtual 8-device CPU mesh so multi-chip code paths execute without TPU
hardware.  Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
