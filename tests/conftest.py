"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on XLA's host-platform virtual devices (same SPMD partitioner).
bench.py runs separately on the real TPU chip.

NOTE: the environment forces JAX_PLATFORMS=axon (remote-TPU tunnel) and
re-applies it at interpreter startup, so plain env vars are not enough —
jax.config.update after import is the reliable override.  Eager ops on the
axon platform cost ~4 ms each (network round trip), which would make the
suite minutes-slow; CPU keeps it fast and deterministic.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: disabled on CPU (XLA:CPU AOT entries never
# reload — see zktpu.disable_compile_cache_for_cpu)
import zktpu  # noqa: E402

zktpu.disable_compile_cache_for_cpu()
