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

import resource  # noqa: E402

# XLA:CPU's recursive passes overflow the default 8 MB stack on our giant
# witness graphs (observed round 4: deterministic SIGSEGV inside
# backend_compile_and_load while jitting the AES witness solver).  Raise
# the limit so the main stack may keep growing, and give worker threads a
# large explicit stack (threading.stack_size applies at thread creation).
try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
except (ValueError, OSError):
    pass
import threading  # noqa: E402

threading.stack_size(256 * 1024 * 1024)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: disabled on CPU (XLA:CPU AOT entries never
# reload — see zktpu.disable_compile_cache_for_cpu)
import zktpu  # noqa: E402

zktpu.disable_compile_cache_for_cpu()

# --------------------------------------------------------------------------
# Witness disk cache (fast-tier latency, VERDICT r3 item 10).
#
# Solving a full-circuit witness eagerly on XLA:CPU costs minutes (tens of
# thousands of small dispatches).  The witness itself is a pure function of
# the circuit source + inputs, so the fast tier memoizes it on disk KEYED BY
# THE sha256 OF THE SOURCE FILES involved: any edit to the circuit or solver
# invalidates the cache and the witness is re-solved — the "solver output
# still satisfies the R1CS" guard is preserved exactly.  Delete tests/_cache
# (gitignored) to force regeneration; slow-tier e2e tests always re-solve.

import hashlib  # noqa: E402

import numpy as np  # noqa: E402

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "_cache")


def cached_witness(tag: str, source_files: list, inputs_key: bytes, producer):
    """Return producer() memoized on disk under a source-hash key."""
    h = hashlib.sha256(inputs_key)
    for sf in source_files:
        with open(sf, "rb") as f:
            h.update(f.read())
    path = os.path.join(_CACHE_DIR, f"{tag}-{h.hexdigest()[:24]}.npy")
    if os.path.exists(path):
        return np.load(path)
    out = np.asarray(producer())
    os.makedirs(_CACHE_DIR, exist_ok=True)
    with open(path + ".tmp", "wb") as f:
        np.save(f, out)
    os.replace(path + ".tmp", path)
    return out
