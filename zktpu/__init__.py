"""zktpu — TPU-native ZK proving framework (capabilities of
reclaimprotocol/gnark-symmetric-crypto, rebuilt TPU-first).

Package-wide JAX persistent compilation cache: the prover graphs (MSM, NTT,
witness) are large; caching makes every process after the first start fast.
"""

import os as _os

import jax as _jax


def _cache_dir() -> str:
    return _os.environ.get(
        "ZKTPU_JAX_CACHE", _os.path.expanduser("~/.cache/zktpu_jax")
    )


def disable_compile_cache_for_cpu() -> None:
    """Disable the persistent compile cache for CPU-platform processes.

    Call this right after forcing the CPU platform (conftest.py,
    __graft_entry__.dryrun_multichip); the JAX_PLATFORMS env hint can lie —
    the axon sitecustomize re-clobbers it to "axon" even in processes that
    then force CPU via jax.config.update.

    Why disable rather than share: XLA:CPU persistent entries embed AOT
    machine code whose feature list includes XLA-internal pseudo-features
    (+prefer-no-scatter/+prefer-no-gather) that never appear in the host's
    real feature set — so cached CPU executables ALWAYS fail to load
    ("Machine type ... doesn't match", the MULTICHIP_r02 rc=124 spam), even
    on the machine that wrote them.  Each failed load costs seconds of
    deserialization before the recompile; the cache is pure overhead."""
    _os.environ["JAX_PLATFORMS"] = "cpu"
    _jax.config.update("jax_compilation_cache_dir", None)


# back-compat alias (renamed per ADVICE r3: the old name implied a per-host
# cache bucket was selected; the function actually disables the cache)
use_cpu_cache_bucket = disable_compile_cache_for_cpu

_jax.config.update("jax_compilation_cache_dir", _cache_dir())
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
_jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
