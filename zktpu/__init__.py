"""zktpu — TPU-native ZK proving framework (capabilities of
reclaimprotocol/gnark-symmetric-crypto, rebuilt TPU-first).

Package-wide JAX persistent compilation cache: the prover graphs (MSM, NTT,
witness) are large; caching makes every process after the first start fast.
"""

import os as _os

import jax as _jax

_cache = _os.environ.get(
    "ZKTPU_JAX_CACHE", _os.path.expanduser("~/.cache/zktpu_jax")
)
_jax.config.update("jax_compilation_cache_dir", _cache)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
_jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
