"""myzkp_tpu: TPU-native zero-knowledge-proof primitive library.

JAX/XLA/Pallas re-design of the capability surface of Koukyosyumei/MyZKP
(see SURVEY.md at the repo root for the full layer map / component inventory).
"""

import os as _os

import jax as _jax

# Persistent compilation cache: the limb-arithmetic kernels are deep unrolled
# programs (Montgomery REDC, 254-step exponentiation scans) whose XLA compiles
# dominate cold-start; caching them makes reruns near-instant.
_cache_dir = _os.environ.get("MYZKP_TPU_CACHE", "/tmp/jax_zkp_cache")
if _cache_dir:
    try:  # namespace by platform so CPU/TPU executables never mix
        _plat = _jax.default_backend()
    except Exception:
        _plat = "unknown"
    _jax.config.update("jax_compilation_cache_dir",
                       _os.path.join(_cache_dir, _plat))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

__version__ = "0.1.0"
