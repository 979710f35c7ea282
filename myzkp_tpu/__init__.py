"""myzkp_tpu: TPU-native zero-knowledge-proof primitive library.

JAX/XLA/Pallas re-design of the capability surface of Koukyosyumei/MyZKP
(see SURVEY.md at the repo root for the full layer map / component inventory).
"""

import os as _os

import jax as _jax

# The deep-unrolled limb/REDC programs (254-step ladders, fused EC formulas)
# can overflow the default 8 MB main-thread stack inside LLVM during XLA:CPU
# compiles (observed as segfault/abort in backend_compile_and_load).  The
# main-thread stack grows on demand on Linux, so raising the soft rlimit up
# front is sufficient and cheap.
try:
    import resource as _resource

    _soft, _hard = _resource.getrlimit(_resource.RLIMIT_STACK)
    _want = 1 << 30  # 1 GiB
    if _soft != _resource.RLIM_INFINITY and _soft < _want and (
            _hard == _resource.RLIM_INFINITY or _hard >= _want):
        _resource.setrlimit(_resource.RLIMIT_STACK, (_want, _hard))
except Exception:  # non-Linux or restricted environment: keep going
    pass

# Persistent compilation cache: the limb-arithmetic kernels are deep unrolled
# programs (Montgomery REDC, 254-step exponentiation scans) whose XLA compiles
# dominate cold-start; caching them makes reruns near-instant.
_cache_dir = _os.environ.get("MYZKP_TPU_CACHE", "/tmp/jax_zkp_cache")
try:
    _plat = _jax.default_backend()
except Exception:
    _plat = "unknown"
# TPU only: jaxlib 0.9.0 segfaults deserializing cached *CPU* executables
# compiled under --xla_force_host_platform_device_count (cache-hit crash in
# compilation_cache.get_executable_and_time), so never cache CPU builds.
if _cache_dir and _plat == "tpu":
    _jax.config.update("jax_compilation_cache_dir",
                       _os.path.join(_cache_dir, _plat))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

__version__ = "0.1.0"
