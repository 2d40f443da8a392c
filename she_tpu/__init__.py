"""she_tpu: a TPU-native BFV homomorphic-encryption framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
apple/swift-homomorphic-encryption: the BFV RLWE scheme, keyword PIR
(MulPIR + SimplePIR + Symmetric PIR), and Private Nearest Neighbor Search,
re-designed for TPU hardware (uint32 limb tensors, batched modular kernels,
sharded serving over a jax device mesh).
"""

__version__ = "0.1.0"

import os as _os


def _enable_persistent_compilation_cache() -> None:
    """XLA compiles are the startup cost of every CLI/bench invocation
    (a staged NTT program takes seconds to build). Cache compiled
    executables on disk so repeat process runs skip them. Opt out with
    SHE_TPU_NO_COMPILE_CACHE=1."""
    if _os.environ.get("SHE_TPU_NO_COMPILE_CACHE") == "1":
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is not None:
            return  # the application already configured a cache; don't clobber
        cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.expanduser("~/.cache/she_tpu_jax"),
        )
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compilation_cache()
