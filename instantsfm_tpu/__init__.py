"""instantsfm_tpu: TPU-native global structure-from-motion + 3DGS framework."""

import os as _os


def _enable_persistent_compilation_cache():
    """Persist XLA compilations across processes.

    On remote-compile TPU backends every op/jit compilation is an RPC
    (~0.3-40 s); the on-disk cache makes repeat pipeline runs skip all of
    them.  Opt out with INSTANTSFM_TPU_NO_PERSISTENT_CACHE=1; an explicit
    JAX_COMPILATION_CACHE_DIR (or prior jax.config setting) wins.
    """
    if _os.environ.get("INSTANTSFM_TPU_NO_PERSISTENT_CACHE"):
        return
    try:
        import jax
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.expanduser("~/.cache/instantsfm_tpu/xla"))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - jax unavailable or too old
        pass


_enable_persistent_compilation_cache()
