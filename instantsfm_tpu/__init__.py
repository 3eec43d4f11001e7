"""instantsfm_tpu: TPU-native global structure-from-motion + 3DGS framework."""

import os as _os


def enable_persistent_compilation_cache(min_compile_secs: float = 1.0,
                                        min_entry_bytes: int = 4096):
    """Persist XLA compilations across processes.

    On remote-compile TPU backends every op/jit compilation is an RPC
    (~0.3-40 s); the on-disk cache makes repeat pipeline runs skip all of
    them.  Called explicitly by the CLI entry points and bench scripts —
    NOT at import time, so importing the library never mutates global JAX
    config for unrelated host code.  Opt out with
    INSTANTSFM_TPU_NO_PERSISTENT_CACHE=1; an explicit
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
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", min_compile_secs)
            jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", min_entry_bytes)
    except Exception:  # pragma: no cover - jax unavailable or too old
        pass
