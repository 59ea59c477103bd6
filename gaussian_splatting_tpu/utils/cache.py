"""Persistent XLA compilation cache setup.

Big kernels (the 13-operand instance sort in particular) take minutes to
compile on the remote-TPU compile helper; the persistent cache turns every
repeat into ~1 s.  Call once at process start from CLIs/benches.
"""

import os


def enable_compilation_cache(path: str = "") -> None:
    import jax

    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception as exc:  # cache is an optimization, never fatal
        print(f"[cache] compilation cache disabled: {exc!r}")
