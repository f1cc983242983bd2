"""Process-level JAX configuration shared by every entry point.

Enables the persistent compilation cache (the cascade/train programs take
minutes to compile over remote-compile tunnels; cached re-runs start in
seconds) and exposes the debug switches from SURVEY.md §5.
"""

from __future__ import annotations

import os


def setup_jax(debug_nans: bool = False) -> None:
    import jax

    cache_dir = os.environ.get(
        "BRATS2019_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/brats2019_tpu_xla")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if debug_nans:
        jax.config.update("jax_debug_nans", True)
