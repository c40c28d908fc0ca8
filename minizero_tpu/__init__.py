"""minizero_tpu — TPU-native zero-knowledge learning framework."""

import os

# Persistent XLA compilation cache: the fused self-play engine is a large
# program (remote/tunnel compiles can take minutes per shape); caching across
# processes makes repeat runs start in seconds. Harmless on CPU.
if not os.environ.get("MINIZERO_NO_COMPILE_CACHE"):
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", os.environ.get(
            "MINIZERO_COMPILE_CACHE", "/root/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:  # never block import on cache config
        pass
