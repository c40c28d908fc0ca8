"""Test harness: run everything on a virtual 8-device CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4 implication)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# FORCE cpu. The environment pins JAX_PLATFORMS=axon (tunneled TPU with
# remote compile) AND the baked sitecustomize's axon.register calls
# jax.config.update("jax_platforms", "axon,cpu") in every interpreter, so
# neither setdefault nor an env override works — every jit would compile
# REMOTELY through the tunnel (30-400 s each). The config update below is the
# only reliable switch; it must run before any backend is touched.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
