"""Microbench: Pallas row-gather DMA throughput on the real TPU.

Measures gather_rows([B, N, W]) per-call time with a data-dependent chain
(idx derived from the previous output) so the tunnel cannot elide or
overlap calls. Informs the large-N tree walk design: if a b=1024 gather
costs ~50-100 us, an XLA lock-step walk with per-iteration row DMAs beats
any O(cap*lane) vectorised fetch.

    python scripts/perf_gather.py [B] [N] [W] [reps]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax.numpy as jnp
from minizero_tpu.ops.gather_rows import gather_rows


def main(b=1024, n=208, w=512, reps=50):
    x = jax.random.randint(jax.random.PRNGKey(0), (b, n, w), -1000, 1000, jnp.int32)
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (b,), 0, n, jnp.int32)

    @jax.jit
    def chain(x, idx):
        def body(i, idx):
            row = gather_rows(x, idx)
            return jnp.abs(row[:, 0]) % n  # next idx depends on this gather
        return jax.lax.fori_loop(0, reps, body, idx)

    out = jax.block_until_ready(chain(x, idx0))
    t0 = time.perf_counter()
    out = jax.block_until_ready(chain(x, out))
    dt = (time.perf_counter() - t0) / reps
    print(f"B={b} N={n} W={w}: {dt*1e6:.1f} us/gather "
          f"({b*w*4/dt/1e9:.1f} GB/s payload, {b/dt/1e6:.2f} M rows/s)")


if __name__ == "__main__":
    a = [int(v) for v in sys.argv[1:]]
    main(*a)
