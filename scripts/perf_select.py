"""Microbenchmark: MCTS select-walk strategies on TPU.

The in-jit ablation showed select ~= 43% of the fused move (75ms of 175ms at
B=1024, go9 gaz n=16). Candidate hypotheses:
  (a) per-lane dynamic gathers from [B, N(, A)] arrays lower poorly on TPU
  (b) the vmapped while_loop itself is fine; its body ops are the cost
This probe times primitive patterns in isolation, each wrapped in a
16-iteration fori_loop (mimicking the sim loop) and jitted once.

    python scripts/perf_select.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

B, N, A = 1024, 17, 82
SIMS = 16
DEPTH = 8  # walk iterations per sim


def bench(name, fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(json.dumps({"probe": name, "ms": round(ms, 3)}), flush=True)
    return out


def main():
    rng = np.random.RandomState(0)
    stats = jnp.asarray(rng.rand(B, N, A), jnp.float32)     # e.g. edge visits
    nodev = jnp.asarray(rng.rand(B, N), jnp.float32)        # e.g. node visits
    cidx = jnp.asarray(rng.randint(-1, N, (B, N, A)), jnp.int32)
    idx0 = jnp.asarray(rng.randint(0, N, (B,)), jnp.int32)

    # -- (1) per-lane row gather  x[b, i[b], :]  (what select does today)
    @jax.jit
    def row_gather(stats, cidx, nodev, idx):
        def sim(s, carry):
            idx, acc = carry
            def walk(d, c):
                idx, acc = c
                row = jax.vmap(lambda x, i: x[i])(stats, idx)          # [B, A]
                crow = jax.vmap(lambda x, i: x[i])(cidx, idx)          # [B, A]
                act = jnp.argmax(row + acc[:, None], axis=1)
                nxt = jax.vmap(lambda r, a: r[a])(crow, act)
                child_v = jax.vmap(lambda v, i: v[jnp.maximum(i, 0)])(nodev, nxt)
                return (jnp.where(nxt >= 0, nxt, idx), acc + child_v)
            return jax.lax.fori_loop(0, DEPTH, walk, (idx, acc))
        idx, acc = jax.lax.fori_loop(0, SIMS, sim, (idx, jnp.zeros((B,), jnp.float32)))
        return acc

    # -- (2) one-hot einsum row read (same walk, dense forms)
    @jax.jit
    def onehot_walk(stats, cidx, nodev, idx):
        iota_n = jnp.arange(N)
        oh0 = (idx[:, None] == iota_n[None, :]).astype(jnp.float32)    # [B, N]
        def sim(s, carry):
            oh, acc = carry
            def walk(d, c):
                oh, acc = c
                row = jnp.einsum("bn,bna->ba", oh, stats)
                act = jnp.argmax(row + acc[:, None], axis=1)
                aoh = (act[:, None] == jnp.arange(A)[None, :]).astype(jnp.float32)
                # next one-hot: child_oh[b, n] = sum_a aoh[b,a] * (cidx[b,n',a]==n)
                crow = jnp.einsum("bn,bna->ba", oh, cidx.astype(jnp.float32))
                nxt_oh = (crow[:, None, :] == iota_n[None, :, None]).astype(jnp.float32)
                nxt_oh = jnp.einsum("ba,bna->bn", aoh, nxt_oh)
                has = jnp.sum(nxt_oh, axis=1, keepdims=True) > 0
                oh = jnp.where(has, nxt_oh, oh)
                acc = acc + jnp.einsum("bn,bn->b", oh, nodev)
                return (oh, acc)
            return jax.lax.fori_loop(0, DEPTH, walk, (oh, acc))
        oh, acc = jax.lax.fori_loop(0, SIMS, sim, (oh0, jnp.zeros((B,), jnp.float32)))
        return acc

    # -- (3) while_loop with trivial body (loop machinery cost)
    @jax.jit
    def while_trivial(idx):
        def sim(s, carry):
            def cond(c):
                i, d = c
                return d < DEPTH
            def body(c):
                i, d = c
                return (jnp.maximum(i - 1, 0), d + 1)
            i, _ = jax.lax.while_loop(cond, body, (carry, 0))
            return i
        return jax.lax.fori_loop(0, SIMS, sim, idx)

    # -- (4) vmapped while_loop with scalar-gather body (the current shape)
    @jax.jit
    def vmapped_while(stats, cidx, nodev, idx):
        def one(stats1, cidx1, nodev1, i0):
            def cond(c):
                i, d, acc = c
                return d < DEPTH
            def body(c):
                i, d, acc = c
                row = stats1[i]                   # [A] gather by traced scalar
                act = jnp.argmax(row)
                nxt = cidx1[i, act]
                acc = acc + nodev1[jnp.maximum(nxt, 0)]
                return (jnp.where(nxt >= 0, nxt, i), d + 1, acc)
            i, _, acc = jax.lax.while_loop(cond, body, (i0, 0, 0.0))
            return acc
        def sim(s, acc):
            return acc + jax.vmap(one)(stats, cidx, nodev, idx)
        return jax.lax.fori_loop(0, SIMS, sim, jnp.zeros((B,), jnp.float32))

    bench("row_gather_fori", row_gather, stats, cidx, nodev, idx0)
    bench("onehot_walk_fori", onehot_walk, stats, cidx, nodev, idx0)
    bench("while_trivial", while_trivial, idx0)
    bench("vmapped_while_gather", vmapped_while, stats, cidx, nodev, idx0)


if __name__ == "__main__":
    main()
