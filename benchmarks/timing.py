"""Shared dev-bench timing.

Two-point loop timing: run the same jitted fori_loop at N and 2N
iterations (dynamic trip count — one compile) and report
(T(2N) - T(N)) / N. The constant per-dispatch cost (host work + the
~25-40 ms axon tunnel sync) cancels exactly, so no fragile roundtrip
estimate enters the number. Median over reps.
"""
import os
import time
import jax, jax.numpy as jnp

# Persistent compile cache: repeat bench runs skip the 20-40 s/graph
# remote compiles (works with the axon PJRT backend — entries are
# keyed client-side on the HLO). Derived from this file's location so
# an out-of-tree checkout still points at a real directory, and only
# set when the caller hasn't configured a cache of their own.
if jax.config.jax_compilation_cache_dir is None:
    _repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(_repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def roundtrip():
    z = jnp.zeros((8, 128))
    f = jax.jit(lambda z: z + 1.0)
    float(jnp.sum(f(z)))
    ts = []
    for _ in range(12):
        t0 = time.perf_counter()
        float(jnp.sum(f(z)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]  # median


def bench_loop(fn, args, iters=100, rt=None, reps=3):
    """fn(carry, *rest) -> out; loop feeds a scalar back into carry.
    Returns per-iteration seconds via the two-point method (rt is
    accepted for API compat but unused)."""

    @jax.jit
    def loop(n, x, *rest):
        def body(i, carry):
            o = fn(carry, *rest)
            return carry + (1e-7 * jnp.mean(o)).astype(carry.dtype)

        return jax.lax.fori_loop(0, n, body, x, unroll=False)

    # compile + warm both trip counts (same executable — n is dynamic)
    float(jnp.sum(loop(iters, *args).astype(jnp.float32)))
    float(jnp.sum(loop(2 * iters, *args).astype(jnp.float32)))

    deltas = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(loop(iters, *args).astype(jnp.float32)))
        t1 = time.perf_counter()
        float(jnp.sum(loop(2 * iters, *args).astype(jnp.float32)))
        t2 = time.perf_counter()
        deltas.append((t2 - t1) - (t1 - t0))
    deltas.sort()
    return max(deltas[len(deltas) // 2], 1e-9) / iters
