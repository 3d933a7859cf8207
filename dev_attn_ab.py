"""Flash vs XLA attention crossover at d=64 (UNet head_dim), loop-amortized."""
import sys, time
import jax, jax.numpy as jnp
from instructany2pix_tpu.ops.attention import dot_product_attention

def log(*a): print(*a, file=sys.stderr, flush=True)
def sync(x): return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))

probe = jnp.ones((8,8)); sync(probe)
t0=time.perf_counter()
for _ in range(5): sync(probe)
ts=(time.perf_counter()-t0)/5
log(f"sync {ts*1e3:.1f}ms")

for s in (256, 512, 1024, 2048, 4096, 8192):
    q = jax.random.normal(jax.random.key(0), (2, s, 10, 64), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (2, s, 10, 64), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (2, s, 10, 64), jnp.bfloat16)
    for impl in ("flash", "xla"):
        f = jax.jit(lambda q, k, v: jax.lax.fori_loop(
            0, 10, lambda i, h: dot_product_attention(h, k, v, impl=impl), q))
        sync(f(q, k, v))
        t0=time.perf_counter()
        for _ in range(3): sync(f(q, k, v))
        dt=((time.perf_counter()-t0)/3-ts)/10
        fl = 4*2*10*s*s*64/dt/1e12
        log(f"S={s} {impl}: {dt*1e6:.0f} us ({fl:.1f} TF/s)")
