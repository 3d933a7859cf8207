"""Autotune flash attention blocks + compare against XLA at UNet shapes."""
import itertools, time
import jax, jax.numpy as jnp
from instructany2pix_tpu.ops.flash_attention import _flash_fwd, _reference_attention

def sync(x): return float(jnp.sum(x.astype(jnp.float32)))

def bench(fn, *args, n=10):
    fn_j = jax.jit(fn)
    sync(fn_j(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn_j(*args)
    s = sync(o)
    return (time.perf_counter() - t0) / n

def t_sync_est():
    x = jnp.ones((8, 128), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(5): sync(x)
    return (time.perf_counter() - t0) / 5

ts = t_sync_est()
print(f"sync overhead ~{ts*1e3:.1f} ms")

shapes = [
    ("unet-mid 512px", (2, 20, 256, 64)),
    ("unet-s1 512px", (2, 10, 1024, 64)),
    ("unet-s1 1024px", (2, 10, 4096, 64)),
    ("llm-prefill", (1, 32, 2048, 128)),
]
for name, (b, h, s, d) in shapes:
    q = jax.random.normal(jax.random.key(0), (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, h, s, d), jnp.bfloat16)
    scale = d ** -0.5
    flops = 4 * b * h * s * s * d
    tx = bench(lambda q,k,v: _reference_attention(q,k,v,False,scale), q,k,v) - ts
    print(f"{name}: xla {tx*1e3:7.2f} ms {flops/max(tx,1e-9)/1e12:6.1f} TF/s")
    best = None
    for bq, bk in itertools.product([128, 256, 512], [128, 256, 512, 1024]):
        if bq > s or bk > s: continue
        try:
            tf = bench(lambda q,k,v,bq=bq,bk=bk: _flash_fwd(q,k,v,False,scale,bq,bk), q,k,v) - ts
        except Exception as e:
            print(f"  bq={bq} bk={bk}: FAIL {type(e).__name__}"); continue
        print(f"  bq={bq:4d} bk={bk:4d}: {tf*1e3:7.2f} ms {flops/max(tf,1e-9)/1e12:6.1f} TF/s")
        if best is None or tf < best[0]: best = (tf, bq, bk)
    if best: print(f"  BEST flash: bq={best[1]} bk={best[2]} {best[0]*1e3:.2f} ms vs xla {tx*1e3:.2f} ms")
