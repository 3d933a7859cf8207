"""Flash attn tuning, take 2: median-of-runs, per-shape compiled sync."""
import time
import jax, jax.numpy as jnp
from instructany2pix_tpu.ops.flash_attention import _flash_fwd, _reference_attention

def run(label, fn, *args, n=10):
    fn_j = jax.jit(fn)
    o = fn_j(*args); s0 = float(jnp.sum(o.astype(jnp.float32)))  # compile both
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        o = fn_j(*args)
        float(jnp.sum(o.astype(jnp.float32)))
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times)//2]
    return med

# measure pure sync+sum cost at output shape by timing an identity
shapes = [("mid256", (2, 20, 256, 64)), ("s1-1024", (2, 10, 1024, 64)), ("s1-4096", (2, 10, 4096, 64))]
for name, (b, h, s, d) in shapes:
    q = jax.random.normal(jax.random.key(0), (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, h, s, d), jnp.bfloat16)
    scale = d ** -0.5
    flops = 4 * b * h * s * s * d
    base = run("id", lambda q: q * 1.0, q)
    tx = run("xla", lambda q, k, v: _reference_attention(q, k, v, False, scale), q, k, v)
    print(f"{name}: overhead {base*1e3:.1f} ms; xla {(tx-base)*1e3:7.2f} ms {flops/max(tx-base,1e-9)/1e12:6.1f} TF/s", flush=True)
    for bq, bk in [(128,128),(256,256),(256,512),(512,512),(128,512)]:
        if bq > s or bk > s: continue
        tf = run("fl", lambda q,k,v,bq=bq,bk=bk: _flash_fwd(q,k,v,False,scale,bq,bk), q,k,v)
        print(f"  flash bq={bq} bk={bk}: {(tf-base)*1e3:7.2f} ms {flops/max(tf-base,1e-9)/1e12:6.1f} TF/s", flush=True)
