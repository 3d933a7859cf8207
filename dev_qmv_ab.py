"""A/B decode matvec: bf16 XLA vs int8 XLA-dequant vs pallas int8/int4."""
import sys, time
import jax, jax.numpy as jnp
import numpy as np
from instructany2pix_tpu.ops import quant as Q

def log(*a): print(*a, file=sys.stderr, flush=True)
def sync(x): return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))

probe = jnp.ones((8,8)); sync(probe)
t0=time.perf_counter()
for _ in range(5): sync(probe)
ts=(time.perf_counter()-t0)/5
log(f"sync {ts*1e3:.1f}ms")

def loop_time(f, x, n=50, reps=3, label="", bytes_read=0):
    lf = jax.jit(lambda x: jax.lax.fori_loop(0, n, lambda i,h: f(h)[:, :x.shape[-1]]*0+x, x))
    # note: body must return same shape as carry; we discard f output
    sync(lf(x))
    t0=time.perf_counter()
    for _ in range(reps): sync(lf(x))
    dt=((time.perf_counter()-t0)/reps - ts)/n
    bw = bytes_read/dt/1e9 if bytes_read else 0
    log(f"{label}: {dt*1e6:.0f} us/call ({bw:.0f} GB/s)")
    return dt

rs = np.random.RandomState(0)
for (k, n) in [(4096, 4096), (4096, 11008)]:
    w = jnp.asarray(rs.randn(k, n).astype(np.float32) * 0.02)
    wb = w.astype(jnp.bfloat16)
    q8 = Q.quantize_weight(w)
    q4 = Q.quantize_weight_int4(w)
    x = jnp.asarray(rs.randn(1, k).astype(np.float32)).astype(jnp.bfloat16)
    # correctness on chip
    r_ref = np.asarray(x.astype(jnp.float32) @ Q.dequantize_weight(q8))
    r_pal = np.asarray(Q.pallas_qmatmul(x, q8).astype(jnp.float32))
    np.testing.assert_allclose(r_pal, r_ref, atol=2e-2, rtol=2e-2)
    r_ref4 = np.asarray(x.astype(jnp.float32) @ (Q.unpack_int4(q4["w_q4"]).astype(jnp.float32) * q4["scale"][None]))
    r_pal4 = np.asarray(Q.pallas_qmatmul(x, q4).astype(jnp.float32))
    np.testing.assert_allclose(r_pal4, r_ref4, atol=5e-2, rtol=5e-2)
    log(f"--- K={k} N={n} correctness ok")
    loop_time(lambda h: h @ wb, x, label=f"bf16 XLA", bytes_read=k*n*2)
    loop_time(lambda h: (h @ q8["w_q"].astype(h.dtype)) * q8["scale"].astype(h.dtype), x, label="int8 XLA dequant", bytes_read=k*n)
    loop_time(lambda h: Q.pallas_qmatmul(h, q8), x, label="int8 pallas", bytes_read=k*n)
    loop_time(lambda h: Q.pallas_qmatmul(h, q4), x, label="int4 pallas", bytes_read=k*n//2)
