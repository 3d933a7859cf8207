"""A/B: new matmul-stats GroupNorm vs old reshape version + full UNet step."""
import sys, time
import jax, jax.numpy as jnp
from instructany2pix_tpu.ops.groupnorm import group_norm, _group_norm_xla

def log(*a): print(*a, file=sys.stderr, flush=True)
def sync(x): return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))

def old_gn(x, g, b, G, eps=1e-5, silu=True):
    s = x.shape; c = s[-1]; cg = c // G
    xf = x.astype(jnp.float32).reshape(s[0], -1, G, cg)
    mean = jnp.mean(xf, axis=(1,3), keepdims=True)
    var = jnp.var(xf, axis=(1,3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(s[0], -1, c) * g.astype(jnp.float32) + b.astype(jnp.float32)
    if silu: y = y * jax.nn.sigmoid(y)
    return y.reshape(s).astype(x.dtype)

probe = jnp.ones((8,8)); sync(probe)
t0=time.perf_counter()
for _ in range(5): sync(probe)
ts=(time.perf_counter()-t0)/5
log(f"sync {ts*1e3:.1f}ms")

import numpy as np
for shape in [(2,64,64,640),(2,64,64,320),(2,16,16,1280)]:
    x = jax.random.normal(jax.random.key(0), shape, jnp.bfloat16)
    g = jnp.ones((shape[-1],)); b = jnp.zeros((shape[-1],))
    fa = jax.jit(lambda x: _group_norm_xla(x, g, b, 32, 1e-5, True))
    fb = jax.jit(lambda x: old_gn(x, g, b, 32))
    ya = fa(x); yb = fb(x)
    np.testing.assert_allclose(np.asarray(ya, np.float32), np.asarray(yb, np.float32), atol=3e-2, rtol=3e-2)
    # loop 20 calls inside one jit to amortize dispatch
    la = jax.jit(lambda x: jax.lax.fori_loop(0, 20, lambda i,h: _group_norm_xla(h, g, b, 32, 1e-5, True), x))
    lb = jax.jit(lambda x: jax.lax.fori_loop(0, 20, lambda i,h: old_gn(h, g, b, 32), x))
    for name, f in [("new", la), ("old", lb)]:
        sync(f(x))
        t0=time.perf_counter()
        for _ in range(3): sync(f(x))
        dt=((time.perf_counter()-t0)/3 - ts)/20
        log(f"GN {shape} {name}: {dt*1e6:.0f} us/call")
