"""A/B: fused qkv vs unfused full UNet step, loop-amortized, on TPU."""
import sys, time
import jax, jax.numpy as jnp
from instructany2pix_tpu.models import unet as unet_lib

def log(*a): print(*a, file=sys.stderr, flush=True)
def sync(x): return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))

probe = jnp.ones((8,8)); sync(probe)
t0=time.perf_counter()
for _ in range(5): sync(probe)
ts=(time.perf_counter()-t0)/5
log(f"sync {ts*1e3:.1f}ms")

cfg = unet_lib.UNetConfig.sdxl_base(with_ip=True)

@jax.jit
def init(k):
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16), unet_lib.init(k, cfg))
params = init(jax.random.key(0))
jax.block_until_ready(params)

b = 2
lat = jax.random.normal(jax.random.key(1), (b, 64, 64, 4), jnp.bfloat16)
ctx = jax.random.normal(jax.random.key(2), (b, 77, 2048), jnp.bfloat16)
pooled = jax.random.normal(jax.random.key(3), (b, 1280), jnp.bfloat16)
tid = jnp.tile(jnp.asarray([[512, 512, 0, 0, 512, 512]], jnp.float32), (b, 1))
ip = jax.random.normal(jax.random.key(4), (b, 4, 2048), jnp.bfloat16)

def bench(params, label, n=10):
    @jax.jit
    def loop(params, lat):
        def body(i, h):
            return unet_lib.apply(params, h, jnp.full((b,), 500, jnp.int32), ctx, cfg,
                                  pooled_text=pooled, time_ids=tid,
                                  ip_tokens=ip, ip_scale=1.0).astype(h.dtype)
        return jax.lax.fori_loop(0, n, body, lat)
    sync(loop(params, lat))
    t0=time.perf_counter()
    for _ in range(3): sync(loop(params, lat))
    dt=((time.perf_counter()-t0)/3-ts)/n
    log(f"{label}: {dt*1e3:.2f} ms/step")

bench(params, "unfused")
fused = unet_lib.fuse_qkv(params)
jax.block_until_ready(fused)
bench(fused, "fused qkv/kv")
