"""Microbench: where do the down-path resnet milliseconds go?"""
import sys, time
import jax, jax.numpy as jnp
from instructany2pix_tpu.models import layers as L
from instructany2pix_tpu.models import unet as unet_lib

def log(*a): print(*a, file=sys.stderr, flush=True)
def sync(x): return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))

probe = jnp.ones((8,8)); sync(probe)
t0=time.perf_counter()
for _ in range(5): sync(probe)
ts=(time.perf_counter()-t0)/5
log(f"sync {ts*1e3:.1f}ms")

def loop_time(f, x, n=20, reps=3, label=""):
    lf = jax.jit(lambda x: jax.lax.fori_loop(0, n, lambda i,h: f(h), x))
    sync(lf(x))
    t0=time.perf_counter()
    for _ in range(reps): sync(lf(x))
    dt=((time.perf_counter()-t0)/reps - ts)/n
    log(f"{label}: {dt*1e6:.0f} us/call")
    return dt

kc = jax.random.key(0)
for c, hw in [(320, 64), (640, 32), (1280, 16)]:
    p = L.conv_init(jax.random.key(1), c, c, 3)
    p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
    x = jax.random.normal(kc, (2, hw, hw, c), jnp.bfloat16)
    loop_time(lambda h: L.conv2d(p, h), x, label=f"conv3x3 {c}ch @{hw}² (15.1GF)")

# full resnet at 320ch 64²
cfg = unet_lib.UNetConfig.sdxl_base()
rp = unet_lib._resnet_init(__import__("instructany2pix_tpu.core.prng", fromlist=["x"]).KeyChain(jax.random.key(2)), 320, 320, cfg.time_embed_dim)
rp = jax.tree.map(lambda x: x.astype(jnp.bfloat16), rp)
temb = jax.random.normal(kc, (2, cfg.time_embed_dim), jnp.bfloat16)
x = jax.random.normal(kc, (2, 64, 64, 320), jnp.bfloat16)
loop_time(lambda h: unet_lib._resnet(rp, h, temb, 32), x, label="resnet 320ch @64² (2 convs+2 GN)")

# conv_in: 4->320
pi = jax.tree.map(lambda t: t.astype(jnp.bfloat16), L.conv_init(jax.random.key(3), 4, 320, 3))
xl = jax.random.normal(kc, (2, 64, 64, 4), jnp.bfloat16)
f = jax.jit(lambda h: L.conv2d(pi, h))
sync(f(xl)); t0=time.perf_counter()
for _ in range(3): sync(f(xl))
log(f"conv_in 4->320: {((time.perf_counter()-t0)/3-ts)*1e6:.0f} us (single dispatch)")

# nearest upsample via jax.image.resize vs repeat
xu = jax.random.normal(kc, (2, 32, 32, 640), jnp.bfloat16)
loop_time(lambda h: jax.image.resize(h, (2, 64, 64, 640), "nearest")[:, ::2, ::2], xu, label="resize-nearest 32->64 (640ch, then slice back)")
loop_time(lambda h: jnp.repeat(jnp.repeat(h, 2, 1), 2, 2)[:, ::2, ::2], xu, label="repeat-nearest 32->64 (640ch, then slice back)")
