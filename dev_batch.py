import time
import jax, jax.numpy as jnp
from instructany2pix_tpu.models import unet as unet_lib
cfg = unet_lib.UNetConfig.sdxl_base(with_ip=True)
params = unet_lib.init(jax.random.key(0), cfg)
for k in list(params):
    params[k] = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params[k])
    jax.block_until_ready(params[k])
def sync(x): return float(jnp.sum(x.astype(jnp.float32)))
for imgs in (1, 2, 4, 8):
    b = imgs * 2  # CFG pair
    lat = jax.random.normal(jax.random.key(1), (b, 64, 64, 4), jnp.bfloat16)
    t = jnp.full((b,), 500, jnp.int32)
    ctx = jax.random.normal(jax.random.key(2), (b, 77, 2048), jnp.bfloat16)
    pooled = jax.random.normal(jax.random.key(3), (b, 1280), jnp.bfloat16)
    tid = jnp.tile(jnp.asarray([[512,512,0,0,512,512]], jnp.float32), (b,1))
    ip = jax.random.normal(jax.random.key(4), (b, 4, 2048), jnp.bfloat16)
    @jax.jit
    def step(params, lat, t, ctx, pooled, tid, ip):
        return unet_lib.apply(params, lat, t, ctx, cfg, pooled_text=pooled, time_ids=tid, ip_tokens=ip, ip_scale=1.0)
    sync(step(params, lat, t, ctx, pooled, tid, ip))
    # measure sync cost
    t0=time.perf_counter()
    for _ in range(3): sync(lat)
    tsync=(time.perf_counter()-t0)/3
    n=8
    t0=time.perf_counter()
    for _ in range(n):
        sync(step(params, lat, t, ctx, pooled, tid, ip))
    dt=(time.perf_counter()-t0)/n - tsync
    ips = imgs / (dt * 50)  # 50-step edits per sec
    print(f"imgs={imgs}: step {dt*1e3:6.1f} ms -> {ips:.3f} edits/s/chip ({ips*50:.1f} unet-img-steps/s)", flush=True)
