"""Batch-throughput scaling of the 50-step CFG denoise scan (VERDICT r1
weak #2 re-measured with scans, not per-step host syncs)."""
import sys, time
import jax, jax.numpy as jnp
from instructany2pix_tpu.diffusion import sampler as S
from instructany2pix_tpu.diffusion.schedulers import Schedule, SchedulerConfig
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
schedule = Schedule.create(SchedulerConfig())
steps = 50

for b in (1, 2, 4, 8):
    lat = jax.random.normal(jax.random.key(1), (b, 64, 64, 4), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.key(2), (b, 77, 2048), jnp.bfloat16)
    ctxn = jnp.zeros_like(ctx)
    pooled = jax.random.normal(jax.random.key(3), (b, 1280), jnp.bfloat16)
    pooledn = jnp.zeros_like(pooled)
    tid = S.default_time_ids(512, 512, b)
    ip = jax.random.normal(jax.random.key(4), (b, 4, 2048), jnp.bfloat16)
    ipu = jnp.zeros_like(ip)

    @jax.jit
    def fn(params, lat):
        return S.denoise(params, cfg, schedule, lat, ctx, ctxn, pooled, pooledn,
                         tid, num_inference_steps=steps, guidance_scale=10.0,
                         ip_tokens=ip, ip_tokens_uncond=ipu, ip_scale=1.0)
    sync(fn(params, lat))
    t0=time.perf_counter()
    reps = 2
    for _ in range(reps): sync(fn(params, lat))
    dt=(time.perf_counter()-t0)/reps - ts
    log(f"batch {b}: {dt:.3f} s for 50-step denoise -> {b/dt:.3f} images/s/chip ({dt/steps/b*1e3:.1f} ms/img/step)")
