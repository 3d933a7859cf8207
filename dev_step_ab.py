"""Loop-amortized UNet step profiling: full step vs conv-only vs variants."""
import dataclasses, sys, time
import jax, jax.numpy as jnp
from instructany2pix_tpu.models import unet as unet_lib

def log(*a): print(*a, file=sys.stderr, flush=True)
def sync(x): return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))

probe = jnp.ones((8,8)); sync(probe)
t0=time.perf_counter()
for _ in range(5): sync(probe)
ts=(time.perf_counter()-t0)/5
log(f"sync {ts*1e3:.1f}ms")

def bench_cfg(cfg, label, n=10, with_ip=True):
    @jax.jit
    def init(k):
        return jax.tree.map(lambda x: x.astype(jnp.bfloat16), unet_lib.init(k, cfg))
    params = init(jax.random.key(0))
    jax.block_until_ready(params)
    b = 2
    lat = jax.random.normal(jax.random.key(1), (b, 64, 64, 4), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.key(2), (b, 77, cfg.cross_attention_dim), jnp.bfloat16)
    pooled = jax.random.normal(jax.random.key(3), (b, cfg.pooled_dim), jnp.bfloat16)
    tid = jnp.tile(jnp.asarray([[512, 512, 0, 0, 512, 512]], jnp.float32), (b, 1))
    ip = jax.random.normal(jax.random.key(4), (b, 4, cfg.cross_attention_dim), jnp.bfloat16) if with_ip else None

    @jax.jit
    def loop(params, lat):
        def body(i, h):
            out = unet_lib.apply(params, h, jnp.full((b,), 500, jnp.int32), ctx, cfg,
                                 pooled_text=pooled, time_ids=tid,
                                 ip_tokens=ip, ip_scale=1.0)
            return out.astype(h.dtype)
        return jax.lax.fori_loop(0, n, body, lat)

    sync(loop(params, lat))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        sync(loop(params, lat))
    dt = ((time.perf_counter()-t0)/reps - ts)/n
    log(f"{label}: {dt*1e3:.2f} ms/step")
    for leaf in jax.tree.leaves(params):
        leaf.delete()
    return dt

base = unet_lib.UNetConfig.sdxl_base(with_ip=True)
bench_cfg(base, "full CFG step (loop x10)")
conv_only = dataclasses.replace(base, transformer_layers_per_block=(0, 0, 0), with_ip=False)
bench_cfg(conv_only, "conv-only (transformer depth 0)", with_ip=False)
no_ip = unet_lib.UNetConfig.sdxl_base(with_ip=False)
bench_cfg(no_ip, "full step without IP branch", with_ip=False)
