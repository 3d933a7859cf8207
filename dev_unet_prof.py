"""Diagnostic: where do the 37 ms of the SDXL UNet CFG step go?
Times sub-graphs (down path, mid block, up path, attention-only
variants) at full size on the real chip. Ad-hoc dev script."""

import sys
import time

import jax
import jax.numpy as jnp

from instructany2pix_tpu.models import unet as unet_lib
from instructany2pix_tpu.models import layers as L


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timeit(fn, *args, label="", t_sync=0.0, reps=5):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(fn(*args))
    dt = (time.perf_counter() - t0) / reps - t_sync
    log(f"{label}: {dt * 1e3:.2f} ms")
    return dt


def main():
    cfg = unet_lib.UNetConfig.sdxl_base(with_ip=True)

    @jax.jit
    def init_bf16(k):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), unet_lib.init(k, cfg)
        )

    params = init_bf16(jax.random.key(0))
    jax.block_until_ready(params)

    b = 2
    lat = jax.random.normal(jax.random.key(1), (b, 64, 64, 4), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.key(2), (b, 77, 2048), jnp.bfloat16)
    pooled = jax.random.normal(jax.random.key(3), (b, 1280), jnp.bfloat16)
    tid = jnp.tile(jnp.asarray([[512, 512, 0, 0, 512, 512]], jnp.float32), (b, 1))
    ip = jax.random.normal(jax.random.key(4), (b, 4, 2048), jnp.bfloat16)

    probe = jnp.ones((8, 8))
    sync(probe)
    t0 = time.perf_counter()
    for _ in range(5):
        sync(probe)
    t_sync = (time.perf_counter() - t0) / 5
    log(f"sync: {t_sync*1e3:.1f} ms")

    @jax.jit
    def full(params, lat):
        return unet_lib.apply(
            params, lat, jnp.full((b,), 500, jnp.int32), ctx, cfg,
            pooled_text=pooled, time_ids=tid, ip_tokens=ip, ip_scale=1.0,
        )

    t_full = timeit(full, params, lat, label="full CFG step", t_sync=t_sync)

    # mid block only at 16x16x1280 (10 transformer layers + 2 resnets)
    h16 = jax.random.normal(jax.random.key(5), (b, 16, 16, 1280), jnp.bfloat16)
    temb = jax.random.normal(jax.random.key(6), (b, cfg.time_embed_dim), jnp.bfloat16)

    @jax.jit
    def mid_only(params, h):
        mid = params["mid"]
        g = cfg.norm_num_groups
        h = unet_lib._resnet(mid["res_0"], h, temb, g)
        h = unet_lib._transformer(
            mid["attn"], h, ctx, cfg.num_attention_heads[-1],
            cfg.transformer_layers_per_block[-1], g,
            cfg.use_linear_projection, ip, 1.0,
        )
        return unet_lib._resnet(mid["res_1"], h, temb, g)

    t_mid = timeit(mid_only, params, h16, label="mid block (10 layers @256 tok)", t_sync=t_sync)

    # one 1280-dim transformer layer at 32x32 (1024 tokens), depth 10 runs at 32²? no —
    # depth-10 blocks run at 16² (mid) and depth-2... measure down_2 (10 layers at 32²? SDXL:
    # down_1 @32² depth 2 heads 10; down_2 @16² depth 10 heads 20)
    h32 = jax.random.normal(jax.random.key(7), (b, 32, 32, 640), jnp.bfloat16)

    @jax.jit
    def down1_attn(params, h):
        return unet_lib._transformer(
            params["down_1"]["attn_0"], h, ctx, cfg.num_attention_heads[1],
            cfg.transformer_layers_per_block[1], cfg.norm_num_groups,
            cfg.use_linear_projection, ip, 1.0,
        )

    t_d1 = timeit(down1_attn, params, h32, label="down_1 transformer (2 layers @1024 tok)", t_sync=t_sync)

    h16b = jax.random.normal(jax.random.key(8), (b, 16, 16, 1280), jnp.bfloat16)

    @jax.jit
    def down2_attn(params, h):
        return unet_lib._transformer(
            params["down_2"]["attn_0"], h, ctx, cfg.num_attention_heads[2],
            cfg.transformer_layers_per_block[2], cfg.norm_num_groups,
            cfg.use_linear_projection, ip, 1.0,
        )

    t_d2 = timeit(down2_attn, params, h16b, label="down_2 transformer (10 layers @256 tok)", t_sync=t_sync)

    # resnet-only pass: conv path without any transformers
    @jax.jit
    def resnets_only(params, lat):
        g = cfg.norm_num_groups
        h = L.conv2d(params["conv_in"], lat)
        for i in range(len(cfg.down_block_types)):
            blk = params[f"down_{i}"]
            for j in range(cfg.layers_per_block):
                h = unet_lib._resnet(blk[f"res_{j}"], h, temb, g)
            if "down" in blk:
                h = L.conv2d(blk["down"], h, stride=2, padding=[(1, 1), (1, 1)])
        return h

    t_res = timeit(resnets_only, params, lat, label="down-path resnets+convs only", t_sync=t_sync)

    log(f"\nfull={t_full*1e3:.1f}ms mid={t_mid*1e3:.1f} down1_attn={t_d1*1e3:.1f} "
        f"down2_attn(x10)={t_d2*1e3:.1f} down_resnets={t_res*1e3:.1f}")
    # FLOP accounting for the full step
    flops = 3.35e12  # measured r1
    log(f"implied MXU util at 197TF/s: {flops / t_full / 197e12 * 100:.0f}%")


if __name__ == "__main__":
    main()
