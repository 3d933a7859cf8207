"""Dev: bisect the at-shape constrained-TP mismatch (rel 1e-2)."""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

from jax._src import xla_bridge as xb

xb._clear_backends()
xb.get_backend.cache_clear()
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_compilation_cache", False)

import jax.numpy as jnp
import jax.sharding as jsh
import numpy as np

from instructany2pix_tpu.core.mesh import make_mesh
from instructany2pix_tpu.models import unet as unet_lib
from instructany2pix_tpu.parallel import sharding as sh

tp_mesh = make_mesh(n_data=2, n_model=4)

ucfg = unet_lib.UNetConfig(
    block_out_channels=(640, 1280),
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    layers_per_block=1,
    transformer_layers_per_block=(1, 4),
    num_attention_heads=(10, 20),
    cross_attention_dim=2048,
    norm_num_groups=32,
    addition_time_embed_dim=256,
    projection_class_embeddings_input_dim=1280 + 6 * 256,
    with_ip=True,
)
uparams = unet_lib.init(jax.random.key(2), ucfg)
b = 2
lat = jax.random.normal(jax.random.key(3), (b, 32, 32, 4), jnp.float32)
t = jnp.full((b,), 500, jnp.int32)
ctx = jax.random.normal(jax.random.key(4), (b, 77, 2048), jnp.float32)
pooled = jax.random.normal(jax.random.key(5), (b, 1280), jnp.float32)
tid = jnp.tile(jnp.asarray([[512, 512, 0, 0, 512, 512]], jnp.float32), (b, 1))
ip = jax.random.normal(jax.random.key(6), (b, 4, 2048), jnp.float32)


def ufn(p, lat, t, ctx, pooled, tid, ip):
    return unet_lib.apply(
        p, lat, t, ctx, ucfg, pooled_text=pooled, time_ids=tid,
        ip_tokens=ip, ip_scale=1.0,
    )


ref = np.asarray(jax.jit(ufn)(uparams, lat, t, ctx, pooled, tid, ip))


def run(tag, params, constrain):
    import contextlib

    sh_params = sh.apply_tp_rules(params, tp_mesh, sh.UNET_TP_RULES)
    ctx_m = sh.tp_activation_constraints(tp_mesh) if constrain else contextlib.nullcontext()
    with ctx_m, jax.set_mesh(tp_mesh):
        bsh = jsh.NamedSharding(tp_mesh, sh.batch_spec(4))
        args = (
            jax.device_put(lat, bsh), t,
            jax.device_put(ctx, jsh.NamedSharding(tp_mesh, sh.batch_spec(3))),
            jax.device_put(pooled, jsh.NamedSharding(tp_mesh, sh.batch_spec(2))),
            tid,
            jax.device_put(ip, jsh.NamedSharding(tp_mesh, sh.batch_spec(3))),
        )
        got = np.asarray(jax.jit(ufn)(sh_params, *args))
    d = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"{tag}: rel {d:.3e}", flush=True)


run("unconstrained fused-geglu   ", uparams, False)
run("unconstrained split-geglu   ", unet_lib.split_geglu(uparams), False)
run("constrained   fused-geglu   ", uparams, True)
run("constrained   split-geglu   ", unet_lib.split_geglu(uparams), True)
