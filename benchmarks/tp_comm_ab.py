"""Dev: TP UNet comm-volume A/B — baseline vs explicit activation
constraints (+ geglu unfuse). Runs on the 8-device virtual CPU mesh."""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

from jax._src import xla_bridge as xb

xb._clear_backends()
xb.get_backend.cache_clear()
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import sys
from collections import Counter

import jax.numpy as jnp
import jax.sharding as jsh
import numpy as np

from instructany2pix_tpu.core import tree as tree_util
from instructany2pix_tpu.core.mesh import DATA_AXIS, MODEL_AXIS, make_mesh
from instructany2pix_tpu.models import unet as unet_lib
from instructany2pix_tpu.parallel import sharding as sh

tp_mesh = make_mesh(n_data=2, n_model=4)

ucfg = unet_lib.UNetConfig(
    block_out_channels=(640, 1280),
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    layers_per_block=1,
    transformer_layers_per_block=(1, 10),
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


def run(tag, params, rules, constrain=False):
    sh_params = sh.apply_tp_rules(params, tp_mesh, rules)
    ctx = (
        sh.tp_activation_constraints(tp_mesh)
        if constrain
        else __import__("contextlib").nullcontext()
    )
    with ctx, jax.set_mesh(tp_mesh):
        bsh = jsh.NamedSharding(tp_mesh, sh.batch_spec(4))
        args = (
            jax.device_put(lat, bsh), t,
            jax.device_put(ctx, jsh.NamedSharding(tp_mesh, sh.batch_spec(3))),
            jax.device_put(pooled, jsh.NamedSharding(tp_mesh, sh.batch_spec(2))),
            tid,
            jax.device_put(ip, jsh.NamedSharding(tp_mesh, sh.batch_spec(3))),
        )
        compiled = jax.jit(ufn).lower(sh_params, *args).compile()
        got = np.asarray(compiled(sh_params, *args))
    comm = sh.collective_bytes(compiled.as_text())
    total_mb = sum(v["bytes"] for v in comm.values()) / 1e6
    summary = ", ".join(
        f"{k}: {v['count']}x {v['bytes']/1e6:.1f}MB" for k, v in sorted(comm.items())
    )
    print(f"[{tag}] comm {total_mb:.1f} MB/step [{summary}]", flush=True)
    return compiled, got


ref_out = np.asarray(jax.jit(ufn)(uparams, lat, t, ctx, pooled, tid, ip))

compiled, got = run("baseline", uparams, sh.UNET_TP_RULES)
diff = np.abs(got - ref_out).max() / (np.abs(ref_out).max() + 1e-9)
print("baseline rel diff", diff)

# B arm: attn+ff sharding only, convs replicated — isolates how much of
# the counted comm is GSPMD resharding conv channels vs the attention/ff
# TP itself (BASELINE r5 "UNet TP ruleset comm A/B" row)
ATTN_FF_ONLY = [r for r in sh.UNET_TP_RULES if "conv" not in r[0]]
_, got_b = run("attn+ff-only", uparams, ATTN_FF_ONLY)
diff_b = np.abs(got_b - ref_out).max() / (np.abs(ref_out).max() + 1e-9)
print("attn+ff-only rel diff", diff_b)

# C arm: full rules + split_geglu params + Megatron activation pinning
# (sharding.tp_activation_constraints) — the "explicit in-block sharding
# constraints" lever named by the r5 ruleset A/B row
sparams = unet_lib.split_geglu(uparams)
compiled_c, got_c = run("constrained", sparams, sh.UNET_TP_RULES, constrain=True)
diff_c = np.abs(got_c - ref_out).max() / (np.abs(ref_out).max() + 1e-9)
print("constrained rel diff", diff_c)

# dump collective-permute shapes histogram
if "--dump" in sys.argv:
    cnt = Counter()
    for line in compiled.as_text().splitlines():
        if "collective-permute(" in line and "-done" not in line:
            shape = line.split("=")[1].strip().split(" ")[0]
            cnt[shape] += 1
        if "all-reduce(" in line and "-done" not in line:
            shape = line.split("=")[1].strip().split(" ")[0]
            cnt["AR " + shape] += 1
    for k, v in cnt.most_common(40):
        print(f"{v:4d}  {k}")
