"""UNet2DCondition — SDXL-class denoiser, NHWC, pure-functional.

Covers the reference's four UNet deployments from one config-driven
implementation: SDXL base (reference pipeline.py:101), refiner
(pipeline.py:128), inpainting (pipeline.py:132-139, 9-channel input),
and the DDIM-inversion passes (ddim/pnp_pipeline.py:251-275) which
share base weights.

IP-Adapter conditioning is built in rather than monkey-patched: the
reference swaps per-layer attention processors holding separate
`to_k_ip/to_v_ip` projections (reference
diffusion/ip_adapter/attention_processor.py:82-173,282). Here every
cross-attention optionally carries an `ip` param subtree; image tokens
come in as a separate `ip_tokens` argument, attention over them is
computed with the same softmax kernel and added with `ip_scale` —
numerically identical to the reference's
`hidden + scale * ip_hidden` (attention_processor.py:161-173), but the
module graph is static and jit-friendly.

Attention dispatch: self-attention over pixels uses the Pallas flash
kernel at ≥256 tokens; text/ip cross-attention (≤81 keys) uses the XLA
path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..core.mesh import DATA_AXIS, MODEL_AXIS
from ..core.prng import KeyChain
from ..ops.attention import dot_product_attention
from ..parallel import sharding as psh
from . import layers as L


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280)
    down_block_types: Tuple[str, ...] = (
        "DownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
    )
    layers_per_block: int = 2
    transformer_layers_per_block: Tuple[int, ...] = (1, 2, 10)
    num_attention_heads: Tuple[int, ...] = (5, 10, 20)
    cross_attention_dim: int = 2048
    norm_num_groups: int = 32
    addition_embed_type: Optional[str] = "text_time"
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 2816
    num_time_ids: int = 6  # SDXL base; refiner uses 5 (incl. aesthetic score)
    use_linear_projection: bool = True
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    with_ip: bool = False  # allocate to_k_ip/to_v_ip in cross-attn
    ip_num_tokens: int = 4

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @staticmethod
    def sdxl_base(with_ip: bool = False) -> "UNetConfig":
        return UNetConfig(with_ip=with_ip)

    @staticmethod
    def sdxl_refiner() -> "UNetConfig":
        # diffusers stabilityai/stable-diffusion-xl-refiner-1.0 config
        return UNetConfig(
            block_out_channels=(384, 768, 1536, 1536),
            down_block_types=(
                "DownBlock2D",
                "CrossAttnDownBlock2D",
                "CrossAttnDownBlock2D",
                "DownBlock2D",
            ),
            transformer_layers_per_block=(1, 4, 4, 4),
            num_attention_heads=(6, 12, 24, 24),
            cross_attention_dim=1280,
            projection_class_embeddings_input_dim=2560,
            num_time_ids=5,
        )

    @staticmethod
    def sdxl_inpaint(with_ip: bool = False) -> "UNetConfig":
        # 4 latent + 1 mask + 4 masked-image latent channels
        return UNetConfig(in_channels=9, with_ip=with_ip)

    @staticmethod
    def tiny(with_ip: bool = False, in_channels: int = 4) -> "UNetConfig":
        return UNetConfig(
            in_channels=in_channels,
            block_out_channels=(32, 64),
            down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
            layers_per_block=1,
            transformer_layers_per_block=(1, 1),
            num_attention_heads=(2, 4),
            cross_attention_dim=32,
            norm_num_groups=8,
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=32 + 6 * 8,
            with_ip=with_ip,
        )

    @property
    def pooled_dim(self) -> int:
        return (
            self.projection_class_embeddings_input_dim
            - self.num_time_ids * self.addition_time_embed_dim
        )


# ------------------------------------------------------------------ blocks


def _resnet_init(kc, cin, cout, temb_dim):
    p = {
        "norm1": L.group_norm_init(cin),
        "conv1": L.conv_init(kc(), cin, cout, 3),
        "time_emb": L.linear_init(kc(), temb_dim, cout),
        "norm2": L.group_norm_init(cout),
        "conv2": L.conv_init(kc(), cout, cout, 3),
    }
    if cin != cout:
        p["shortcut"] = L.conv_init(kc(), cin, cout, 1)
    return p


def _resnet(p, x, temb, groups):
    h = L.group_norm(p["norm1"], x, groups, silu=True)
    h = L.conv2d(p["conv1"], h)
    t = L.linear(p["time_emb"], L.silu(temb))
    h = h + t[:, None, None, :].astype(h.dtype)
    h = L.group_norm(p["norm2"], h, groups, silu=True)
    h = L.conv2d(p["conv2"], h)
    if "shortcut" in p:
        x = L.conv2d(p["shortcut"], x)
    return x + h


def _attn_init(kc, dim, ctx_dim, heads, with_ip=False):
    p = {
        "to_q": L.linear_init(kc(), dim, dim, bias=False),
        "to_k": L.linear_init(kc(), ctx_dim, dim, bias=False),
        "to_v": L.linear_init(kc(), ctx_dim, dim, bias=False),
        "to_out": L.linear_init(kc(), dim, dim),
    }
    if with_ip:
        p["to_k_ip"] = L.linear_init(kc(), ctx_dim, dim, bias=False)
        p["to_v_ip"] = L.linear_init(kc(), ctx_dim, dim, bias=False)
    return p


def _attn(p, x, ctx, heads, ip_tokens=None, ip_scale=1.0, taps=None, tap_key=None,
          kv_pre=None):
    b, s, d = x.shape
    hd = d // heads
    if kv_pre is not None:
        # cross-attention K/V precomputed once per edit
        # (precompute_cross_kv): the text/IP context is constant across
        # the whole denoise scan, so the per-step per-layer ctx
        # projections are pure re-computation
        q = L.linear(p["to_q"], x).reshape(b, s, heads, hd)
        k, v = kv_pre["k"], kv_pre["v"]
    elif "to_qkv" in p:
        # fused self-attention projections (fuse_qkv transform): one
        # (d, 3d) matmul instead of three launches — the 72-layer stacks
        # are op-launch-bound at 256-1024 tokens (BASELINE.md r2)
        qkv = L.linear(p["to_qkv"], x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, heads, hd)
        k = k.reshape(b, -1, heads, hd)
        v = v.reshape(b, -1, heads, hd)
    elif "to_kv" in p:
        q = L.linear(p["to_q"], x).reshape(b, s, heads, hd)
        kv = L.linear(p["to_kv"], ctx)
        k, v = jnp.split(kv, 2, axis=-1)
        k = k.reshape(b, -1, heads, hd)
        v = v.reshape(b, -1, heads, hd)
    else:
        q = L.linear(p["to_q"], x).reshape(b, s, heads, hd)
        k = L.linear(p["to_k"], ctx).reshape(b, -1, heads, hd)
        v = L.linear(p["to_v"], ctx).reshape(b, -1, heads, hd)
    q = psh.constrain(q, DATA_AXIS, None, MODEL_AXIS, None)
    k = psh.constrain(k, DATA_AXIS, None, MODEL_AXIS, None)
    v = psh.constrain(v, DATA_AXIS, None, MODEL_AXIS, None)
    o = dot_product_attention(q, k, v).reshape(b, s, d)
    # head-sharded contiguous output feeds the row-parallel to_out
    o = psh.constrain(o, DATA_AXIS, None, MODEL_AXIS)
    if kv_pre is not None and "k_ip" in kv_pre:
        k_ip, v_ip = kv_pre["k_ip"], kv_pre["v_ip"]
        if taps is not None:
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k_ip).astype(jnp.float32)
            probs = jax.nn.softmax(logits / jnp.sqrt(float(hd)), axis=-1)
            taps[tap_key] = probs
            o_ip = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v_ip.dtype), v_ip)
            o_ip = o_ip.reshape(b, s, d)
        else:
            o_ip = dot_product_attention(q, k_ip, v_ip).reshape(b, s, d)
        o = o + ip_scale * o_ip
    elif ip_tokens is not None and "to_k_ip" in p:
        k_ip = L.linear(p["to_k_ip"], ip_tokens).reshape(b, -1, heads, hd)
        v_ip = L.linear(p["to_v_ip"], ip_tokens).reshape(b, -1, heads, hd)
        if taps is not None:
            # attention-map capture tap (reference
            # attention_processor.py:169 `self.attn_map =
            # ip_attention_probs`): explicit probs @ v so the captured
            # map IS the applied attention
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k_ip).astype(jnp.float32)
            probs = jax.nn.softmax(logits / jnp.sqrt(float(hd)), axis=-1)
            taps[tap_key] = probs  # (B, heads, S, n_ip)
            o_ip = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v_ip.dtype), v_ip)
            o_ip = o_ip.reshape(b, s, d)
        else:
            o_ip = dot_product_attention(q, k_ip, v_ip).reshape(b, s, d)
        o = o + ip_scale * o_ip
    return L.linear(p["to_out"], o)


def _tblock_init(kc, dim, ctx_dim, heads, with_ip):
    return {
        "norm1": L.layer_norm_init(dim),
        "attn1": _attn_init(kc, dim, dim, heads),
        "norm2": L.layer_norm_init(dim),
        "attn2": _attn_init(kc, dim, ctx_dim, heads, with_ip=with_ip),
        "norm3": L.layer_norm_init(dim),
        "ff_in": L.linear_init(kc(), dim, dim * 8),  # geglu: 2*4*dim
        "ff_out": L.linear_init(kc(), dim * 4, dim),
    }


def _tblock(p, x, ctx, heads, ip_tokens, ip_scale, taps=None, tap_key=None,
            kv_pre=None, pnp_share_qk=False):
    h = L.layer_norm(p["norm1"], x)
    if pnp_share_qk:
        # plug-and-play structural injection (the working version of the
        # reference's stubbed SDXLPNPPipeline feature_bags,
        # ddim/pnp_pipeline.py:281-530): every batch row attends with the
        # SOURCE row's self-attention Q/K (row 0), values stay per-row —
        # the edit follows the source's spatial structure
        b, s, d = h.shape
        hd = d // heads
        a1 = p["attn1"]
        if "to_qkv" in a1:
            q, k, v = jnp.split(L.linear(a1["to_qkv"], h), 3, axis=-1)
        else:
            q = L.linear(a1["to_q"], h)
            k = L.linear(a1["to_k"], h)
            v = L.linear(a1["to_v"], h)
        q = q.reshape(b, s, heads, hd)
        k = k.reshape(b, s, heads, hd)
        v = v.reshape(b, s, heads, hd)
        q = jnp.broadcast_to(q[:1], q.shape)
        k = jnp.broadcast_to(k[:1], k.shape)
        o = dot_product_attention(q, k, v).reshape(b, s, d)
        x = x + L.linear(p["attn1"]["to_out"], o)
    else:
        x = x + _attn(p["attn1"], h, h, heads)
    # pin the residual stream replicated-over-model between sublayers:
    # left to propagation, GSPMD shards it over heads and re-lays it
    # per sublayer with collective-permutes (BASELINE.md r5 comm A/B)
    x = psh.constrain(x, DATA_AXIS, None, None)
    h = L.layer_norm(p["norm2"], x)
    x = x + _attn(p["attn2"], h, ctx, heads, ip_tokens, ip_scale, taps, tap_key,
                  kv_pre=kv_pre)
    x = psh.constrain(x, DATA_AXIS, None, None)
    h = L.layer_norm(p["norm3"], x)
    if "ff_in_a" in p:
        # split_geglu halves: each column-parallel on its own, so the
        # gelu gate multiplies two identically-sharded tensors
        a = psh.constrain(L.linear(p["ff_in_a"], h), DATA_AXIS, None, MODEL_AXIS)
        g = psh.constrain(L.linear(p["ff_in_g"], h), DATA_AXIS, None, MODEL_AXIS)
    else:
        h = L.linear(p["ff_in"], h)
        a, g = jnp.split(h, 2, axis=-1)
    x = x + L.linear(p["ff_out"], a * L.gelu(g))
    x = psh.constrain(x, DATA_AXIS, None, None)
    return x


def _transformer_init(kc, c, ctx_dim, heads, depth, with_ip, use_linear):
    p = {
        "norm": L.group_norm_init(c),
        "proj_in": L.linear_init(kc(), c, c) if use_linear else L.conv_init(kc(), c, c, 1),
        "proj_out": L.linear_init(kc(), c, c) if use_linear else L.conv_init(kc(), c, c, 1),
    }
    for i in range(depth):
        p[f"block_{i}"] = _tblock_init(kc, c, ctx_dim, heads, with_ip)
    return p


def _transformer(
    p, x, ctx, heads, depth, groups, use_linear, ip_tokens, ip_scale,
    taps=None, tap_prefix="", kv_tree=None, pnp_share_qk=False,
):
    b, hh, ww, c = x.shape
    res = x
    # diffusers Transformer2DModel hardcodes GroupNorm eps=1e-6 (resnets
    # use the unet-level 1e-5)
    h = L.group_norm(p["norm"], x, groups, eps=1e-6)
    if use_linear:
        h = h.reshape(b, hh * ww, c)
        h = L.linear(p["proj_in"], h)
    else:
        h = L.conv2d(p["proj_in"], h).reshape(b, hh * ww, c)
    for i in range(depth):
        h = _tblock(
            p[f"block_{i}"], h, ctx, heads, ip_tokens, ip_scale,
            taps, f"{tap_prefix}.block_{i}" if taps is not None else None,
            kv_pre=kv_tree[f"block_{i}"] if kv_tree is not None else None,
            pnp_share_qk=pnp_share_qk,
        )
    if use_linear:
        h = L.linear(p["proj_out"], h).reshape(b, hh, ww, c)
    else:
        h = L.conv2d(p["proj_out"], h.reshape(b, hh, ww, c))
    return h + res


def _cross_kv_one(p, ctx, heads, ip_tokens):
    b = ctx.shape[0]
    tq = p["to_q"]
    d = next(tq[k].shape[1] for k in ("w", "w_q", "w_q4") if k in tq)
    hd = d // heads
    if "to_kv" in p:
        kv = L.linear(p["to_kv"], ctx)
        k, v = jnp.split(kv, 2, axis=-1)
    else:
        k = L.linear(p["to_k"], ctx)
        v = L.linear(p["to_v"], ctx)
    out = {"k": k.reshape(b, -1, heads, hd), "v": v.reshape(b, -1, heads, hd)}
    if ip_tokens is not None and "to_k_ip" in p:
        out["k_ip"] = L.linear(p["to_k_ip"], ip_tokens).reshape(b, -1, heads, hd)
        out["v_ip"] = L.linear(p["to_v_ip"], ip_tokens).reshape(b, -1, heads, hd)
    return out


def precompute_cross_kv(params, cfg: UNetConfig, encoder_hidden_states,
                        ip_tokens=None):
    """Project the text (and IP) context through every cross-attention's
    to_k/to_v ONCE. The context is constant across a whole denoise /
    inversion scan, so the per-step re-projection in all ~70 transformer
    layers (reference runs it inside each IPAttnProcessor call,
    attention_processor.py:282+) is pure recomputation — hoisting it
    saves 2 (+2 IP) small matmuls per layer per step. Pass the result as
    `apply(..., cross_kv=...)`; batch must match `sample`'s. ~28 MB for
    the SDXL config at CFG batch 2 — scan-loop constant, not carried."""
    ctx = encoder_hidden_states
    out = {}
    for i, btype in enumerate(cfg.down_block_types):
        if btype != "CrossAttnDownBlock2D":
            continue
        blk = {}
        for j in range(cfg.layers_per_block):
            t = {}
            for kblk in range(cfg.transformer_layers_per_block[i]):
                t[f"block_{kblk}"] = _cross_kv_one(
                    params[f"down_{i}"][f"attn_{j}"][f"block_{kblk}"]["attn2"],
                    ctx, cfg.num_attention_heads[i], ip_tokens)
            blk[f"attn_{j}"] = t
        out[f"down_{i}"] = blk
    t = {}
    for kblk in range(cfg.transformer_layers_per_block[-1]):
        t[f"block_{kblk}"] = _cross_kv_one(
            params["mid"]["attn"][f"block_{kblk}"]["attn2"],
            ctx, cfg.num_attention_heads[-1], ip_tokens)
    out["mid"] = t
    rev_types = list(reversed(cfg.down_block_types))
    rev_heads = list(reversed(cfg.num_attention_heads))
    rev_depth = list(reversed(cfg.transformer_layers_per_block))
    for i, btype in enumerate(rev_types):
        if btype != "CrossAttnDownBlock2D":
            continue
        blk = {}
        for j in range(cfg.layers_per_block + 1):
            t = {}
            for kblk in range(rev_depth[i]):
                t[f"block_{kblk}"] = _cross_kv_one(
                    params[f"up_{i}"][f"attn_{j}"][f"block_{kblk}"]["attn2"],
                    ctx, rev_heads[i], ip_tokens)
            blk[f"attn_{j}"] = t
        out[f"up_{i}"] = blk
    return out


def fuse_qkv(params):
    """Inference-time transform: concatenate attention projections so
    each self-attention runs one (d, 3d) matmul and each cross-attention
    one (ctx_d, 2d) k/v matmul. Semantics-preserving (verified in
    tests/test_models_diffusion.py); apply AFTER checkpoint load, before
    jit. The IP branch (to_k_ip/to_v_ip) is left unfused — its keys are
    4 tokens, already negligible."""

    def fuse_self(a):
        a = dict(a)
        a["to_qkv"] = {
            "w": jnp.concatenate([a["to_q"]["w"], a["to_k"]["w"], a["to_v"]["w"]], axis=1)
        }
        del a["to_q"], a["to_k"], a["to_v"]
        return a

    def fuse_cross(a):
        a = dict(a)
        a["to_kv"] = {"w": jnp.concatenate([a["to_k"]["w"], a["to_v"]["w"]], axis=1)}
        del a["to_k"], a["to_v"]
        return a

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "attn1" and isinstance(v, dict) and "to_q" in v:
                    out[k] = fuse_self(v)  # self-attention: q,k,v share input
                elif k == "attn2" and isinstance(v, dict) and "to_q" in v:
                    out[k] = fuse_cross(v)  # cross-attention: k,v share ctx
                else:
                    out[k] = walk(v)
            return out
        return node

    return walk(params)


def split_geglu(params):
    """TP-time transform: split every transformer-block geglu `ff_in`
    (d, 8d) into `ff_in_a`/`ff_in_g` (d, 4d) halves — exactly the two
    operands of `a * gelu(g)` (diffusers GEGLU keeps them concatenated,
    value half first). Semantics-preserving on any backend; under
    UNET_TP_RULES it makes each half independently column-parallel so
    the midpoint split never lands inside a shard (see the rules
    comment in parallel/sharding.py). Apply AFTER checkpoint load,
    before sharding/jit."""

    def split(ff):
        half = ff["w"].shape[1] // 2
        a = {"w": ff["w"][:, :half]}
        g = {"w": ff["w"][:, half:]}
        if "b" in ff:
            a["b"], g["b"] = ff["b"][:half], ff["b"][half:]
        return a, g

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "ff_in" and isinstance(v, dict) and "w" in v:
                    out["ff_in_a"], out["ff_in_g"] = split(v)
                else:
                    out[k] = walk(v)
            return out
        return node

    return walk(params)


# ------------------------------------------------------------------- init


def init(key, cfg: UNetConfig = UNetConfig()):
    kc = KeyChain(key)
    ch = cfg.block_out_channels
    ted = cfg.time_embed_dim
    p = {
        "conv_in": L.conv_init(kc(), cfg.in_channels, ch[0], 3),
        "time_embed": {
            "fc1": L.linear_init(kc(), ch[0], ted),
            "fc2": L.linear_init(kc(), ted, ted),
        },
    }
    if cfg.addition_embed_type == "text_time":
        p["add_embed"] = {
            "fc1": L.linear_init(kc(), cfg.projection_class_embeddings_input_dim, ted),
            "fc2": L.linear_init(kc(), ted, ted),
        }

    skip_ch = [ch[0]]
    cin = ch[0]
    for i, btype in enumerate(cfg.down_block_types):
        cout = ch[i]
        blk = {}
        for j in range(cfg.layers_per_block):
            blk[f"res_{j}"] = _resnet_init(kc, cin if j == 0 else cout, cout, ted)
            if btype == "CrossAttnDownBlock2D":
                blk[f"attn_{j}"] = _transformer_init(
                    kc,
                    cout,
                    cfg.cross_attention_dim,
                    cfg.num_attention_heads[i],
                    cfg.transformer_layers_per_block[i],
                    cfg.with_ip,
                    cfg.use_linear_projection,
                )
            skip_ch.append(cout)
        if i < len(ch) - 1:
            blk["down"] = L.conv_init(kc(), cout, cout, 3)
            skip_ch.append(cout)
        p[f"down_{i}"] = blk
        cin = cout

    mid_heads = cfg.num_attention_heads[-1]
    mid_depth = cfg.transformer_layers_per_block[-1]
    # diffusers UNet2DConditionModel always uses UNetMidBlock2DCrossAttn
    p["mid"] = {
        "res_0": _resnet_init(kc, cin, cin, ted),
        "res_1": _resnet_init(kc, cin, cin, ted),
        "attn": _transformer_init(
            kc,
            cin,
            cfg.cross_attention_dim,
            mid_heads,
            mid_depth,
            cfg.with_ip,
            cfg.use_linear_projection,
        ),
    }

    rev_ch = list(reversed(ch))
    rev_types = list(reversed(cfg.down_block_types))
    rev_heads = list(reversed(cfg.num_attention_heads))
    rev_depth = list(reversed(cfg.transformer_layers_per_block))
    for i, btype in enumerate(rev_types):
        cout = rev_ch[i]
        blk = {}
        for j in range(cfg.layers_per_block + 1):
            res_skip = skip_ch.pop()
            res_in = (cin if j == 0 else cout) + res_skip
            blk[f"res_{j}"] = _resnet_init(kc, res_in, cout, ted)
            if btype == "CrossAttnDownBlock2D":
                blk[f"attn_{j}"] = _transformer_init(
                    kc,
                    cout,
                    cfg.cross_attention_dim,
                    rev_heads[i],
                    rev_depth[i],
                    cfg.with_ip,
                    cfg.use_linear_projection,
                )
        if i < len(ch) - 1:
            blk["up"] = L.conv_init(kc(), cout, cout, 3)
        p[f"up_{i}"] = blk
        cin = cout

    p["norm_out"] = L.group_norm_init(ch[0])
    p["conv_out"] = L.conv_init(kc(), ch[0], cfg.out_channels, 3)
    return p


# ---------------------------------------------------------------- forward


def apply(
    params,
    sample: jax.Array,  # (B, H, W, in_channels)
    timestep: jax.Array,  # (B,) or scalar
    encoder_hidden_states: jax.Array,  # (B, S, cross_attention_dim)
    cfg: UNetConfig = UNetConfig(),
    pooled_text: Optional[jax.Array] = None,  # (B, pooled_dim)
    time_ids: Optional[jax.Array] = None,  # (B, 6)
    ip_tokens: Optional[jax.Array] = None,  # (B, n_ip, cross_attention_dim)
    ip_scale: float = 1.0,
    capture_ip_attn: bool = False,
    cross_kv: Optional[dict] = None,  # precompute_cross_kv output
    pnp_share_qk: bool = False,  # up-block self-attn rows share row 0's Q/K
    ignore_ip: Union[bool, int] = False,  # CNAttnProcessor semantics
) -> jax.Array:
    """When `capture_ip_attn` is set, returns `(eps, taps)` where taps
    maps layer paths → IP attention probs (B, heads, S_pixels, n_ip) —
    the reference's interpretability tap (ip_adapter/utils.py:7-59).

    `cross_kv` (from `precompute_cross_kv`) replaces the per-layer
    text/IP context projections with precomputed K/V — pass it when the
    same context drives many steps (denoise/inversion scans). When it
    carries k_ip/v_ip, `ip_tokens` is unused.

    `ignore_ip` is the counterpart of the reference's CNAttnProcessor /
    CNAttnProcessor2_0 (reference ip_adapter/attention_processor.py:416,
    481): a UNet branch that shares an IP-conditioned context — e.g. a
    ControlNet running alongside IPAdapterXL — must attend over the TEXT
    tokens only, never the trailing image-prompt tokens. There the IP
    tokens ride concatenated inside encoder_hidden_states and the
    processor slices them off (`encoder_hidden_states[:, :end_pos]`);
    here they normally arrive as the separate `ip_tokens` argument, so
    `ignore_ip=True` drops that KV source (both the live branch and any
    k_ip/v_ip baked into `cross_kv`). Passing an int N>0 additionally
    truncates the trailing N tokens from `encoder_hidden_states`
    itself — the exact concatenated-contract form, for callers handing
    a combined [text; ip] context to an auxiliary branch."""
    if ignore_ip:
        ip_tokens = None
        if isinstance(ignore_ip, int) and not isinstance(ignore_ip, bool):
            encoder_hidden_states = encoder_hidden_states[:, :-ignore_ip]
        if cross_kv is not None:
            def _strip(node):
                if isinstance(node, dict):
                    return {k: _strip(v) for k, v in node.items()
                            if k not in ("k_ip", "v_ip")}
                return node
            cross_kv = _strip(cross_kv)
    taps: Optional[dict] = {} if capture_ip_attn else None
    g = cfg.norm_num_groups
    b = sample.shape[0]
    t = jnp.broadcast_to(jnp.asarray(timestep), (b,))

    temb = L.timestep_embedding(
        t,
        cfg.block_out_channels[0],
        flip_sin_to_cos=cfg.flip_sin_to_cos,
        downscale_freq_shift=cfg.freq_shift,
    )
    temb = temb.astype(sample.dtype)
    temb = L.linear(params["time_embed"]["fc2"], L.silu(L.linear(params["time_embed"]["fc1"], temb)))

    if cfg.addition_embed_type == "text_time":
        assert pooled_text is not None and time_ids is not None
        tid = L.timestep_embedding(
            time_ids.reshape(-1),
            cfg.addition_time_embed_dim,
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=cfg.freq_shift,
        ).reshape(b, -1)
        add = jnp.concatenate([pooled_text, tid.astype(pooled_text.dtype)], axis=-1)
        add = add.astype(sample.dtype)
        aemb = L.linear(params["add_embed"]["fc2"], L.silu(L.linear(params["add_embed"]["fc1"], add)))
        temb = temb + aemb

    ctx = encoder_hidden_states
    h = L.conv2d(params["conv_in"], sample)
    skips = [h]
    for i, btype in enumerate(cfg.down_block_types):
        blk = params[f"down_{i}"]
        for j in range(cfg.layers_per_block):
            h = _resnet(blk[f"res_{j}"], h, temb, g)
            if btype == "CrossAttnDownBlock2D":
                h = _transformer(
                    blk[f"attn_{j}"],
                    h,
                    ctx,
                    cfg.num_attention_heads[i],
                    cfg.transformer_layers_per_block[i],
                    g,
                    cfg.use_linear_projection,
                    ip_tokens,
                    ip_scale,
                    taps,
                    f"down_{i}.attn_{j}",
                    kv_tree=cross_kv[f"down_{i}"][f"attn_{j}"] if cross_kv else None,
                )
            skips.append(h)
        if "down" in blk:
            # diffusers UNet Downsample2D: symmetric padding=1 (the VAE's
            # asymmetric (0,1) pad is a VAE-only convention)
            h = L.conv2d(blk["down"], h, stride=2, padding=[(1, 1), (1, 1)])
            skips.append(h)

    mid = params["mid"]
    h = _resnet(mid["res_0"], h, temb, g)
    if "attn" in mid:
        h = _transformer(
            mid["attn"],
            h,
            ctx,
            cfg.num_attention_heads[-1],
            cfg.transformer_layers_per_block[-1],
            g,
            cfg.use_linear_projection,
            ip_tokens,
            ip_scale,
            taps,
            "mid.attn",
            kv_tree=cross_kv["mid"] if cross_kv else None,
        )
    h = _resnet(mid["res_1"], h, temb, g)

    rev_types = list(reversed(cfg.down_block_types))
    rev_heads = list(reversed(cfg.num_attention_heads))
    rev_depth = list(reversed(cfg.transformer_layers_per_block))
    for i, btype in enumerate(rev_types):
        blk = params[f"up_{i}"]
        for j in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            h = _resnet(blk[f"res_{j}"], h, temb, g)
            if btype == "CrossAttnDownBlock2D":
                h = _transformer(
                    blk[f"attn_{j}"],
                    h,
                    ctx,
                    rev_heads[i],
                    rev_depth[i],
                    g,
                    cfg.use_linear_projection,
                    ip_tokens,
                    ip_scale,
                    taps,
                    f"up_{i}.attn_{j}",
                    kv_tree=cross_kv[f"up_{i}"][f"attn_{j}"] if cross_kv else None,
                    pnp_share_qk=pnp_share_qk,
                )
        if "up" in blk:
            h = L.upsample2x_nearest(h)
            h = L.conv2d(blk["up"], h)

    h = L.group_norm(params["norm_out"], h, g, silu=True)
    out = L.conv2d(params["conv_out"], h)
    if capture_ip_attn:
        return out, taps
    return out
