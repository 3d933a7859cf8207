"""Segment Anything (SAM) — box-prompted mask prediction in JAX.

The reference wraps the external `segment_anything` package's
SamPredictor with the ViT-H checkpoint (reference gdino/lib.py:54-67)
purely for box→mask queries inside subject consistency. This is a
from-scratch JAX implementation of that inference path:

  * image encoder: ViT with 14×14 windowed attention (global attention
    at the configured blocks), decomposed relative position embeddings,
    and a 2-conv neck → (B, 64, 64, 256) image embedding;
  * prompt encoder: random-Fourier positional encoding + learned
    corner-type embeddings for boxes;
  * mask decoder: two-way transformer (token↔image cross attention),
    IoU head, hypernetwork MLPs over a 4× upscaled embedding.

Weight import from the official `sam_vit_h_4b8939.pth` naming via
`convert_from_sam`. Only the pieces the pipeline exercises are
implemented (no point/mask prompts, single-mask output path uses the
max-IoU of the 3 multimask outputs like SamPredictor's default).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.prng import KeyChain
from ..models import layers as L
from ..ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class SAMConfig:
    img_size: int = 1024
    patch: int = 16
    embed_dim: int = 1280  # vit-h
    depth: int = 32
    heads: int = 16
    window: int = 14
    global_blocks: Tuple[int, ...] = (7, 15, 23, 31)
    out_chans: int = 256
    decoder_depth: int = 2
    decoder_heads: int = 8
    decoder_mlp: int = 2048
    num_mask_tokens: int = 4  # 1 + 3 multimask

    @staticmethod
    def vit_h() -> "SAMConfig":
        return SAMConfig()

    @staticmethod
    def tiny() -> "SAMConfig":
        return SAMConfig(
            img_size=64,
            patch=16,
            embed_dim=32,
            depth=2,
            heads=4,
            window=2,
            global_blocks=(1,),
            out_chans=16,
            decoder_mlp=32,
        )


# ------------------------------------------------------------ image encoder


def _rel_pos_init(kc, window, head_dim, img_tokens, is_global):
    n = 2 * (img_tokens if is_global else window) - 1
    return {
        "rel_pos_h": jnp.zeros((n, head_dim)),
        "rel_pos_w": jnp.zeros((n, head_dim)),
    }


def _get_rel_pos(rel_pos, q_size, k_size):
    # SAM decomposed rel-pos lookup (sizes equal in our path)
    coords = jnp.arange(q_size)[:, None] - jnp.arange(k_size)[None, :] + (k_size - 1)
    # torch-ingested checkpoints carry numpy leaves; under jit the index
    # is a tracer, and numpy.__getitem__(tracer) raises — lift to jnp
    return jnp.asarray(rel_pos)[coords]


def _attn_with_relpos(q, k, v, p, hw, heads):
    """q,k,v: (B*, N, H, D) over an hw×hw token grid with decomposed
    relative position bias.

    Matmuls run in the INPUT dtype with f32 accumulation
    (preferred_element_type): f32 params (golden parity tests) keep
    exact f32 math; the bf16 serving path (make_segmentor) gets MXU
    bf16 throughput instead of 4×-slower f32 systolic passes — the
    softmax and the bias accumulation stay f32 either way."""
    b, n, h, d = q.shape
    scale = d**-0.5
    f32 = jnp.float32
    rh = _get_rel_pos(p["rel_pos_h"], hw, hw).astype(q.dtype)  # (hw, hw, d)
    rw = _get_rel_pos(p["rel_pos_w"], hw, hw).astype(q.dtype)
    qg = q.reshape(b, hw, hw, h, d)
    bias_h = jnp.einsum("byxhd,yud->bhyxu", qg, rh, preferred_element_type=f32)
    bias_w = jnp.einsum("byxhd,xvd->bhyxv", qg, rw, preferred_element_type=f32)

    from ..ops.attention import _tpu_available

    # bf16-only gate: f32 callers (predict_box_mask, the golden-parity
    # reference path) keep the exact XLA softmax; the forward-only
    # Pallas kernel serves the bf16 serving path. g must divide into a
    # valid block_k (see flash_attention_relpos2d).
    if _tpu_available() and n >= 1024 and q.dtype == jnp.bfloat16:
        # ViT-H global blocks (n = 64²): the XLA path materializes the
        # biased (B, H, N, N) f32 logits — ~1 GB, ~25 ms/block on v5e.
        # The Pallas kernel streams one key-grid row per inner step and
        # adds the decomposed bias in VMEM (ops/flash_attention.py).
        from ..ops.flash_attention import flash_attention_relpos2d

        o = flash_attention_relpos2d(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            bias_h.reshape(b, h, n, hw),
            bias_w.reshape(b, h, n, hw),
            scale=scale,
        )
        return o.transpose(0, 2, 1, 3)

    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=f32) * scale
    # Expand the decomposed bias to (.., n, n) with one-hot matmuls
    # instead of the 6D broadcast-add: the (b,h,hw,hw,hw,hw) form puts
    # hw (14 for window blocks) on the minor axes, which pads 14→128
    # lanes and costs ~2.7 ms of a 4.0 ms ViT-H window block (r3
    # ablation). One-hot expansion in f32 is EXACT (each output picks a
    # single input element), so golden parity is unchanged.
    key_row = jnp.arange(n) // hw  # u(s)
    key_col = jnp.arange(n) % hw  # v(s)
    e_u = (jnp.arange(hw)[:, None] == key_row[None, :]).astype(f32)  # (hw, n)
    e_v = (jnp.arange(hw)[:, None] == key_col[None, :]).astype(f32)
    bias = (
        jax.lax.dot_general(
            bias_h.reshape(b, h, n, hw), e_u,
            (((3,), (0,)), ((), ())), preferred_element_type=f32,
        )
        + jax.lax.dot_general(
            bias_w.reshape(b, h, n, hw), e_v,
            (((3,), (0,)), ((), ())), preferred_element_type=f32,
        )
    )
    attn = attn + bias
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(v.dtype), v)
    return out


def _enc_block_init(kc, cfg: SAMConfig, is_global):
    d = cfg.embed_dim
    hd = d // cfg.heads
    tokens = cfg.img_size // cfg.patch
    return {
        "ln1": L.layer_norm_init(d),
        "qkv": L.linear_init(kc(), d, 3 * d),
        "proj": L.linear_init(kc(), d, d),
        "ln2": L.layer_norm_init(d),
        "fc1": L.linear_init(kc(), d, 4 * d),
        "fc2": L.linear_init(kc(), 4 * d, d),
        **_rel_pos_init(kc, cfg.window, hd, tokens, is_global),
    }


def _window_partition(x, w):
    b, hh, ww, c = x.shape
    pad_h = (w - hh % w) % w
    pad_w = (w - ww % w) % w
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = hh + pad_h, ww + pad_w
    x = x.reshape(b, hp // w, w, wp // w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w, w, c)
    return x, (hp, wp)


def _window_unpartition(x, w, pad_hw, hw):
    hp, wp = pad_hw
    b = x.shape[0] // (hp // w * wp // w)
    x = x.reshape(b, hp // w, wp // w, w, w, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, : hw[0], : hw[1]]


def _enc_block(p, x, cfg: SAMConfig, is_global):
    b, hh, ww, d = x.shape
    heads = cfg.heads
    hd = d // heads
    shortcut = x
    h = L.layer_norm(p["ln1"], x)
    if not is_global:
        h, pad_hw = _window_partition(h, cfg.window)
        grid = cfg.window
    else:
        grid = hh
    hb = h.shape[0]
    qkv = L.linear(p["qkv"], h.reshape(hb, -1, d))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(hb, -1, heads, hd)
    k = k.reshape(hb, -1, heads, hd)
    v = v.reshape(hb, -1, heads, hd)
    o = _attn_with_relpos(q, k, v, p, grid, heads).reshape(hb, -1, d)
    o = L.linear(p["proj"], o)
    if not is_global:
        o = o.reshape(hb, cfg.window, cfg.window, d)
        o = _window_unpartition(o, cfg.window, pad_hw, (hh, ww))
    else:
        o = o.reshape(b, hh, ww, d)
    x = shortcut + o
    h = L.layer_norm(p["ln2"], x)
    x = x + L.linear(p["fc2"], L.gelu(L.linear(p["fc1"], h)))
    return x


def encoder_init(key, cfg: SAMConfig):
    kc = KeyChain(key)
    tokens = cfg.img_size // cfg.patch
    p = {
        "patch_embed": L.conv_init(kc(), 3, cfg.embed_dim, cfg.patch),
        "pos_embed": jnp.zeros((1, tokens, tokens, cfg.embed_dim)),
        "neck_conv1": {"w": jax.random.normal(kc(), (1, 1, cfg.embed_dim, cfg.out_chans)) * 0.02},
        "neck_ln1": L.layer_norm_init(cfg.out_chans),
        "neck_conv2": {"w": jax.random.normal(kc(), (3, 3, cfg.out_chans, cfg.out_chans)) * 0.02},
        "neck_ln2": L.layer_norm_init(cfg.out_chans),
    }
    for i in range(cfg.depth):
        p[f"block_{i}"] = _enc_block_init(kc, cfg, i in cfg.global_blocks)
    return p


def encoder_apply(params, x, cfg: SAMConfig):
    """x: (B, img, img, 3) normalized → (B, img/16, img/16, out_chans)."""
    h = jax.lax.conv_general_dilated(
        x, params["patch_embed"]["w"].astype(x.dtype),
        (cfg.patch, cfg.patch), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_embed"]["b"].astype(x.dtype)
    h = h + params["pos_embed"].astype(h.dtype)
    for i in range(cfg.depth):
        h = _enc_block(params[f"block_{i}"], h, cfg, i in cfg.global_blocks)
    h = jax.lax.conv_general_dilated(
        h, params["neck_conv1"]["w"].astype(h.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    h = L.layer_norm(params["neck_ln1"], h)
    h = jax.lax.conv_general_dilated(
        h, params["neck_conv2"]["w"].astype(h.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return L.layer_norm(params["neck_ln2"], h)


# ----------------------------------------------------------- prompt encoder


def prompt_init(key, cfg: SAMConfig):
    kc = KeyChain(key)
    d = cfg.out_chans
    return {
        "pe_gaussian": jax.random.normal(kc(), (2, d // 2)),
        "point_embed_0": jax.random.normal(kc(), (d,)) * 0.02,  # box corner 1
        "point_embed_1": jax.random.normal(kc(), (d,)) * 0.02,  # box corner 2
        "not_a_point": jax.random.normal(kc(), (d,)) * 0.02,
        "no_mask": jax.random.normal(kc(), (d,)) * 0.02,
    }


def _pe_encode(coords, gaussian):
    """coords in [0,1] → random-Fourier features (SAM PositionEmbeddingRandom)."""
    c = 2.0 * coords - 1.0
    proj = c @ gaussian * (2.0 * np.pi)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def encode_box(params, box_xyxy, img_size):
    """box (B, 4) pixels → sparse prompt tokens (B, 2, out_chans)."""
    b = box_xyxy.shape[0]
    corners = box_xyxy.reshape(b, 2, 2) + 0.5
    corners = corners / img_size
    pe = _pe_encode(corners, params["pe_gaussian"])
    pe = pe.at[:, 0].add(params["point_embed_0"])
    pe = pe.at[:, 1].add(params["point_embed_1"])
    return pe


def dense_pe(params, grid):
    ys = (jnp.arange(grid) + 0.5) / grid
    xs = (jnp.arange(grid) + 0.5) / grid
    coords = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (g,g,2)
    return _pe_encode(coords, params["pe_gaussian"])  # (g, g, C)


# -------------------------------------------------------------- mask decoder


def _mlp_init(kc, dims):
    return {
        f"fc{i}": L.linear_init(kc(), a, b) for i, (a, b) in enumerate(zip(dims[:-1], dims[1:]))
    }


def _mlp(p, x, act=jax.nn.relu, sigmoid_out=False):
    n = len(p)
    for i in range(n):
        x = L.linear(p[f"fc{i}"], x)
        if i < n - 1:
            x = act(x)
    return jax.nn.sigmoid(x) if sigmoid_out else x


def _xattn_init(kc, d, heads, kv_d=None, internal=None):
    internal = internal or d
    kv_d = kv_d or d
    return {
        "q": L.linear_init(kc(), d, internal),
        "k": L.linear_init(kc(), kv_d, internal),
        "v": L.linear_init(kc(), kv_d, internal),
        "o": L.linear_init(kc(), internal, d),
    }


def _xattn(p, q_in, kv, heads, v_in=None):
    # official SAM Attention takes q/k/v separately — positional
    # embeddings ride q and k only, values stay raw (v_in defaults to
    # kv for the self-attention case)
    b, nq, _ = q_in.shape
    q = L.linear(p["q"], q_in)
    k = L.linear(p["k"], kv)
    v = L.linear(p["v"], kv if v_in is None else v_in)
    d = q.shape[-1]
    hd = d // heads
    o = dot_product_attention(
        q.reshape(b, nq, heads, hd),
        k.reshape(b, -1, heads, hd),
        v.reshape(b, -1, heads, hd),
        impl="xla",
    ).reshape(b, nq, d)
    return L.linear(p["o"], o)


def decoder_init(key, cfg: SAMConfig):
    kc = KeyChain(key)
    d = cfg.out_chans
    p = {
        "iou_token": jax.random.normal(kc(), (1, d)) * 0.02,
        "mask_tokens": jax.random.normal(kc(), (cfg.num_mask_tokens, d)) * 0.02,
        "final_attn": _xattn_init(kc, d, cfg.decoder_heads, internal=d // 2),
        "final_ln": L.layer_norm_init(d),
        "up_conv1": {"w": jax.random.normal(kc(), (2, 2, d // 4, d)) * 0.02,
                     "b": jnp.zeros((d // 4,))},
        "up_ln": L.layer_norm_init(d // 4),
        "up_conv2": {"w": jax.random.normal(kc(), (2, 2, d // 8, d // 4)) * 0.02,
                     "b": jnp.zeros((d // 8,))},
        "iou_head": _mlp_init(kc, [d, d, d, cfg.num_mask_tokens]),
    }
    for i in range(cfg.num_mask_tokens):
        p[f"hyper_{i}"] = _mlp_init(kc, [d, d, d, d // 8])
    for i in range(cfg.decoder_depth):
        p[f"layer_{i}"] = {
            "self_attn": _xattn_init(kc, d, cfg.decoder_heads),
            "ln1": L.layer_norm_init(d),
            "cross_t2i": _xattn_init(kc, d, cfg.decoder_heads, internal=d // 2),
            "ln2": L.layer_norm_init(d),
            "fc1": L.linear_init(kc(), d, cfg.decoder_mlp),
            "fc2": L.linear_init(kc(), cfg.decoder_mlp, d),
            "ln3": L.layer_norm_init(d),
            "cross_i2t": _xattn_init(kc, d, cfg.decoder_heads, internal=d // 2),
            "ln4": L.layer_norm_init(d),
        }
    return p


def decoder_apply(params, img_embed, img_pe, sparse_prompt, cfg: SAMConfig):
    """img_embed (B, g, g, C); sparse_prompt (B, Np, C) →
    (masks (B, num_mask_tokens, 4g, 4g) logits, iou (B, num_mask_tokens))."""
    b, g, _, c = img_embed.shape
    tokens = jnp.concatenate(
        [
            jnp.tile(params["iou_token"][None], (b, 1, 1)),
            jnp.tile(params["mask_tokens"][None], (b, 1, 1)),
            sparse_prompt,
        ],
        axis=1,
    )
    src = img_embed.reshape(b, g * g, c)
    pos = img_pe.reshape(1, g * g, c)
    q = tokens
    heads = cfg.decoder_heads
    # official TwoWayAttentionBlock: query_pe = the ORIGINAL tokens,
    # key_pe = image pe; pe rides q/k only, values stay raw; the first
    # layer's self-attention REPLACES queries (skip_first_layer_pe)
    for i in range(cfg.decoder_depth):
        p = params[f"layer_{i}"]
        if i == 0:
            q = _xattn(p["self_attn"], q, q, heads)
        else:
            qt = q + tokens
            q = q + _xattn(p["self_attn"], qt, qt, heads, v_in=q)
        q = L.layer_norm(p["ln1"], q)
        q = q + _xattn(p["cross_t2i"], q + tokens, src + pos, heads, v_in=src)
        q = L.layer_norm(p["ln2"], q)
        q = q + L.linear(p["fc2"], jax.nn.relu(L.linear(p["fc1"], q)))
        q = L.layer_norm(p["ln3"], q)
        src = src + _xattn(p["cross_i2t"], src + pos, q + tokens, heads, v_in=q)
        src = L.layer_norm(p["ln4"], src)
    q = q + _xattn(params["final_attn"], q + tokens, src + pos, heads, v_in=src)
    q = L.layer_norm(params["final_ln"], q)

    iou = _mlp(params["iou_head"], q[:, 0])
    mask_tok = q[:, 1 : 1 + cfg.num_mask_tokens]

    up = src.reshape(b, g, g, c)
    up = jax.lax.conv_transpose(
        up, params["up_conv1"]["w"].astype(up.dtype), (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWOI", "NHWC"),
    ) + params["up_conv1"]["b"].astype(up.dtype)
    up = L.layer_norm(params["up_ln"], up)
    up = L.gelu(up)
    up = jax.lax.conv_transpose(
        up, params["up_conv2"]["w"].astype(up.dtype), (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWOI", "NHWC"),
    ) + params["up_conv2"]["b"].astype(up.dtype)
    up = L.gelu(up)  # (b, 4g, 4g, c/8)

    hyper = jnp.stack(
        [_mlp(params[f"hyper_{i}"], mask_tok[:, i]) for i in range(cfg.num_mask_tokens)],
        axis=1,
    )  # (b, M, c/8)
    masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up.astype(jnp.float32))
    return masks, iou


# ---------------------------------------------------------------- full SAM

_PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
_PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


def init(key, cfg: SAMConfig = SAMConfig.tiny()):
    kc = KeyChain(key)
    return {
        "encoder": encoder_init(kc(), cfg),
        "prompt": prompt_init(kc(), cfg),
        "decoder": decoder_init(kc(), cfg),
    }


def preprocess(img: np.ndarray, cfg: SAMConfig) -> Tuple[np.ndarray, float]:
    """uint8 (H, W, 3) → padded normalized (1, S, S, 3) + scale."""
    from ..codecs.image_io import _bilinear_resize

    h, w = img.shape[:2]
    scale = cfg.img_size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    x = _bilinear_resize(img, nh, nw)
    x = (x - _PIXEL_MEAN) / _PIXEL_STD
    out = np.zeros((cfg.img_size, cfg.img_size, 3), np.float32)
    out[:nh, :nw] = x
    return out[None], scale


def predict_box_mask(params, cfg: SAMConfig, img: np.ndarray, box_xyxy) -> np.ndarray:
    """Full box→mask query (SamPredictor.predict with a box prompt):
    returns a float mask at the original image resolution."""
    x, scale = preprocess(img, cfg)
    emb = encoder_apply(params["encoder"], jnp.asarray(x), cfg)
    g = emb.shape[1]
    box = jnp.asarray(np.asarray(box_xyxy, np.float32) * scale).reshape(1, 4)
    sparse = encode_box(params["prompt"], box, cfg.img_size)
    pe = dense_pe(params["prompt"], g)
    # no mask prompt → the official PromptEncoder's dense embedding is
    # the broadcast no_mask_embed, ADDED to the image embedding
    # (mask_decoder.predict_masks: src = image_embeddings + dense)
    emb = emb + params["prompt"]["no_mask"].astype(emb.dtype)
    masks, iou = decoder_apply(params["decoder"], emb, pe, sparse, cfg)
    # multimask: pick best of tokens 1..3 (SamPredictor default)
    best = jnp.argmax(iou[0, 1:]) + 1
    m = masks[0, best]  # (4g, 4g) logits
    h, w = img.shape[:2]
    full = jax.image.resize(m, (cfg.img_size, cfg.img_size), "bilinear")
    nh, nw = int(round(h * scale)), int(round(w * scale))
    full = full[:nh, :nw]
    full = jax.image.resize(full, (h, w), "bilinear")
    return np.asarray(full > 0.0, np.float32)


def make_segmentor(params, cfg: SAMConfig, dtype=jnp.bfloat16):
    """Serving-path segmentor: one jitted graph (encoder + prompt +
    decoder + fixed-size mask upsample) per image geometry, params cast
    to `dtype` (bf16 default — the mask is thresholded at 0, and ViT-H
    at 1024px is MXU-bound: f32 matmuls run the systolic array at ~1/4
    rate). `predict_box_mask` stays the eager f32 reference path used
    by the golden parity tests; dtype=None keeps checkpoint precision.

    Reference: gdino/lib.py:54-67 builds SamPredictor (eager torch);
    the jit here amortizes ~100 encoder/decoder dispatches per subject
    into one graph."""
    if dtype is not None:
        # dtype read off the leaf itself (numpy stays on host) —
        # jnp.asarray here would device-put the full 2.4 GB f32 tree
        # just to ask its dtype
        params = jax.tree.map(
            lambda a: a.astype(dtype)
            if jnp.issubdtype(
                a.dtype if hasattr(a, "dtype") else np.asarray(a).dtype,
                jnp.floating,
            )
            else a,
            params,
        )
    # Params enter the jit as an ARGUMENT (device-committed once here):
    # closure capture would bake the 2.4 GB ViT-H tree into the graph
    # as constants, which the axon remote-compile relay rejects (HTTP
    # 413) and which bloats any AOT cache key.
    params = jax.device_put(params)
    compute_dtype = dtype or jnp.float32

    @jax.jit
    def _core(p, img_u8, box):
        # Pre/post-processing lives ON DEVICE: the pure-numpy bilinear
        # resize costs ~1.2 s/call at 1024² on this host, vs ~1 ms of
        # VPU work here. Image geometry is static per trace (one graph
        # per geometry, as documented above).
        h, w = img_u8.shape[:2]
        scale = cfg.img_size / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        x = jax.image.resize(
            img_u8.astype(jnp.float32), (nh, nw, 3), "bilinear",
            antialias=False,  # match the eager numpy path bit-for-bit class
        )
        x = (x - jnp.asarray(_PIXEL_MEAN)) / jnp.asarray(_PIXEL_STD)
        x = jnp.pad(x, ((0, cfg.img_size - nh), (0, cfg.img_size - nw), (0, 0)))
        x = x[None].astype(compute_dtype)

        emb = encoder_apply(p["encoder"], x, cfg)
        g = emb.shape[1]
        sparse = encode_box(p["prompt"], box * scale, cfg.img_size)
        pe = dense_pe(p["prompt"], g)
        emb = emb + p["prompt"]["no_mask"].astype(emb.dtype)
        masks, iou = decoder_apply(p["decoder"], emb, pe, sparse, cfg)
        best = jnp.argmax(iou[0, 1:]) + 1  # multimask: best of tokens 1..3
        m = jnp.take(masks[0], best, axis=0).astype(jnp.float32)
        full = jax.image.resize(
            m, (cfg.img_size, cfg.img_size), "bilinear", antialias=False
        )
        crop = full[:nh, :nw]
        if (nh, nw) != (h, w):
            crop = jax.image.resize(crop, (h, w), "bilinear", antialias=False)
        return crop > 0.0

    def segmentor(image, box_xyxy):
        box = jnp.asarray(np.asarray(box_xyxy, np.float32)).reshape(1, 4)
        img = jnp.asarray(np.ascontiguousarray(image))
        return np.asarray(_core(params, img, box), np.float32)

    return segmentor


# -------------------------------------------------------------- converter


def convert_from_sam(path_or_sd, cfg: SAMConfig) -> dict:
    """Import the official SAM checkpoint (sam_vit_h_4b8939.pth naming:
    image_encoder.* / prompt_encoder.* / mask_decoder.*)."""
    from ..core import checkpoint as ckpt

    sd = (
        ckpt.load_torch_state_dict(path_or_sd)
        if isinstance(path_or_sd, str)
        else path_or_sd
    )
    L_ = ckpt.linear_w
    C_ = ckpt.conv_w
    rules = [
        (r"image_encoder\.patch_embed\.proj\.weight", r"encoder.patch_embed.w", C_),
        (r"image_encoder\.patch_embed\.proj\.bias", r"encoder.patch_embed.b", None),
        (r"image_encoder\.pos_embed", r"encoder.pos_embed", None),
        (r"image_encoder\.blocks\.(\d+)\.norm1\.weight", r"encoder.block_\1.ln1.g", None),
        (r"image_encoder\.blocks\.(\d+)\.norm1\.bias", r"encoder.block_\1.ln1.b", None),
        (r"image_encoder\.blocks\.(\d+)\.attn\.qkv\.weight", r"encoder.block_\1.qkv.w", L_),
        (r"image_encoder\.blocks\.(\d+)\.attn\.qkv\.bias", r"encoder.block_\1.qkv.b", None),
        (r"image_encoder\.blocks\.(\d+)\.attn\.proj\.weight", r"encoder.block_\1.proj.w", L_),
        (r"image_encoder\.blocks\.(\d+)\.attn\.proj\.bias", r"encoder.block_\1.proj.b", None),
        (r"image_encoder\.blocks\.(\d+)\.attn\.rel_pos_h", r"encoder.block_\1.rel_pos_h", None),
        (r"image_encoder\.blocks\.(\d+)\.attn\.rel_pos_w", r"encoder.block_\1.rel_pos_w", None),
        (r"image_encoder\.blocks\.(\d+)\.norm2\.weight", r"encoder.block_\1.ln2.g", None),
        (r"image_encoder\.blocks\.(\d+)\.norm2\.bias", r"encoder.block_\1.ln2.b", None),
        (r"image_encoder\.blocks\.(\d+)\.mlp\.lin1\.weight", r"encoder.block_\1.fc1.w", L_),
        (r"image_encoder\.blocks\.(\d+)\.mlp\.lin1\.bias", r"encoder.block_\1.fc1.b", None),
        (r"image_encoder\.blocks\.(\d+)\.mlp\.lin2\.weight", r"encoder.block_\1.fc2.w", L_),
        (r"image_encoder\.blocks\.(\d+)\.mlp\.lin2\.bias", r"encoder.block_\1.fc2.b", None),
        (r"image_encoder\.neck\.0\.weight", r"encoder.neck_conv1.w", C_),
        (r"image_encoder\.neck\.1\.weight", r"encoder.neck_ln1.g", None),
        (r"image_encoder\.neck\.1\.bias", r"encoder.neck_ln1.b", None),
        (r"image_encoder\.neck\.2\.weight", r"encoder.neck_conv2.w", C_),
        (r"image_encoder\.neck\.3\.weight", r"encoder.neck_ln2.g", None),
        (r"image_encoder\.neck\.3\.bias", r"encoder.neck_ln2.b", None),
        (
            r"prompt_encoder\.pe_layer\.positional_encoding_gaussian_matrix",
            r"prompt.pe_gaussian",
            None,
        ),
        (r"prompt_encoder\.point_embeddings\.2\.weight", r"prompt.point_embed_0", lambda t: t[0]),
        (r"prompt_encoder\.point_embeddings\.3\.weight", r"prompt.point_embed_1", lambda t: t[0]),
        (r"prompt_encoder\.not_a_point_embed\.weight", r"prompt.not_a_point", lambda t: t[0]),
        (r"prompt_encoder\.no_mask_embed\.weight", r"prompt.no_mask", lambda t: t[0]),
        (r"prompt_encoder\.point_embeddings\.[01]\.weight", r"__drop__", None),
        (r"prompt_encoder\.mask_downscaling\..*", r"__drop__", None),
        (r"mask_decoder\.iou_token\.weight", r"decoder.iou_token", None),
        (r"mask_decoder\.mask_tokens\.weight", r"decoder.mask_tokens", None),
    ]
    for a, b in [
        ("self_attn", "self_attn"),
        ("cross_attn_token_to_image", "cross_t2i"),
        ("cross_attn_image_to_token", "cross_i2t"),
    ]:
        for proj, ours in [("q_proj", "q"), ("k_proj", "k"), ("v_proj", "v"), ("out_proj", "o")]:
            rules.append(
                (
                    rf"mask_decoder\.transformer\.layers\.(\d+)\.{a}\.{proj}\.weight",
                    rf"decoder.layer_\1.{b}.{ours}.w",
                    L_,
                )
            )
            rules.append(
                (
                    rf"mask_decoder\.transformer\.layers\.(\d+)\.{a}\.{proj}\.bias",
                    rf"decoder.layer_\1.{b}.{ours}.b",
                    None,
                )
            )
    for i, ours in [(1, "ln1"), (2, "ln2"), (3, "ln3"), (4, "ln4")]:
        rules.append(
            (rf"mask_decoder\.transformer\.layers\.(\d+)\.norm{i}\.weight", rf"decoder.layer_\1.{ours}.g", None)
        )
        rules.append(
            (rf"mask_decoder\.transformer\.layers\.(\d+)\.norm{i}\.bias", rf"decoder.layer_\1.{ours}.b", None)
        )
    rules += [
        (r"mask_decoder\.transformer\.layers\.(\d+)\.mlp\.lin1\.weight", r"decoder.layer_\1.fc1.w", L_),
        (r"mask_decoder\.transformer\.layers\.(\d+)\.mlp\.lin1\.bias", r"decoder.layer_\1.fc1.b", None),
        (r"mask_decoder\.transformer\.layers\.(\d+)\.mlp\.lin2\.weight", r"decoder.layer_\1.fc2.w", L_),
        (r"mask_decoder\.transformer\.layers\.(\d+)\.mlp\.lin2\.bias", r"decoder.layer_\1.fc2.b", None),
    ]
    for proj, ours in [("q_proj", "q"), ("k_proj", "k"), ("v_proj", "v"), ("out_proj", "o")]:
        rules.append(
            (rf"mask_decoder\.transformer\.final_attn_token_to_image\.{proj}\.weight", rf"decoder.final_attn.{ours}.w", L_)
        )
        rules.append(
            (rf"mask_decoder\.transformer\.final_attn_token_to_image\.{proj}\.bias", rf"decoder.final_attn.{ours}.b", None)
        )
    rules += [
        (r"mask_decoder\.transformer\.norm_final_attn\.weight", r"decoder.final_ln.g", None),
        (r"mask_decoder\.transformer\.norm_final_attn\.bias", r"decoder.final_ln.b", None),
        # ConvTranspose2d weight (in, out, kh, kw) → ours (kh, kw, out, in)
        (r"mask_decoder\.output_upscaling\.0\.weight", r"decoder.up_conv1.w",
         # torch ConvTranspose2d (in,out,kh,kw) -> HWOI with SPATIAL
         # FLIP (lax.conv_transpose taps mirror torch's; verified
         # numerically in tests/test_sam_parity.py)
         lambda t: np.ascontiguousarray(np.transpose(t, (2, 3, 1, 0))[::-1, ::-1])),
        (r"mask_decoder\.output_upscaling\.0\.bias", r"decoder.up_conv1.b", None),
        (r"mask_decoder\.output_upscaling\.1\.weight", r"decoder.up_ln.g", None),
        (r"mask_decoder\.output_upscaling\.1\.bias", r"decoder.up_ln.b", None),
        (r"mask_decoder\.output_upscaling\.3\.weight", r"decoder.up_conv2.w",
         lambda t: np.ascontiguousarray(np.transpose(t, (2, 3, 1, 0))[::-1, ::-1])),
        (r"mask_decoder\.output_upscaling\.3\.bias", r"decoder.up_conv2.b", None),
        (r"mask_decoder\.output_hypernetworks_mlps\.(\d+)\.layers\.(\d+)\.weight",
         r"decoder.hyper_\1.fc\2.w", L_),
        (r"mask_decoder\.output_hypernetworks_mlps\.(\d+)\.layers\.(\d+)\.bias",
         r"decoder.hyper_\1.fc\2.b", None),
        (r"mask_decoder\.iou_prediction_head\.layers\.(\d+)\.weight", r"decoder.iou_head.fc\1.w", L_),
        (r"mask_decoder\.iou_prediction_head\.layers\.(\d+)\.bias", r"decoder.iou_head.fc\1.b", None),
    ]
    tree = ckpt.convert_state_dict(sd, rules, strict=False)
    tree.pop("__drop__", None)
    return tree
