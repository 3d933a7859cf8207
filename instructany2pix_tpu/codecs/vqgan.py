"""Conv VQ-GAN codecs — image (2D) and audio-spectrogram variants.

Capability rebuild of the vendored taming/SpecVQGAN stacks (reference
llm/model/vae/image_vqvae.py:16-303, audio_vqvae.py:15-360,
modules/blocks*.py, modules/quantize_spec.py). The production `vq-npz`
config bypasses these (SURVEY.md §2.6), so scope here is the inference
codec surface + core training losses:

  * `VQModel`: conv Encoder/Decoder (resnet blocks, optional mid
    attention, stride-2 down/nearest-2x up), `VectorQuantizer` with
    straight-through estimator, pre/post quant 1×1 convs.
  * `encode_seq`/`decode_seq` — the LLM codec interface (reference
    image_vqvae.py:289-303, audio_vqvae.py:338-360): encode returns
    (quantized latents, flat codebook indices, grid shape info).
  * `vq_losses` — reconstruction + codebook + commitment (β=0.25);
    the GAN discriminator/perceptual terms of the reference's training
    rig (loss_spec.py, lpaps.py) are out of scope for the shipped
    passthrough path and tracked as future work.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.prng import KeyChain
from ..models import layers as L


@dataclasses.dataclass(frozen=True)
class VQConfig:
    in_channels: int = 3
    base_ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    z_channels: int = 256
    embed_dim: int = 256
    n_embed: int = 1024
    attn_at_mid: bool = True
    # down-level indices carrying attention after each res block
    # (taming `attn_resolutions`; f16 @256px → attn at the 16px level,
    # i.e. the last down level). The decoder mirrors them.
    attn_levels: Tuple[int, ...] = (4,)
    norm_groups: int = 32

    @staticmethod
    def image_f16() -> "VQConfig":
        return VQConfig()

    @staticmethod
    def audio_spec() -> "VQConfig":
        # 1-channel mel spectrogram codec (SpecVQGAN-style)
        return VQConfig(in_channels=1, ch_mult=(1, 1, 2, 2, 4))

    @staticmethod
    def tiny(in_channels: int = 3) -> "VQConfig":
        return VQConfig(
            in_channels=in_channels,
            base_ch=8,
            ch_mult=(1, 2),
            num_res_blocks=1,
            z_channels=8,
            embed_dim=8,
            n_embed=32,
            attn_levels=(1,),
            norm_groups=4,
        )


def _res_init(kc, cin, cout):
    p = {
        "norm1": L.group_norm_init(cin),
        "conv1": L.conv_init(kc(), cin, cout, 3),
        "norm2": L.group_norm_init(cout),
        "conv2": L.conv_init(kc(), cout, cout, 3),
    }
    if cin != cout:
        p["shortcut"] = L.conv_init(kc(), cin, cout, 1)
    return p


def _res(p, x, g):
    # taming Normalize = GroupNorm(32, eps=1e-6) + swish
    h = L.group_norm(p["norm1"], x, g, eps=1e-6, silu=True)
    h = L.conv2d(p["conv1"], h)
    h = L.group_norm(p["norm2"], h, g, eps=1e-6, silu=True)
    h = L.conv2d(p["conv2"], h)
    if "shortcut" in p:
        x = L.conv2d(p["shortcut"], x)
    return x + h


def _attn_init(kc, c):
    # taming AttnBlock: Normalize + 1x1 conv q/k/v/proj_out (converted
    # to linears — a 1x1 conv IS a per-pixel linear)
    return {
        "norm": L.group_norm_init(c),
        "q": L.linear_init(kc(), c, c),
        "k": L.linear_init(kc(), c, c),
        "v": L.linear_init(kc(), c, c),
        "proj_out": L.linear_init(kc(), c, c),
    }


def _attn(p, x, g):
    b, h, w, c = x.shape
    y = L.group_norm(p["norm"], x, g, eps=1e-6)
    y = y.reshape(b, h * w, c)
    q = L.linear(p["q"], y)
    k = L.linear(p["k"], y)
    v = L.linear(p["v"], y)
    a = jax.nn.softmax(
        jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32) / jnp.sqrt(float(c)),
        axis=-1,
    ).astype(v.dtype)
    o = jnp.einsum("bqk,bkc->bqc", a, v)
    o = L.linear(p["proj_out"], o).reshape(b, h, w, c)
    return x + o


def init(key, cfg: VQConfig):
    kc = KeyChain(key)
    n_levels = len(cfg.ch_mult)
    enc = {"conv_in": L.conv_init(kc(), cfg.in_channels, cfg.base_ch, 3)}
    cin = cfg.base_ch
    for i, m in enumerate(cfg.ch_mult):
        cout = cfg.base_ch * m
        blk = {}
        c = cin
        for j in range(cfg.num_res_blocks):
            blk[f"res_{j}"] = _res_init(kc, c, cout)
            if i in cfg.attn_levels:
                blk[f"attn_{j}"] = _attn_init(kc, cout)
            c = cout
        if i < n_levels - 1:
            blk["down"] = L.conv_init(kc(), cout, cout, 3)
        enc[f"down_{i}"] = blk
        cin = cout
    enc["mid_res_0"] = _res_init(kc, cin, cin)
    if cfg.attn_at_mid:
        enc["mid_attn"] = _attn_init(kc, cin)
    enc["mid_res_1"] = _res_init(kc, cin, cin)
    enc["norm_out"] = L.group_norm_init(cin)
    enc["conv_out"] = L.conv_init(kc(), cin, cfg.z_channels, 3)

    # taming decoder: conv_in takes z_channels (post_quant_conv maps
    # embed_dim -> z_channels)
    dec = {"conv_in": L.conv_init(kc(), cfg.z_channels, cin, 3)}
    dec["mid_res_0"] = _res_init(kc, cin, cin)
    if cfg.attn_at_mid:
        dec["mid_attn"] = _attn_init(kc, cin)
    dec["mid_res_1"] = _res_init(kc, cin, cin)
    for i, m in enumerate(reversed(cfg.ch_mult)):
        lvl = n_levels - 1 - i  # taming up.{lvl} indexing
        cout = cfg.base_ch * m
        blk = {}
        c = cin
        for j in range(cfg.num_res_blocks + 1):
            blk[f"res_{j}"] = _res_init(kc, c, cout)
            if lvl in cfg.attn_levels:
                blk[f"attn_{j}"] = _attn_init(kc, cout)
            c = cout
        if i < n_levels - 1:
            blk["up"] = L.conv_init(kc(), cout, cout, 3)
        dec[f"up_{i}"] = blk
        cin = cout
    dec["norm_out"] = L.group_norm_init(cin)
    dec["conv_out"] = L.conv_init(kc(), cin, cfg.in_channels, 3)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": L.conv_init(kc(), cfg.z_channels, cfg.embed_dim, 1),
        "post_quant_conv": L.conv_init(kc(), cfg.embed_dim, cfg.z_channels, 1),
        "codebook": L.embedding_init(kc(), cfg.n_embed, cfg.embed_dim),
    }


def encode_z(params, x, cfg: VQConfig):
    g = cfg.norm_groups
    p = params["encoder"]
    h = L.conv2d(p["conv_in"], x)
    for i in range(len(cfg.ch_mult)):
        blk = p[f"down_{i}"]
        for j in range(cfg.num_res_blocks):
            h = _res(blk[f"res_{j}"], h, g)
            if f"attn_{j}" in blk:
                h = _attn(blk[f"attn_{j}"], h, g)
        if "down" in blk:
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = L.conv2d(blk["down"], h, stride=2, padding="VALID")
    h = _res(p["mid_res_0"], h, g)
    if "mid_attn" in p:
        h = _attn(p["mid_attn"], h, g)
    h = _res(p["mid_res_1"], h, g)
    h = L.group_norm(p["norm_out"], h, g, eps=1e-6, silu=True)
    h = L.conv2d(p["conv_out"], h)
    return L.conv2d(params["quant_conv"], h)


def quantize(params, z):
    """Nearest-codebook lookup with straight-through gradients.
    Returns (z_q, indices, (codebook_loss, commit_loss))."""
    cb = params["codebook"]["w"]  # (K, D)
    flat = z.reshape(-1, z.shape[-1])
    d = (
        jnp.sum(flat**2, axis=1, keepdims=True)
        - 2 * flat @ cb.T
        + jnp.sum(cb**2, axis=1)[None]
    )
    idx = jnp.argmin(d, axis=1)
    zq = cb[idx].reshape(z.shape)
    codebook_loss = jnp.mean((jax.lax.stop_gradient(z) - zq) ** 2)
    commit_loss = jnp.mean((z - jax.lax.stop_gradient(zq)) ** 2)
    zq = z + jax.lax.stop_gradient(zq - z)  # straight-through
    return zq, idx.reshape(z.shape[:-1]), (codebook_loss, commit_loss)


def decode_z(params, zq, cfg: VQConfig):
    g = cfg.norm_groups
    p = params["decoder"]
    h = L.conv2d(params["post_quant_conv"], zq)
    h = L.conv2d(p["conv_in"], h)
    h = _res(p["mid_res_0"], h, g)
    if "mid_attn" in p:
        h = _attn(p["mid_attn"], h, g)
    h = _res(p["mid_res_1"], h, g)
    for i in range(len(cfg.ch_mult)):
        blk = p[f"up_{i}"]
        for j in range(cfg.num_res_blocks + 1):
            h = _res(blk[f"res_{j}"], h, g)
            if f"attn_{j}" in blk:
                h = _attn(blk[f"attn_{j}"], h, g)
        if "up" in blk:
            h = L.upsample2x_nearest(h)
            h = L.conv2d(blk["up"], h)
    h = L.group_norm(p["norm_out"], h, g, eps=1e-6, silu=True)
    return L.conv2d(p["conv_out"], h)


def vq_losses(params, x, cfg: VQConfig, beta: float = 0.25):
    z = encode_z(params, x, cfg)
    zq, idx, (cb_loss, commit) = quantize(params, z)
    recon = decode_z(params, zq, cfg)
    rec_loss = jnp.mean(jnp.abs(x - recon))
    total = rec_loss + cb_loss + beta * commit
    return total, {
        "rec_loss": rec_loss,
        "codebook_loss": cb_loss,
        "commit_loss": commit,
        "recon": recon,
        "indices": idx,
    }


class VQGANCodec:
    """LLM codec interface over a trained VQModel (reference
    VQVisionModelInterfaceForLLM, image_vqvae.py:289-303)."""

    def __init__(self, params, cfg: VQConfig):
        self.params = params
        self.cfg = cfg
        self.embed_dim = cfg.embed_dim
        self.n_embed = cfg.n_embed

    def encode_seq(self, x, model=None):
        z = encode_z(self.params, jnp.asarray(x), self.cfg)
        zq, idx, _ = quantize(self.params, z)
        b, h, w, c = zq.shape
        return zq.reshape(b, h * w, c), idx.reshape(b, -1), (h, w)

    def decode_seq(self, ind, target_shape):
        h, w = target_shape
        cb = self.params["codebook"]["w"]
        zq = cb[ind.reshape(-1)].reshape(ind.shape[0], h, w, -1)
        return decode_z(self.params, zq, self.cfg)


# -------------------------------------------------------------- converter


def convert_from_taming(sd, cfg: VQConfig):
    """Import a taming-transformers VQModel state dict (the checkpoint
    format reference image_vqvae.py:16-66 loads via init_from_ckpt) into
    this module's param tree. Conv 1×1 attention projections become
    linears; decoder `up.{lvl}` indices are mirrored (taming iterates
    levels in reverse). Torch-golden-parity-tested
    (tests/test_codecs_grounding.py)."""
    import numpy as np

    def cw(t):
        return np.ascontiguousarray(np.transpose(t, (2, 3, 1, 0)))

    def conv(prefix):
        return {"w": cw(sd[f"{prefix}.weight"]), "b": sd[f"{prefix}.bias"]}

    def lin1x1(prefix):
        w = sd[f"{prefix}.weight"][:, :, 0, 0]  # (O, I)
        return {"w": np.ascontiguousarray(w.T), "b": sd[f"{prefix}.bias"]}

    def gn(prefix):
        return {"g": sd[f"{prefix}.weight"], "b": sd[f"{prefix}.bias"]}

    def res(prefix):
        p = {
            "norm1": gn(f"{prefix}.norm1"),
            "conv1": conv(f"{prefix}.conv1"),
            "norm2": gn(f"{prefix}.norm2"),
            "conv2": conv(f"{prefix}.conv2"),
        }
        if f"{prefix}.nin_shortcut.weight" in sd:
            p["shortcut"] = conv(f"{prefix}.nin_shortcut")
        return p

    def attn(prefix):
        return {
            "norm": gn(f"{prefix}.norm"),
            "q": lin1x1(f"{prefix}.q"),
            "k": lin1x1(f"{prefix}.k"),
            "v": lin1x1(f"{prefix}.v"),
            "proj_out": lin1x1(f"{prefix}.proj_out"),
        }

    n = len(cfg.ch_mult)
    enc = {"conv_in": conv("encoder.conv_in")}
    for i in range(n):
        blk = {}
        for j in range(cfg.num_res_blocks):
            blk[f"res_{j}"] = res(f"encoder.down.{i}.block.{j}")
            if f"encoder.down.{i}.attn.{j}.q.weight" in sd:
                blk[f"attn_{j}"] = attn(f"encoder.down.{i}.attn.{j}")
        if f"encoder.down.{i}.downsample.conv.weight" in sd:
            blk["down"] = conv(f"encoder.down.{i}.downsample.conv")
        enc[f"down_{i}"] = blk
    enc["mid_res_0"] = res("encoder.mid.block_1")
    if "encoder.mid.attn_1.q.weight" in sd:
        enc["mid_attn"] = attn("encoder.mid.attn_1")
    enc["mid_res_1"] = res("encoder.mid.block_2")
    enc["norm_out"] = gn("encoder.norm_out")
    enc["conv_out"] = conv("encoder.conv_out")

    dec = {"conv_in": conv("decoder.conv_in")}
    dec["mid_res_0"] = res("decoder.mid.block_1")
    if "decoder.mid.attn_1.q.weight" in sd:
        dec["mid_attn"] = attn("decoder.mid.attn_1")
    dec["mid_res_1"] = res("decoder.mid.block_2")
    for i in range(n):
        lvl = n - 1 - i  # our up_{i} = taming up.{lvl}
        blk = {}
        for j in range(cfg.num_res_blocks + 1):
            blk[f"res_{j}"] = res(f"decoder.up.{lvl}.block.{j}")
            if f"decoder.up.{lvl}.attn.{j}.q.weight" in sd:
                blk[f"attn_{j}"] = attn(f"decoder.up.{lvl}.attn.{j}")
        if f"decoder.up.{lvl}.upsample.conv.weight" in sd:
            blk["up"] = conv(f"decoder.up.{lvl}.upsample.conv")
        dec[f"up_{i}"] = blk
    dec["norm_out"] = gn("decoder.norm_out")
    dec["conv_out"] = conv("decoder.conv_out")

    import jax.numpy as _jnp

    out = {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": conv("quant_conv"),
        "post_quant_conv": conv("post_quant_conv"),
        "codebook": {"w": sd["quantize.embedding.weight"]},
    }
    return jax.tree.map(_jnp.asarray, out)
