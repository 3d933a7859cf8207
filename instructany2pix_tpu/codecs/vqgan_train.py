"""VQ-GAN adversarial training rig: PatchGAN discriminator + losses.

Completes the codec training machinery of reference
llm/model/vae/modules/{discriminator_spec.py, loss_spec.py}: an
N-layer PatchGAN discriminator, hinge/vanilla GAN losses, and the
VQLPIPS-style combined objective with adaptive generator weight and
discriminator warm-up. The perceptual term accepts any feature-map
callable (e.g. CLIP vision hidden states) in place of the reference's
VGGish LPAPS network.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core.prng import KeyChain
from ..models import layers as L
from . import vqgan


@dataclasses.dataclass(frozen=True)
class DiscConfig:
    in_channels: int = 3
    base_ch: int = 64
    n_layers: int = 3

    @staticmethod
    def tiny(in_channels: int = 3) -> "DiscConfig":
        return DiscConfig(in_channels=in_channels, base_ch=8, n_layers=2)


def disc_init(key, cfg: DiscConfig = DiscConfig()):
    """NLayerDiscriminator (PatchGAN): stride-2 convs doubling channels,
    BatchNorm replaced by GroupNorm (stateless, TPU-friendly)."""
    kc = KeyChain(key)
    p = {"conv_in": L.conv_init(kc(), cfg.in_channels, cfg.base_ch, 4)}
    ch = cfg.base_ch
    for i in range(1, cfg.n_layers + 1):
        cout = min(cfg.base_ch * (2**i), cfg.base_ch * 8)
        p[f"conv_{i}"] = L.conv_init(kc(), ch, cout, 4)
        p[f"norm_{i}"] = L.group_norm_init(cout)
        ch = cout
    p["conv_out"] = L.conv_init(kc(), ch, 1, 4)
    return p


def disc_apply(params, x, cfg: DiscConfig = DiscConfig()):
    h = L.conv2d(params["conv_in"], x, stride=2)
    h = jax.nn.leaky_relu(h, 0.2)
    ch = cfg.base_ch
    for i in range(1, cfg.n_layers + 1):
        cout = min(cfg.base_ch * (2**i), cfg.base_ch * 8)
        stride = 2 if i < cfg.n_layers else 1
        h = L.conv2d(params[f"conv_{i}"], h, stride=stride)
        h = L.group_norm(params[f"norm_{i}"], h, num_groups=min(8, cout))
        h = jax.nn.leaky_relu(h, 0.2)
        ch = cout
    return L.conv2d(params["conv_out"], h)  # (B, h', w', 1) logits


def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(jax.nn.relu(1.0 - logits_real))
        + jnp.mean(jax.nn.relu(1.0 + logits_fake))
    )


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real))
        + jnp.mean(jax.nn.softplus(logits_fake))
    )


def generator_loss(logits_fake):
    return -jnp.mean(logits_fake)


def adopt_weight(weight, step, threshold: int):
    """Zero the adversarial weight before `disc_start` steps (reference
    loss_spec adopt_weight)."""
    return jnp.where(step < threshold, 0.0, weight)


def vqgan_generator_loss(
    vq_params,
    disc_params,
    x,
    step,
    vq_cfg: vqgan.VQConfig,
    disc_cfg: DiscConfig = DiscConfig(),
    perceptual_fn: Optional[Callable] = None,
    disc_start: int = 10000,
    disc_weight: float = 0.8,
    codebook_weight: float = 1.0,
    perceptual_weight: float = 1.0,
):
    """Generator-side objective: L1 recon + perceptual + codebook/commit
    + adopt-weighted adversarial term. Returns (loss, aux)."""
    total, aux = vqgan.vq_losses(vq_params, x, vq_cfg, beta=0.25)
    recon = aux["recon"]
    loss = (
        aux["rec_loss"]
        + codebook_weight * (aux["codebook_loss"] + 0.25 * aux["commit_loss"])
    )
    if perceptual_fn is not None:
        pl_ = jnp.mean(jnp.abs(perceptual_fn(x) - perceptual_fn(recon)))
        loss = loss + perceptual_weight * pl_
        aux["perceptual_loss"] = pl_
    logits_fake = disc_apply(disc_params, recon, disc_cfg)
    g_loss = generator_loss(logits_fake)
    w = adopt_weight(disc_weight, step, disc_start)
    loss = loss + w * g_loss
    aux["g_loss"] = g_loss
    aux["adv_weight"] = w
    return loss, aux


def vqgan_nodisc_loss(
    vq_params,
    x,
    vq_cfg: vqgan.VQConfig,
    perceptual_fn: Optional[Callable] = None,
    codebook_weight: float = 1.0,
    perceptual_weight: float = 1.0,
):
    """Discriminator-free VQ training objective (reference
    audio_vqvae.py:285 `VQNoDiscModel`): L1 recon + optional perceptual
    + codebook/commit under ONE optimizer — the reference's Adam
    betas=(0.5, 0.9) over encoder/decoder/quantize/quant-convs with no
    GAN branch at all. Functionally the generator loss above with the
    adversarial term removed; kept as its own entry point because the
    two-optimizer GAN rig and the single-optimizer no-disc rig are
    distinct training recipes in the reference. Returns (loss, aux)."""
    total, aux = vqgan.vq_losses(vq_params, x, vq_cfg, beta=0.25)
    loss = aux["rec_loss"] + codebook_weight * (
        aux["codebook_loss"] + 0.25 * aux["commit_loss"]
    )
    if perceptual_fn is not None:
        pl_ = jnp.mean(
            jnp.abs(perceptual_fn(x) - perceptual_fn(aux["recon"]))
        )
        loss = loss + perceptual_weight * pl_
        aux["perceptual_loss"] = pl_
    return loss, aux


def vq_segmentation_loss(
    vq_params,
    x_onehot,
    vq_cfg: vqgan.VQConfig,
    codebook_weight: float = 1.0,
):
    """Segmentation-map VQ objective (reference audio_vqvae.py:233
    `VQSegmentationModel` + taming's BCELossWithQuant): the codec
    autoencodes an (B, H, W, n_labels) one-hot label map, the decoder
    output is read as per-label logits, and the reconstruction term is
    sigmoid BCE against the one-hot targets plus the weighted
    codebook/commit quantization loss. Single optimizer, no
    discriminator. Returns (loss, aux) with `logits` in aux."""
    z = vqgan.encode_z(vq_params, x_onehot, vq_cfg)
    zq, idx, (cb_loss, commit) = vqgan.quantize(vq_params, z)
    logits = vqgan.decode_z(vq_params, zq, vq_cfg)
    # mean sigmoid-BCE with logits, numerically fused:
    # max(l,0) - l*t + log(1+exp(-|l|))
    bce = jnp.mean(
        jnp.maximum(logits, 0.0)
        - logits * x_onehot
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    qloss = cb_loss + 0.25 * commit
    loss = bce + codebook_weight * qloss
    return loss, {
        "bce_loss": bce,
        "codebook_loss": cb_loss,
        "commit_loss": commit,
        "logits": logits,
        "indices": idx,
    }


def colorize_init(key, n_labels: int):
    """Random label→RGB projection, the `colorize` buffer the reference
    registers for segmentation previews (audio_vqvae.py:236)."""
    return jax.random.normal(key, (n_labels, 3))


def segmentation_to_rgb(colorize, x_onehot, from_logits: bool = False):
    """Reference VQModel.to_rgb for n_labels>3 inputs: project the
    one-hot (or argmax-of-logits, `log_images` audio_vqvae.py:272-276)
    label planes through the random colorize matrix and min-max
    normalize to [-1, 1]."""
    if from_logits:
        n = x_onehot.shape[-1]
        x_onehot = jax.nn.one_hot(
            jnp.argmax(x_onehot, axis=-1), n, dtype=x_onehot.dtype
        )
    rgb = jnp.einsum("bhwl,lc->bhwc", x_onehot, colorize.astype(x_onehot.dtype))
    lo = jnp.min(rgb, axis=(1, 2, 3), keepdims=True)
    hi = jnp.max(rgb, axis=(1, 2, 3), keepdims=True)
    return 2.0 * (rgb - lo) / jnp.maximum(hi - lo, 1e-6) - 1.0


def vqgan_discriminator_loss(
    disc_params,
    vq_params,
    x,
    step,
    vq_cfg: vqgan.VQConfig,
    disc_cfg: DiscConfig = DiscConfig(),
    disc_start: int = 10000,
    loss_type: str = "hinge",
):
    z = vqgan.encode_z(vq_params, x, vq_cfg)
    zq, _, _ = vqgan.quantize(vq_params, z)
    recon = jax.lax.stop_gradient(vqgan.decode_z(vq_params, zq, vq_cfg))
    logits_real = disc_apply(disc_params, x, disc_cfg)
    logits_fake = disc_apply(disc_params, recon, disc_cfg)
    fn = hinge_d_loss if loss_type == "hinge" else vanilla_d_loss
    d_loss = fn(logits_real, logits_fake) * adopt_weight(1.0, step, disc_start)
    return d_loss, {"logits_real": jnp.mean(logits_real), "logits_fake": jnp.mean(logits_fake)}
