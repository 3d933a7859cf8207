"""Audio codec stack: 1D VQ model, MelGAN vocoder, LPAPS perceptual loss.

TPU-native rebuild of the reference's audio decode capability
(reference llm/model/vae/audio_vqvae.py:172-230 `VQModel1d`,
vae/modules/vocoder.py `Generator`/`load_vocoder`, vae/modules/lpaps.py
`LPAPS` + vggishish.py `VGGishish`). Everything is NWC/NHWC channel-last
pure functions over param pytrees; torch checkpoints import through the
converters at the bottom (weight-norm is folded into plain kernels at
load time — inference never re-normalizes).

Together with `codecs.processors.AudioVAEProcessor` (wav → log-mel) this
closes the loop the reference calls `decode_seq`: mel → VQ codes → mel →
waveform.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.prng import KeyChain
from ..models import layers as L
from . import vqgan


# --------------------------------------------------------------- conv1d


def conv1d_init(key, cin: int, cout: int, k: int, scale: float = 0.02):
    kw, _ = jax.random.split(key)
    return {
        "w": jax.random.normal(kw, (k, cin, cout)) * scale,
        "b": jnp.zeros((cout,)),
    }


def conv1d(p, x, stride: int = 1, padding="SAME", dilation: int = 1, groups: int = 1):
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride,),
        padding=padding if isinstance(padding, str) else [tuple(padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    return out + p["b"].astype(x.dtype)


def conv1d_transpose(p, x, stride: int, pad: int, outpad: int = 0):
    """torch ConvTranspose1d semantics: out_len = (T-1)*stride - 2*pad
    + k + outpad. Expressed as an input-dilated convolution; `p["w"]` is
    stored pre-flipped in (k, cin, cout) conv orientation (the converter
    handles torch's (cin, cout, k) layout)."""
    k = p["w"].shape[0]
    lo = k - 1 - pad
    hi = k - 1 - pad + outpad
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(1,),
        padding=[(lo, hi)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + p["b"].astype(x.dtype)


def _reflect_pad_w(x, n: int):
    return jnp.pad(x, ((0, 0), (n, n), (0, 0)), mode="reflect")


def _leaky(x, slope: float = 0.2):
    return jnp.where(x >= 0, x, slope * x)


# ----------------------------------------------------------- 1D VQ model


@dataclasses.dataclass(frozen=True)
class VQ1DConfig:
    """SpecVQGAN `VQModel1d` (reference audio_vqvae.py:172-230): mel
    features (B, T, mel_bins) treated as a 1D sequence with mel bins as
    channels, strided-conv downsampling, shared VectorQuantizer."""

    in_channels: int = 80  # mel bins
    base_ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    z_channels: int = 256
    embed_dim: int = 256
    n_embed: int = 1024
    norm_groups: int = 32

    @staticmethod
    def tiny() -> "VQ1DConfig":
        return VQ1DConfig(
            in_channels=8, base_ch=8, ch_mult=(1, 2), num_res_blocks=1,
            z_channels=8, embed_dim=8, n_embed=32, norm_groups=4,
        )


def _res1d_init(kc, cin, cout):
    p = {
        "norm1": L.group_norm_init(cin),
        "conv1": conv1d_init(kc(), cin, cout, 3),
        "norm2": L.group_norm_init(cout),
        "conv2": conv1d_init(kc(), cout, cout, 3),
    }
    if cin != cout:
        p["shortcut"] = conv1d_init(kc(), cin, cout, 1)
    return p


def _gn1d(p, x, groups, silu=False):
    # group_norm over the channel axis of (B, T, C): reuse the 2D helper
    # by inserting a singleton spatial axis
    h = L.group_norm(p, x[:, :, None, :], groups, silu=silu)
    return h[:, :, 0, :]


def _res1d(p, x, g):
    h = _gn1d(p["norm1"], x, g, silu=True)
    h = conv1d(p["conv1"], h)
    h = _gn1d(p["norm2"], h, g, silu=True)
    h = conv1d(p["conv2"], h)
    if "shortcut" in p:
        x = conv1d(p["shortcut"], x)
    return x + h


def vq1d_init(key, cfg: VQ1DConfig):
    kc = KeyChain(key)
    enc = {"conv_in": conv1d_init(kc(), cfg.in_channels, cfg.base_ch, 3)}
    cin = cfg.base_ch
    for i, m in enumerate(cfg.ch_mult):
        cout = cfg.base_ch * m
        blk = {}
        c = cin
        for j in range(cfg.num_res_blocks):
            blk[f"res_{j}"] = _res1d_init(kc, c, cout)
            c = cout
        if i < len(cfg.ch_mult) - 1:
            blk["down"] = conv1d_init(kc(), cout, cout, 3)
        enc[f"down_{i}"] = blk
        cin = cout
    enc["mid_res_0"] = _res1d_init(kc, cin, cin)
    enc["mid_res_1"] = _res1d_init(kc, cin, cin)
    enc["norm_out"] = L.group_norm_init(cin)
    enc["conv_out"] = conv1d_init(kc(), cin, cfg.z_channels, 3)

    dec = {"conv_in": conv1d_init(kc(), cfg.embed_dim, cin, 3)}
    dec["mid_res_0"] = _res1d_init(kc, cin, cin)
    dec["mid_res_1"] = _res1d_init(kc, cin, cin)
    for i, m in enumerate(reversed(cfg.ch_mult)):
        cout = cfg.base_ch * m
        blk = {}
        c = cin
        for j in range(cfg.num_res_blocks + 1):
            blk[f"res_{j}"] = _res1d_init(kc, c, cout)
            c = cout
        if i < len(cfg.ch_mult) - 1:
            blk["up"] = conv1d_init(kc(), cout, cout, 3)
        dec[f"up_{i}"] = blk
        cin = cout
    dec["norm_out"] = L.group_norm_init(cin)
    dec["conv_out"] = conv1d_init(kc(), cin, cfg.in_channels, 3)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": conv1d_init(kc(), cfg.z_channels, cfg.embed_dim, 1),
        "post_quant_conv": conv1d_init(kc(), cfg.embed_dim, cfg.embed_dim, 1),
        "codebook": L.embedding_init(kc(), cfg.n_embed, cfg.embed_dim),
    }


def vq1d_encode(params, x, cfg: VQ1DConfig):
    """mel (B, T, mel_bins) → pre-quant latents (B, T', embed_dim)."""
    g = cfg.norm_groups
    p = params["encoder"]
    h = conv1d(p["conv_in"], x)
    for i in range(len(cfg.ch_mult)):
        blk = p[f"down_{i}"]
        for j in range(cfg.num_res_blocks):
            h = _res1d(blk[f"res_{j}"], h, g)
        if "down" in blk:
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 0)))
            h = conv1d(blk["down"], h, stride=2, padding="VALID")
    h = _res1d(p["mid_res_0"], h, g)
    h = _res1d(p["mid_res_1"], h, g)
    h = _gn1d(p["norm_out"], h, g, silu=True)
    h = conv1d(p["conv_out"], h)
    return conv1d(params["quant_conv"], h)


def vq1d_decode(params, zq, cfg: VQ1DConfig):
    g = cfg.norm_groups
    p = params["decoder"]
    h = conv1d(params["post_quant_conv"], zq)
    h = conv1d(p["conv_in"], h)
    h = _res1d(p["mid_res_0"], h, g)
    h = _res1d(p["mid_res_1"], h, g)
    for i in range(len(cfg.ch_mult)):
        blk = p[f"up_{i}"]
        for j in range(cfg.num_res_blocks + 1):
            h = _res1d(blk[f"res_{j}"], h, g)
        if "up" in blk:
            b, t, c = h.shape
            h = jnp.repeat(h, 2, axis=1)
            h = conv1d(blk["up"], h)
    h = _gn1d(p["norm_out"], h, g, silu=True)
    return conv1d(p["conv_out"], h)


class VQ1DCodec:
    """LLM codec interface (reference VQAudioModelInterfaceForLLM,
    audio_vqvae.py:338-360): encode_seq → (quantized frames, indices,
    shape info); decode_seq → mel."""

    def __init__(self, params, cfg: VQ1DConfig):
        self.params = params
        self.cfg = cfg
        self.embed_dim = cfg.embed_dim
        self.n_embed = cfg.n_embed

    def encode_seq(self, mel):
        z = vq1d_encode(self.params, jnp.asarray(mel), self.cfg)
        zq, idx, _ = vqgan.quantize(self.params, z)
        return zq, idx, zq.shape[1]

    def decode_seq(self, codes, info=None):
        """codes: (B, T', embed_dim) quantized frames or (B, T') int
        codebook indices."""
        codes = jnp.asarray(codes)
        if jnp.issubdtype(codes.dtype, jnp.integer):
            codes = self.params["codebook"]["w"][codes]
        return vq1d_decode(self.params, codes, self.cfg)


def vq1d_losses(params, x, cfg: VQ1DConfig, beta: float = 0.25):
    z = vq1d_encode(params, x, cfg)
    zq, idx, (cb_loss, commit) = vqgan.quantize(params, z)
    recon = vq1d_decode(params, zq, cfg)
    rec = jnp.mean(jnp.abs(x - recon))
    return rec + cb_loss + beta * commit, {
        "rec_loss": rec, "codebook_loss": cb_loss, "commit_loss": commit,
        "recon": recon, "indices": idx,
    }


# ------------------------------------------------------- MelGAN vocoder


@dataclasses.dataclass(frozen=True)
class VocoderConfig:
    """MelGAN Generator (reference vocoder.py:90-132): mel → waveform,
    ×256 upsampling via ratios (8, 8, 2, 2)."""

    n_mel_channels: int = 80
    ngf: int = 32
    n_residual_layers: int = 3
    ratios: Tuple[int, ...] = (8, 8, 2, 2)

    @staticmethod
    def tiny() -> "VocoderConfig":
        return VocoderConfig(n_mel_channels=8, ngf=4, n_residual_layers=1,
                             ratios=(2, 2))

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.ratios:
            out *= r
        return out


def vocoder_init(key, cfg: VocoderConfig):
    kc = KeyChain(key)
    mult = 2 ** len(cfg.ratios)
    p = {"conv_in": conv1d_init(kc(), cfg.n_mel_channels, mult * cfg.ngf, 7)}
    for i, r in enumerate(cfg.ratios):
        up = {"up": conv1d_init(kc(), mult * cfg.ngf, mult * cfg.ngf // 2, r * 2)}
        for j in range(cfg.n_residual_layers):
            dim = mult * cfg.ngf // 2
            up[f"res_{j}"] = {
                "conv1": conv1d_init(kc(), dim, dim, 3),
                "conv2": conv1d_init(kc(), dim, dim, 1),
                "shortcut": conv1d_init(kc(), dim, dim, 1),
            }
        p[f"stage_{i}"] = up
        mult //= 2
    p["conv_out"] = conv1d_init(kc(), cfg.ngf, 1, 7)
    return p


def vocoder_apply(params, mel, cfg: VocoderConfig):
    """mel (B, T, n_mel) → waveform (B, T * hop_length)."""
    h = _reflect_pad_w(mel, 3)
    h = conv1d(params["conv_in"], h, padding="VALID")
    for i, r in enumerate(cfg.ratios):
        st = params[f"stage_{i}"]
        h = _leaky(h)
        h = conv1d_transpose(st["up"], h, stride=r, pad=r // 2 + r % 2,
                             outpad=r % 2)
        for j in range(cfg.n_residual_layers):
            rb = st[f"res_{j}"]
            dil = 3**j
            x = _reflect_pad_w(_leaky(h), dil)
            x = conv1d(rb["conv1"], x, padding="VALID", dilation=dil)
            x = conv1d(rb["conv2"], _leaky(x))
            h = conv1d(rb["shortcut"], h) + x
    h = _reflect_pad_w(_leaky(h), 3)
    h = conv1d(params["conv_out"], h, padding="VALID")
    return jnp.tanh(h)[..., 0]


# ------------------------------------------------------- LPAPS (VGGishish)

VGGISH_LAYERS: Tuple = (
    64, 64, "MP", 128, 128, "MP", 256, 256, 256, "MP", 512, 512, 512, "MP",
    512, 512, 512,
)
LPAPS_CHANNELS = (64, 128, 256, 512, 512)  # feature taps after each slice


@dataclasses.dataclass(frozen=True)
class LPAPSConfig:
    conv_layers: Tuple = VGGISH_LAYERS
    chns: Tuple[int, ...] = LPAPS_CHANNELS

    @staticmethod
    def tiny() -> "LPAPSConfig":
        return LPAPSConfig(conv_layers=(4, "MP", 8, "MP", 8), chns=(4, 8, 8))


def lpaps_init(key, cfg: LPAPSConfig = LPAPSConfig()):
    kc = KeyChain(key)
    convs = []
    cin = 1
    for v in cfg.conv_layers:
        if v == "MP":
            continue
        convs.append(L.conv_init(kc(), cin, int(v), 3))
        cin = int(v)
    lins = [
        {"w": jnp.abs(jax.random.normal(kc(), (1, 1, c, 1))) * 0.1}
        for c in cfg.chns
    ]
    return {
        "convs": convs,
        "lins": lins,
        # spectrogram scaling stats (per mel bin); identity by default
        "shift": jnp.zeros((1,)),
        "scale": jnp.ones((1,)),
    }


def _vggish_features(params, x, cfg: LPAPSConfig):
    """x: (B, F, T) mel in [-1, 1] → per-slice feature maps. Slices end
    at each ReLU preceding a maxpool (and the final ReLU), matching
    taming-LPIPS tap points."""
    h = x[..., None]  # (B, F, T, 1)
    feats = []
    ci = 0
    last = None
    for v in cfg.conv_layers:
        if v == "MP":
            feats.append(last)
            h = -jax.lax.reduce_window(
                -h, jnp.inf, jax.lax.min, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        else:
            h = jax.nn.relu(L.conv2d(params["convs"][ci], h))
            last = h
            ci += 1
    feats.append(last)
    return feats[: len(cfg.chns)]


def lpaps_loss(params, x, y, cfg: LPAPSConfig = LPAPSConfig()):
    """Perceptual distance between two mel spectrograms (B, F, T) —
    reference lpaps.py:48-60: unit-normalize each tap's channels, squared
    diff, learned 1×1 reweighting, spatial mean, sum over taps."""
    shift = params["shift"].reshape(1, -1, 1)  # per-frequency stats
    scale = params["scale"].reshape(1, -1, 1)
    xs = (x - shift) / scale
    ys = (y - shift) / scale
    fx = _vggish_features(params, xs, cfg)
    fy = _vggish_features(params, ys, cfg)
    total = 0.0
    for fa, fb, lin in zip(fx, fy, params["lins"]):
        na = fa / (jnp.linalg.norm(fa, axis=-1, keepdims=True) + 1e-10)
        nb = fb / (jnp.linalg.norm(fb, axis=-1, keepdims=True) + 1e-10)
        diff = (na - nb) ** 2
        w = jnp.sum(diff * lin["w"].reshape(1, 1, 1, -1), axis=-1)
        total = total + jnp.mean(w, axis=(1, 2))
    return total  # (B,)


# ----------------------------------------------------------- converters


def _fold_weight_norm(sd: dict, prefix: str) -> Tuple[np.ndarray, np.ndarray]:
    """weight_norm(Conv1d) → plain kernel: w = g * v / ||v||, norms over
    all-but-first dims (torch's default dim=0)."""
    if f"{prefix}.weight_g" in sd:
        g = np.asarray(sd[f"{prefix}.weight_g"], np.float32)
        v = np.asarray(sd[f"{prefix}.weight_v"], np.float32)
        nrm = np.sqrt((v**2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
        w = g * v / (nrm + 1e-12)
    else:
        w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    b = np.asarray(
        sd.get(f"{prefix}.bias", np.zeros(w.shape[0], np.float32)), np.float32
    )
    return w, b


def _conv1d_from_torch(sd: dict, prefix: str) -> dict:
    w, b = _fold_weight_norm(sd, prefix)
    # torch Conv1d (cout, cin, k) → (k, cin, cout)
    return {"w": jnp.asarray(w.transpose(2, 1, 0)), "b": jnp.asarray(b)}


def _convT1d_from_torch(sd: dict, prefix: str) -> dict:
    w, b = _fold_weight_norm(sd, prefix)
    # torch ConvTranspose1d (cin, cout, k) → flipped conv kernel
    # (k, cin, cout) for the input-dilated formulation
    return {"w": jnp.asarray(np.flip(w, axis=2).transpose(2, 0, 1).copy()),
            "b": jnp.asarray(b)}


def convert_vocoder_from_torch(sd: dict, cfg: VocoderConfig) -> dict:
    """MelGAN Generator state dict (reference vocoder.py `load_vocoder`:
    best_netG.pt) → vocoder params. The torch model is one nn.Sequential
    `model.*`; layout per __init__: [pad, conv, (leaky, convT,
    res×n)×len(ratios), leaky, pad, conv, tanh]."""
    idx = 1  # model.0 is ReflectionPad
    p = {"conv_in": _conv1d_from_torch(sd, f"model.{idx}")}
    idx += 1
    for i in range(len(cfg.ratios)):
        idx += 1  # LeakyReLU
        st = {"up": _convT1d_from_torch(sd, f"model.{idx}")}
        idx += 1
        for j in range(cfg.n_residual_layers):
            base = f"model.{idx}"
            st[f"res_{j}"] = {
                # block: [leaky, pad, conv, leaky, conv]; shortcut conv
                "conv1": _conv1d_from_torch(sd, f"{base}.block.2"),
                "conv2": _conv1d_from_torch(sd, f"{base}.block.4"),
                "shortcut": _conv1d_from_torch(sd, f"{base}.shortcut"),
            }
            idx += 1
        p[f"stage_{i}"] = st
    idx += 2  # LeakyReLU, ReflectionPad
    p["conv_out"] = _conv1d_from_torch(sd, f"model.{idx}")
    return p


def convert_lpaps_from_torch(sd: dict, cfg: LPAPSConfig = LPAPSConfig()) -> dict:
    """LPAPS state dict (reference lpaps.py) → params: VGGishish conv
    stack under `net.slice*`/`net.features.*`, NetLin 1×1 weights under
    `lin{k}.model.1.weight`, scaling stats under `scaling_layer.*`."""
    convs = []
    # features indices: conv layers occupy even positions between ReLUs
    fi = 0
    for v in cfg.conv_layers:
        if v == "MP":
            fi += 1
            continue
        key = f"net.features.{fi}"
        if f"{key}.weight" not in sd:
            raise KeyError(key)
        w = np.asarray(sd[f"{key}.weight"], np.float32)  # (cout,cin,kh,kw)
        b = np.asarray(sd[f"{key}.bias"], np.float32)
        convs.append({
            "w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)
        })
        fi += 2  # conv + relu
    lins = []
    for k in range(len(cfg.chns)):
        w = np.asarray(sd[f"lin{k}.model.1.weight"], np.float32)  # (1,c,1,1)
        lins.append({"w": jnp.asarray(w.transpose(2, 3, 1, 0))})
    shift = jnp.asarray(np.asarray(sd["scaling_layer.shift"], np.float32).reshape(-1))
    scale = jnp.asarray(np.asarray(sd["scaling_layer.scale"], np.float32).reshape(-1))
    return {"convs": convs, "lins": lins, "shift": shift, "scale": scale}
