"""Audio decode stack: VQModel1d, MelGAN vocoder, LPAPS.

Converter parity tests hand-build tiny torch modules that replicate the
*official* MelGAN/VGGish layer definitions (the strategy
tests/test_llm_models.py uses vs transformers) — reference
vae/modules/vocoder.py, lpaps.py, audio_vqvae.py:172-230."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instructany2pix_tpu.codecs import audio as A
from instructany2pix_tpu.codecs.processors import AudioVAEProcessor


class TestVQ1D:
    def test_roundtrip_shapes_and_indices(self):
        cfg = A.VQ1DConfig.tiny()
        params = A.vq1d_init(jax.random.key(0), cfg)
        mel = jax.random.normal(jax.random.key(1), (2, 32, cfg.in_channels))
        codec = A.VQ1DCodec(params, cfg)
        zq, idx, t = codec.encode_seq(mel)
        assert zq.shape == (2, 16, cfg.embed_dim)  # one 2x downsample
        assert idx.shape == (2, 16) and idx.dtype in (jnp.int32, jnp.int64)
        rec = codec.decode_seq(zq)
        assert rec.shape == mel.shape
        # decode from integer codes == decode from quantized vectors
        rec2 = codec.decode_seq(idx)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(rec2), atol=1e-5)

    def test_losses_and_grads(self):
        cfg = A.VQ1DConfig.tiny()
        params = A.vq1d_init(jax.random.key(0), cfg)
        mel = jax.random.normal(jax.random.key(1), (1, 16, cfg.in_channels))
        loss, aux = A.vq1d_losses(params, mel, cfg)
        assert np.isfinite(float(loss))
        g = jax.grad(lambda p: A.vq1d_losses(p, mel, cfg)[0])(params)
        # straight-through: encoder AND codebook both receive gradient
        enc_g = max(float(jnp.max(jnp.abs(x))) for x in jax.tree.leaves(g["encoder"]))
        cb_g = float(jnp.max(jnp.abs(g["codebook"]["w"])))
        assert enc_g > 0 and cb_g > 0


def _build_torch_melgan(cfg):
    """Official MelGAN Generator layout (mirrors reference
    vocoder.py:90-132, built from the public architecture definition)."""
    import torch
    import torch.nn as nn
    from torch.nn.utils import weight_norm

    class ResnetBlock(nn.Module):
        def __init__(self, dim, dilation):
            super().__init__()
            self.block = nn.Sequential(
                nn.LeakyReLU(0.2),
                nn.ReflectionPad1d(dilation),
                weight_norm(nn.Conv1d(dim, dim, 3, dilation=dilation)),
                nn.LeakyReLU(0.2),
                weight_norm(nn.Conv1d(dim, dim, 1)),
            )
            self.shortcut = weight_norm(nn.Conv1d(dim, dim, 1))

        def forward(self, x):
            return self.shortcut(x) + self.block(x)

    ratios = list(cfg.ratios)
    mult = int(2 ** len(ratios))
    model = [
        nn.ReflectionPad1d(3),
        weight_norm(nn.Conv1d(cfg.n_mel_channels, mult * cfg.ngf, 7, padding=0)),
    ]
    for r in ratios:
        model += [
            nn.LeakyReLU(0.2),
            weight_norm(nn.ConvTranspose1d(
                mult * cfg.ngf, mult * cfg.ngf // 2, r * 2, stride=r,
                padding=r // 2 + r % 2, output_padding=r % 2,
            )),
        ]
        for j in range(cfg.n_residual_layers):
            model += [ResnetBlock(mult * cfg.ngf // 2, dilation=3**j)]
        mult //= 2
    model += [
        nn.LeakyReLU(0.2),
        nn.ReflectionPad1d(3),
        weight_norm(nn.Conv1d(cfg.ngf, 1, 7, padding=0)),
        nn.Tanh(),
    ]

    class G(nn.Module):
        def __init__(self):
            super().__init__()
            self.model = nn.Sequential(*model)

        def forward(self, x):
            return self.model(x)

    g = G()
    torch.manual_seed(0)
    for p in g.parameters():
        p.data.normal_(0, 0.05)
    return g


class TestVocoder:
    def test_output_length(self):
        cfg = A.VocoderConfig.tiny()
        params = A.vocoder_init(jax.random.key(0), cfg)
        mel = jax.random.normal(jax.random.key(1), (2, 12, cfg.n_mel_channels))
        wav = A.vocoder_apply(params, mel, cfg)
        assert wav.shape == (2, 12 * cfg.hop_length)
        assert np.isfinite(np.asarray(wav)).all()
        assert float(jnp.max(jnp.abs(wav))) <= 1.0  # tanh range

    def test_torch_converter_parity(self):
        torch = pytest.importorskip("torch")
        cfg = A.VocoderConfig.tiny()
        g = _build_torch_melgan(cfg)
        sd = {k: v.detach().numpy() for k, v in g.state_dict().items()}
        params = A.convert_vocoder_from_torch(sd, cfg)
        mel = np.random.RandomState(0).randn(2, 10, cfg.n_mel_channels).astype(np.float32)
        with torch.no_grad():
            ref = g(torch.from_numpy(mel.transpose(0, 2, 1)))[:, 0].numpy()
        got = np.asarray(A.vocoder_apply(params, jnp.asarray(mel), cfg))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

    def test_torch_converter_parity_full_ratios(self):
        torch = pytest.importorskip("torch")
        # odd ratio exercises the output_padding branch (r % 2 == 1)
        cfg = A.VocoderConfig(n_mel_channels=6, ngf=2, n_residual_layers=2,
                              ratios=(3, 2))
        g = _build_torch_melgan(cfg)
        sd = {k: v.detach().numpy() for k, v in g.state_dict().items()}
        params = A.convert_vocoder_from_torch(sd, cfg)
        mel = np.random.RandomState(1).randn(1, 9, 6).astype(np.float32)
        with torch.no_grad():
            ref = g(torch.from_numpy(mel.transpose(0, 2, 1)))[:, 0].numpy()
        got = np.asarray(A.vocoder_apply(params, jnp.asarray(mel), cfg))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


class TestLPAPS:
    def test_zero_for_identical_positive_for_different(self):
        cfg = A.LPAPSConfig.tiny()
        params = A.lpaps_init(jax.random.key(0), cfg)
        x = jax.random.normal(jax.random.key(1), (2, 16, 24))
        y = jax.random.normal(jax.random.key(2), (2, 16, 24))
        same = A.lpaps_loss(params, x, x, cfg)
        diff = A.lpaps_loss(params, x, y, cfg)
        np.testing.assert_allclose(np.asarray(same), 0.0, atol=1e-6)
        assert (np.asarray(diff) > 0).all()

    def test_torch_feature_parity(self):
        """VGGishish feature extractor matches a torch conv/relu/maxpool
        stack built from the official VGG recipe."""
        torch = pytest.importorskip("torch")
        import torch.nn as nn

        cfg = A.LPAPSConfig.tiny()
        layers, cin = [], 1
        for v in cfg.conv_layers:
            if v == "MP":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(cin, int(v), 3, padding=1), nn.ReLU()]
                cin = int(v)
        net = nn.Sequential(*layers)
        torch.manual_seed(0)
        for p in net.parameters():
            p.data.normal_(0, 0.1)
        # synthesize an LPAPS-layout state dict and convert
        sd = {}
        fi = 0
        for v in cfg.conv_layers:
            if v == "MP":
                fi += 1
                continue
            # net indices match the features.* numbering exactly
            sd[f"net.features.{fi}.weight"] = net[fi].weight.detach().numpy()
            sd[f"net.features.{fi}.bias"] = net[fi].bias.detach().numpy()
            fi += 2
        for k, c in enumerate(cfg.chns):
            sd[f"lin{k}.model.1.weight"] = np.abs(
                np.random.RandomState(k).randn(1, c, 1, 1)
            ).astype(np.float32)
        sd["scaling_layer.shift"] = np.random.RandomState(7).randn(16).astype(np.float32)
        sd["scaling_layer.scale"] = (
            1 + 0.1 * np.abs(np.random.RandomState(8).randn(16))
        ).astype(np.float32)
        params = A.convert_lpaps_from_torch(sd, cfg)

        x = np.random.RandomState(3).randn(1, 16, 24).astype(np.float32)
        feats_j = A._vggish_features(
            params,
            (jnp.asarray(x) - params["shift"].reshape(1, -1, 1))
            / params["scale"].reshape(1, -1, 1),
            cfg,
        )
        with torch.no_grad():
            xt = (torch.from_numpy(x) - torch.from_numpy(sd["scaling_layer.shift"]).view(1, -1, 1)) / \
                torch.from_numpy(sd["scaling_layer.scale"]).view(1, -1, 1)
            h = xt.unsqueeze(1)
            taps, last = [], None
            for m in net:
                if isinstance(m, nn.MaxPool2d):
                    taps.append(last)
                h = m(h)
                if isinstance(m, nn.ReLU):
                    last = h
            taps.append(last)
        for fj, ft in zip(feats_j, taps):
            np.testing.assert_allclose(
                np.asarray(fj), ft.permute(0, 2, 3, 1).numpy(), atol=1e-4, rtol=1e-4
            )


class TestEndToEndAudio:
    def test_wav_mel_vq_mel_wav_roundtrip(self):
        """The decode_seq capability chain the reference gets from
        VQModel1d + load_vocoder: waveform → log-mel → VQ codes → mel →
        waveform."""
        proc = AudioVAEProcessor(sample_rate=4000, n_mels=8, duration=0.5)
        rs = np.random.RandomState(0)
        wav = rs.randn(2000).astype(np.float32) * 0.1
        mel = proc(wav)  # (8, frames)
        assert mel.shape[0] == 8 and mel.min() >= -1.0 and mel.max() <= 1.0

        cfg = A.VQ1DConfig.tiny()
        params = A.vq1d_init(jax.random.key(0), cfg)
        codec = A.VQ1DCodec(params, cfg)
        t = (mel.shape[1] // 2) * 2  # even frame count for the 2x stride
        zq, idx, _ = codec.encode_seq(jnp.asarray(mel.T[None, :t]))
        mel_rec = codec.decode_seq(idx)
        assert mel_rec.shape == (1, t, 8)

        voc = A.VocoderConfig.tiny()
        vparams = A.vocoder_init(jax.random.key(1), voc)
        wav_out = A.vocoder_apply(vparams, mel_rec, voc)
        assert wav_out.shape == (1, t * voc.hop_length)
        assert np.isfinite(np.asarray(wav_out)).all()
