"""IP-Adapter projection semantics + denoise/inversion scans on tiny UNet."""

import jax
import jax.numpy as jnp
import numpy as np

from instructany2pix_tpu.diffusion import img2img as i2i
from instructany2pix_tpu.diffusion import ip_adapter as ipa
from instructany2pix_tpu.diffusion import sampler as S
from instructany2pix_tpu.diffusion.schedulers import Schedule, SchedulerConfig
from instructany2pix_tpu.models import unet as unet_lib


class TestImageProj:
    def test_mode_selection_and_token_count(self, rng):
        cfg = ipa.ImageProjConfig.tiny()
        params = ipa.init(rng, cfg)
        emb = jax.random.normal(jax.random.key(1), (2, 2, cfg.clip_embeddings_dim))
        for mode, n in [("global", 4), ("local", 4), ("both", 8)]:
            out = ipa.apply(params, emb, cfg, mode=mode)
            assert out.shape == (2, n, cfg.cross_attention_dim)

    def test_local_blend_scale(self, rng):
        """scales[1]=0 → local tokens collapse onto global (before the
        per-view raw_embed), reference ip_adapter.py:49."""
        cfg = ipa.ImageProjConfig.tiny()
        params = ipa.init(rng, cfg)
        # raw_embed zero-init → global/local differ only via blending
        emb = jax.random.normal(jax.random.key(1), (1, 2, cfg.clip_embeddings_dim))
        both0 = ipa.apply(params, emb, cfg, mode="both", scales=(1.0, 0.0))
        g, l = both0[:, :4], both0[:, 4:]
        np.testing.assert_allclose(np.asarray(g), np.asarray(l), atol=1e-5)
        both1 = ipa.apply(params, emb, cfg, mode="both", scales=(1.0, 1.0))
        assert float(jnp.abs(both1[:, 4:] - both1[:, :4]).max()) > 1e-3

    def test_get_image_embeds_zero_fill_and_uncond(self, rng):
        cfg = ipa.ImageProjConfig.tiny()
        params = ipa.init(rng, cfg)
        g = jax.random.normal(jax.random.key(1), (1, cfg.clip_embeddings_dim))
        cond, uncond = ipa.get_image_embeds(params, cfg, clip_image_embeds=g)
        zero_cond, zero_uncond = ipa.get_image_embeds(
            params, cfg, clip_image_embeds=jnp.zeros_like(g)
        )
        np.testing.assert_allclose(np.asarray(uncond), np.asarray(zero_cond), atol=1e-6)
        assert float(jnp.abs(cond - uncond).max()) > 1e-4


def _tiny_stack(rng, with_ip=False, in_ch=4):
    cfg = unet_lib.UNetConfig.tiny(with_ip=with_ip, in_channels=in_ch)
    params = unet_lib.init(rng, cfg)
    sched = Schedule.create(SchedulerConfig())
    b = 1
    ctx = jax.random.normal(jax.random.key(2), (b, 5, cfg.cross_attention_dim)) * 0.1
    ctx_u = jnp.zeros_like(ctx)
    pooled = jax.random.normal(jax.random.key(3), (b, cfg.pooled_dim)) * 0.1
    tid = S.default_time_ids(128, 128, b)
    return cfg, params, sched, ctx, ctx_u, pooled, tid


class TestImageEncoderPath:
    def test_raw_image_through_clip_encoder(self, rng):
        """`get_image_embeds(image=...)` runs the CLIP image encoder —
        the reference's pil_image path (ip_adapter.py:171-209)."""
        import dataclasses

        from instructany2pix_tpu.models import clip as clip_lib

        vcfg = dataclasses.replace(
            clip_lib.CLIPVisionConfig.tiny(), image_size=28, patch_size=14,
            projection_dim=16,
        )
        vparams = clip_lib.vision_init(jax.random.key(0), vcfg)
        cfg = ipa.ImageProjConfig.tiny(clip_embeddings_dim=16)
        params = ipa.init(jax.random.key(1), cfg)
        img = (np.random.RandomState(0).rand(40, 36, 3) * 255).astype(np.uint8)
        cond, uncond = ipa.get_image_embeds(
            params, cfg, image=img, image_encoder=(vparams, vcfg), mode="global"
        )
        assert cond.shape == (1, cfg.num_tokens, cfg.cross_attention_dim)
        # identical to precomputing the embedding by hand
        emb = ipa.encode_clip_image(vparams, vcfg, img)
        cond2, _ = ipa.get_image_embeds(
            params, cfg, clip_image_embeds=emb, mode="global"
        )
        np.testing.assert_allclose(np.asarray(cond), np.asarray(cond2), atol=1e-6)
        assert not np.allclose(np.asarray(cond), np.asarray(uncond))

    def test_preprocess_matches_transformers_clip_processor(self):
        """Pixel preprocessing matches transformers' CLIPImageProcessor
        (available offline) on a random image."""
        import pytest

        tr = pytest.importorskip("transformers")
        from PIL import Image

        proc = tr.CLIPImageProcessor(
            size={"shortest_edge": 28}, crop_size={"height": 28, "width": 28},
            image_mean=list(ipa.CLIP_IMAGE_MEAN), image_std=list(ipa.CLIP_IMAGE_STD),
        )
        img = (np.random.RandomState(1).rand(28, 28, 3) * 255).astype(np.uint8)
        ref = proc(images=Image.fromarray(img), return_tensors="np").pixel_values
        got = np.asarray(ipa.preprocess_clip_image(img, 28))
        # same-size input skips resampling → exact normalize parity
        np.testing.assert_allclose(got, ref.transpose(0, 2, 3, 1), atol=1e-5)


def test_denoise_runs_and_ip_window(rng):
    cfg, params, sched, ctx, ctx_u, pooled, tid = _tiny_stack(rng, with_ip=True)
    lat = jax.random.normal(jax.random.key(5), (1, 16, 16, 4))
    ip = jax.random.normal(jax.random.key(6), (1, 4, cfg.cross_attention_dim))
    out = S.denoise(
        params, cfg, sched, lat, ctx, ctx_u, pooled, jnp.zeros_like(pooled), tid,
        num_inference_steps=3, guidance_scale=5.0, ip_tokens=ip, ip_scale=1.0,
    )
    assert out.shape == lat.shape and np.all(np.isfinite(np.asarray(out)))
    # zero-width ip window == no ip tokens at all
    out_nowin = S.denoise(
        params, cfg, sched, lat, ctx, ctx_u, pooled, jnp.zeros_like(pooled), tid,
        num_inference_steps=3, guidance_scale=5.0, ip_tokens=ip, ip_scale=1.0,
        ip_window=(0.0, 0.0),
    )
    out_noip = S.denoise(
        params, cfg, sched, lat, ctx, ctx_u, pooled, jnp.zeros_like(pooled), tid,
        num_inference_steps=3, guidance_scale=5.0,
    )
    np.testing.assert_allclose(
        np.asarray(out_nowin), np.asarray(out_noip), atol=1e-5
    )


def test_inversion_denoise_roundtrip_exact_for_constant_eps(rng):
    """With an x-independent ε model, reverse-DDIM is the *exact*
    inverse of the DDIM denoise scan — pins the timestep pairing and
    alpha indexing of both scans (a random-weight UNet cannot test
    this: ε self-consistency between passes doesn't hold)."""
    sched = Schedule.create(SchedulerConfig())
    x0 = jax.random.normal(jax.random.key(5), (1, 8, 8, 4)) * 0.3
    c = jax.random.normal(jax.random.key(6), x0.shape) * 0.5

    def eps_fn(lat, t, i):
        return c  # constant ε field

    ts = sched.timesteps(10)
    inv = S.scan_invert(eps_fn, sched, x0, ts[::-1])
    assert float(jnp.abs(inv - x0).max()) > 1e-2  # actually moved to noise
    back = S.scan_denoise(eps_fn, sched, inv, ts)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x0), atol=1e-4, rtol=1e-4)


def test_ddim_invert_unet_smoke(rng):
    cfg, params, sched, ctx, _, pooled, tid = _tiny_stack(rng)
    x0 = jax.random.normal(jax.random.key(5), (1, 16, 16, 4)) * 0.3
    inv = S.ddim_invert(params, cfg, sched, x0, ctx, pooled, tid, num_inference_steps=4)
    assert inv.shape == x0.shape and np.all(np.isfinite(np.asarray(inv)))


def test_img2img_strength_zero_is_identity(rng):
    cfg, params, sched, ctx, ctx_u, pooled, tid = _tiny_stack(rng)
    lat = jax.random.normal(jax.random.key(5), (1, 16, 16, 4))
    out = i2i.img2img(
        params, cfg, sched, lat, jax.random.key(1), ctx, ctx_u, pooled,
        jnp.zeros_like(pooled), tid, num_inference_steps=4, strength=0.0,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(lat))
    out2 = i2i.img2img(
        params, cfg, sched, lat, jax.random.key(1), ctx, ctx_u, pooled,
        jnp.zeros_like(pooled), tid, num_inference_steps=4, strength=0.5,
    )
    assert float(jnp.abs(out2 - lat).max()) > 1e-3


def test_inpaint_runs(rng):
    cfg, params, sched, ctx, ctx_u, pooled, tid = _tiny_stack(rng, in_ch=9)
    lat = jax.random.normal(jax.random.key(5), (1, 16, 16, 4))
    mask = jnp.zeros((1, 128, 128, 1)).at[:, 32:96, 32:96].set(1.0)
    out = i2i.inpaint(
        params, cfg, sched, lat, mask, lat * 0.5, jax.random.key(1),
        ctx, ctx_u, pooled, jnp.zeros_like(pooled), tid,
        num_inference_steps=4, strength=0.7,
    )
    assert out.shape == lat.shape and np.all(np.isfinite(np.asarray(out)))


def test_polar_interpolate_and_mix(rng):
    x = jax.random.normal(rng, (1, 4, 4, 4)) * 5.0
    y = jax.random.normal(jax.random.key(1), (1, 4, 4, 4))
    out = S.polar_interpolate(x, y, 0.7)
    nx = float(jnp.linalg.norm(x)); ny = float(jnp.linalg.norm(y))
    assert abs(float(jnp.linalg.norm(out)) - (0.7 * nx + 0.3 * ny)) < 1e-3
    # alpha=1 keeps x exactly (direction and norm)
    np.testing.assert_allclose(
        np.asarray(S.polar_interpolate(x, y, 1.0)), np.asarray(x), rtol=1e-5, atol=1e-5
    )

    la = S.mix_latents(
        jnp.ones((1, 8)), jnp.ones((1, 8)) * 2, jnp.ones((1, 8)) * 0.1, (0.0, 0.4, 1.0), 20.0
    )
    assert abs(float(jnp.linalg.norm(la, axis=-1)[0]) - 20.0) < 1e-4


def test_pnp_share_qk_and_denoise(rng):
    """Plug-and-play structural injection: `pnp_share_qk` makes every
    row's up-block self-attention use row 0's Q/K (exactness checked by
    duplicating rows), and `pnp_denoise` runs the 3-row scan end to end
    (the reference's SDXLPNPPipeline is a stub — this is the working
    counterpart)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instructany2pix_tpu.diffusion import pnp
    from instructany2pix_tpu.diffusion.schedulers import Schedule, SchedulerConfig
    from instructany2pix_tpu.models import unet as unet_lib

    cfg = unet_lib.UNetConfig.tiny()
    params = unet_lib.init(rng, cfg)
    lat = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(2), (2, 7, cfg.cross_attention_dim))
    pooled = jax.random.normal(jax.random.key(3), (2, cfg.pooled_dim))
    tid = jnp.ones((2, 6))
    t = jnp.zeros((2,), jnp.int32)
    kw = dict(pooled_text=pooled, time_ids=tid)

    # identical rows → sharing row-0 Q/K is a no-op (exactness)
    lat_same = jnp.tile(lat[:1], (2, 1, 1, 1))
    ctx_same = jnp.tile(ctx[:1], (2, 1, 1))
    kw_same = dict(pooled_text=jnp.tile(pooled[:1], (2, 1)), time_ids=tid)
    a = unet_lib.apply(params, lat_same, t, ctx_same, cfg, **kw_same)
    b = unet_lib.apply(params, lat_same, t, ctx_same, cfg, pnp_share_qk=True,
                       **kw_same)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)

    # different rows → row 1 changes when structure-injected
    c = unet_lib.apply(params, lat, t, ctx, cfg, **kw)
    d = unet_lib.apply(params, lat, t, ctx, cfg, pnp_share_qk=True, **kw)
    assert not np.allclose(np.asarray(c[1]), np.asarray(d[1]))
    # ...but row 0 (the source) is untouched by the sharing
    np.testing.assert_allclose(np.asarray(c[0]), np.asarray(d[0]), atol=1e-5,
                               rtol=1e-5)

    sched = Schedule.create(SchedulerConfig())
    out = pnp.pnp_denoise(
        params, cfg, sched, lat[:1], ctx[1:2], ctx[0:1], ctx[0:1],
        pooled[1:2], pooled[0:1], pooled[0:1], tid[:1],
        num_inference_steps=3, guidance_scale=4.0, injection_ratio=0.7,
    )
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_inpaint_4ch_blend_matches_manual_loop(rng):
    """Base-UNet (4-channel) inpainting — the reference's LIVE path
    (its inpaint pipeline shares the base UNet, reference
    pipeline.py:132-139). Parity vs a direct transcription of the
    diffusers num_channels_unet==4 algorithm: after every scheduler
    step, keep region ← source latents noised to the NEXT timestep."""
    cfg, params, sched, ctx, ctx_u, pooled, tid = _tiny_stack(rng, in_ch=4)
    src = jax.random.normal(jax.random.key(5), (1, 16, 16, 4))
    mask = jnp.zeros((1, 128, 128, 1)).at[:, 32:96, 32:96].set(1.0)
    key = jax.random.key(1)
    steps, strength = 4, 0.75
    out = i2i.inpaint(
        params, cfg, sched, src, mask, src * 0.5, key,
        ctx, ctx_u, pooled, jnp.zeros_like(pooled), tid,
        num_inference_steps=steps, strength=strength, guidance_scale=7.5,
    )

    # --- independent manual loop (diffusers algorithm transcription)
    from instructany2pix_tpu.diffusion.img2img import img2img_timesteps
    from instructany2pix_tpu.diffusion.img2img import row_normal
    from instructany2pix_tpu.diffusion.sampler import make_cfg_eps_fn

    ts, _ = img2img_timesteps(sched, steps, strength)
    noise = row_normal(key, src.shape)
    lat = sched.add_noise(src, noise, jnp.full((1,), ts[0]))
    mask_lat = jax.image.resize(mask, (1, 16, 16, 1), "nearest")
    eps_fn = make_cfg_eps_fn(
        params, cfg, ctx, ctx_u, pooled, jnp.zeros_like(pooled), tid, 7.5
    )
    for i, t in enumerate(list(np.asarray(ts))):
        t_prev = int(np.asarray(ts)[i + 1]) if i + 1 < len(ts) else -1
        eps = eps_fn(lat, jnp.asarray(t), i)
        lat = sched.ddim_step(
            eps.astype(jnp.float32), jnp.full((1,), t), jnp.full((1,), t_prev),
            lat.astype(jnp.float32),
        )
        proper = (
            sched.add_noise(src, noise, jnp.full((1,), t_prev))
            if t_prev >= 0 else src
        )
        lat = (1 - mask_lat) * proper + mask_lat * lat
    np.testing.assert_allclose(np.asarray(out), np.asarray(lat), atol=2e-4, rtol=1e-3)
    # keep region equals the source exactly at the end
    keep = np.asarray((1 - mask_lat) * (out - src))
    np.testing.assert_allclose(keep, 0.0, atol=1e-5)
