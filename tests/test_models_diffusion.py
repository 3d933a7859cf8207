"""Scheduler math + VAE/UNet structure tests on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instructany2pix_tpu.diffusion.schedulers import (
    Schedule,
    SchedulerConfig,
    cfg_combine,
)
from instructany2pix_tpu.models import unet as unet_lib
from instructany2pix_tpu.models import vae as vae_lib


class TestSchedulers:
    def test_beta_tables_match_diffusers_formula(self):
        s = Schedule.create()
        # scaled_linear: sqrt-space linspace, squared
        betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
        np.testing.assert_allclose(np.asarray(s.betas), betas, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(s.alphas_cumprod), np.cumprod(1 - betas), rtol=1e-5
        )

    def test_leading_timesteps(self):
        s = Schedule.create()
        ts = np.asarray(s.timesteps(10))
        # diffusers leading spacing with steps_offset=1
        assert ts[0] == 901 and ts[-1] == 1
        assert np.all(np.diff(ts) == -100)

    def test_add_noise_roundtrip_epsilon(self, rng):
        s = Schedule.create()
        x0 = jax.random.normal(rng, (2, 8, 8, 4))
        noise = jax.random.normal(jax.random.key(1), x0.shape)
        t = jnp.array([500, 100])
        xt = s.add_noise(x0, noise, t)
        # perfect eps prediction recovers x0
        x0_hat = s.to_x0(noise, xt, t)
        np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-4)

    def test_ddim_step_perfect_model_denoises(self, rng):
        # set_alpha_to_one=True so alpha_bar(-1)=1 and the oracle recovers
        # x0 exactly; with the SDXL default (False) the final step keeps
        # sqrt(1-ac[0])≈0.03 of eps by design.
        s = Schedule.create(SchedulerConfig(set_alpha_to_one=True))
        x0 = jax.random.normal(rng, (1, 4, 4, 4))
        noise = jax.random.normal(jax.random.key(1), x0.shape)
        ts = s.timesteps(50)
        x = s.add_noise(x0, noise, ts[0][None])
        for i in range(50):
            t = ts[i][None]
            t_prev = ts[i + 1][None] if i + 1 < 50 else jnp.array([-1])
            # oracle eps for the current sample
            a = s.alpha_bar(t).reshape(-1, 1, 1, 1)
            eps = (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)
            x = s.ddim_step(eps, t, t_prev, x)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-3)

    def test_ddim_inversion_roundtrip(self, rng):
        """inverse then forward with the same (zero) model output returns
        the input exactly — the core property DDIM inversion relies on
        (reference ddim/pnp_pipeline.py:73-85)."""
        s = Schedule.create()
        x = jax.random.normal(rng, (1, 4, 4, 4))
        eps = jnp.zeros_like(x)
        ts = np.asarray(s.timesteps(10))
        lat = x
        # invert: walk timesteps ascending
        prevs = np.concatenate([[-1], ts[::-1][:-1]])
        for t_prev, t in zip(prevs, ts[::-1]):
            lat = s.ddim_inverse_step(eps, jnp.array([t_prev]), jnp.array([t]), lat)
        # denoise back
        for i, t in enumerate(ts):
            t_prev = ts[i + 1] if i + 1 < len(ts) else -1
            lat = s.ddim_step(eps, jnp.array([t]), jnp.array([t_prev]), lat)
        np.testing.assert_allclose(np.asarray(lat), np.asarray(x), atol=1e-4)

    def test_ddpm_step_t0_is_noiseless(self, rng):
        s = Schedule.create(SchedulerConfig(prediction_type="sample"))
        x0 = jax.random.normal(rng, (1, 6))
        xt = jax.random.normal(jax.random.key(1), (1, 6))
        out = s.ddpm_step(x0, jnp.array([0]), xt, jax.random.key(2))
        assert np.all(np.isfinite(np.asarray(out)))
        out2 = s.ddpm_step(x0, jnp.array([0]), xt, jax.random.key(3))
        # t=0 → no noise added → deterministic
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2))

    def test_cfg_combine(self):
        u, c = jnp.array([1.0]), jnp.array([2.0])
        assert float(cfg_combine(u, c, 10.0)[0]) == pytest.approx(11.0)


class TestVAE:
    def test_encode_decode_shapes(self, rng):
        cfg = vae_lib.VAEConfig.tiny()
        params = vae_lib.init(rng, cfg)
        x = jax.random.normal(jax.random.key(1), (1, 32, 32, 3))
        z = vae_lib.encode(params, x, cfg=cfg, sample=False)
        assert z.shape == (1, 16, 16, 4)  # one stride-2 downsample
        y = vae_lib.decode(params, z, cfg)
        assert y.shape == x.shape
        assert np.all(np.isfinite(np.asarray(y)))

    def test_encode_is_deterministic_without_key(self, rng):
        cfg = vae_lib.VAEConfig.tiny()
        params = vae_lib.init(rng, cfg)
        x = jax.random.normal(jax.random.key(1), (1, 16, 16, 3))
        z1 = vae_lib.encode(params, x, cfg=cfg, sample=False)
        z2 = vae_lib.encode(params, x, cfg=cfg, sample=False)
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z2))


class TestUNet:
    def _cond(self, cfg, b=1):
        key = jax.random.key(7)
        ctx = jax.random.normal(key, (b, 9, cfg.cross_attention_dim))
        pooled = jax.random.normal(jax.random.key(8), (b, cfg.pooled_dim))
        tid = jnp.tile(jnp.array([[512, 512, 0, 0, 512, 512]]), (b, 1))
        return ctx, pooled, tid

    def test_forward_shape_and_finite(self, rng):
        cfg = unet_lib.UNetConfig.tiny()
        params = unet_lib.init(rng, cfg)
        x = jax.random.normal(jax.random.key(1), (1, 16, 16, 4))
        ctx, pooled, tid = self._cond(cfg)
        out = unet_lib.apply(
            params, x, jnp.array([500]), ctx, cfg, pooled_text=pooled, time_ids=tid
        )
        assert out.shape == x.shape
        assert np.all(np.isfinite(np.asarray(out)))

    def test_ip_tokens_change_output_only_when_scaled(self, rng):
        cfg = unet_lib.UNetConfig.tiny(with_ip=True)
        params = unet_lib.init(rng, cfg)
        x = jax.random.normal(jax.random.key(1), (1, 16, 16, 4))
        ctx, pooled, tid = self._cond(cfg)
        ip = jax.random.normal(jax.random.key(9), (1, 4, cfg.cross_attention_dim))

        def run(ip_tokens, scale):
            return unet_lib.apply(
                params,
                x,
                jnp.array([500]),
                ctx,
                cfg,
                pooled_text=pooled,
                time_ids=tid,
                ip_tokens=ip_tokens,
                ip_scale=scale,
            )

        base = run(None, 0.0)
        zero_scale = run(ip, 0.0)
        scaled = run(ip, 1.0)
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(zero_scale), atol=1e-5
        )
        assert float(jnp.abs(scaled - base).max()) > 1e-4

    def test_inpaint_config_9ch(self, rng):
        cfg = unet_lib.UNetConfig.tiny(with_ip=False, in_channels=9)
        params = unet_lib.init(rng, cfg)
        x = jax.random.normal(jax.random.key(1), (1, 16, 16, 9))
        ctx, pooled, tid = self._cond(cfg)
        out = unet_lib.apply(
            params, x, jnp.array([1]), ctx, cfg, pooled_text=pooled, time_ids=tid
        )
        assert out.shape == (1, 16, 16, 4)

    def test_refiner_config_builds(self, rng):
        cfg = unet_lib.UNetConfig(
            block_out_channels=(8, 16, 32, 32),
            down_block_types=(
                "DownBlock2D",
                "CrossAttnDownBlock2D",
                "CrossAttnDownBlock2D",
                "DownBlock2D",
            ),
            layers_per_block=1,
            transformer_layers_per_block=(1, 1, 1, 1),
            num_attention_heads=(1, 2, 4, 4),
            cross_attention_dim=16,
            norm_num_groups=4,
            addition_time_embed_dim=4,
            projection_class_embeddings_input_dim=16 + 6 * 4,
        )
        params = unet_lib.init(rng, cfg)
        x = jax.random.normal(jax.random.key(1), (1, 32, 32, 4))
        ctx, pooled, tid = self._cond(cfg)
        out = unet_lib.apply(
            params, x, jnp.array([10]), ctx, cfg, pooled_text=pooled, time_ids=tid
        )
        assert out.shape == x.shape


class TestLCM:
    def test_lcm_timesteps_and_step(self, rng):
        from instructany2pix_tpu.diffusion import schedulers as S

        s = S.Schedule.create()
        ts = np.asarray(S.lcm_timesteps(s, 4))
        assert len(ts) == 4 and ts[0] > ts[-1]
        x = jax.random.normal(rng, (1, 4, 4, 4))
        eps = jax.random.normal(jax.random.key(1), x.shape)
        out = S.lcm_step(s, eps, jnp.asarray([int(ts[0])]),
                         jnp.asarray([int(ts[1])]), x, key=jax.random.key(2))
        assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
        # final step (t_prev=-1) is deterministic (no noise re-injection)
        a = S.lcm_step(s, eps, jnp.asarray([int(ts[-1])]), jnp.asarray([-1]), x,
                       key=jax.random.key(3))
        b = S.lcm_step(s, eps, jnp.asarray([int(ts[-1])]), jnp.asarray([-1]), x,
                       key=jax.random.key(4))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_ignore_ip_drops_image_prompt_tokens(rng):
    """CNAttnProcessor semantics (reference ip_adapter/
    attention_processor.py:416,481): an auxiliary branch sharing an
    IP-conditioned context must attend over TEXT tokens only. With
    `ignore_ip=True`, IP tokens must have exactly zero effect —
    whether passed live, baked into cross_kv, or (int form)
    concatenated into encoder_hidden_states."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instructany2pix_tpu.models import unet as unet_lib

    cfg = unet_lib.UNetConfig.tiny(with_ip=True)
    params = unet_lib.init(rng, cfg)
    lat = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(2), (2, 7, cfg.cross_attention_dim))
    pooled = jax.random.normal(jax.random.key(3), (2, cfg.pooled_dim))
    tid = jnp.ones((2, 6))
    ip = jax.random.normal(jax.random.key(4), (2, 4, cfg.cross_attention_dim))
    kw = dict(pooled_text=pooled, time_ids=tid, ip_scale=1.0)
    t = jnp.zeros((2,), jnp.int32)

    no_ip = unet_lib.apply(params, lat, t, ctx, cfg, **kw)
    with_ip = unet_lib.apply(params, lat, t, ctx, cfg, ip_tokens=ip, **kw)
    # sanity: IP tokens do change the output when not ignored
    assert float(jnp.abs(with_ip - no_ip).max()) > 1e-4

    # live ip_tokens dropped
    a = unet_lib.apply(params, lat, t, ctx, cfg, ip_tokens=ip,
                       ignore_ip=True, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(no_ip))

    # cross_kv carrying k_ip/v_ip stripped
    ckv = unet_lib.precompute_cross_kv(params, cfg, ctx, ip)
    b = unet_lib.apply(params, lat, t, ctx, cfg, cross_kv=ckv,
                       ignore_ip=True, **kw)
    ckv_noip = unet_lib.precompute_cross_kv(params, cfg, ctx, None)
    ref = unet_lib.apply(params, lat, t, ctx, cfg, cross_kv=ckv_noip, **kw)
    np.testing.assert_array_equal(np.asarray(b), np.asarray(ref))

    # int form: trailing N tokens truncated from a combined [text; ip]
    # context (the reference's concatenated-contract shape)
    extra = jax.random.normal(jax.random.key(5),
                              (2, 4, cfg.cross_attention_dim))
    combined = jnp.concatenate([ctx, extra], axis=1)
    c = unet_lib.apply(params, lat, t, combined, cfg, ignore_ip=4, **kw)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(no_ip))


def test_fuse_qkv_preserves_outputs(rng):
    """fuse_qkv (op-launch optimization) is semantics-preserving."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instructany2pix_tpu.models import unet as unet_lib

    cfg = unet_lib.UNetConfig.tiny(with_ip=True)
    params = unet_lib.init(rng, cfg)
    fused = unet_lib.fuse_qkv(params)
    lat = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(2), (2, 7, cfg.cross_attention_dim))
    pooled = jax.random.normal(jax.random.key(3), (2, cfg.pooled_dim))
    tid = jnp.ones((2, 6))
    ip = jax.random.normal(jax.random.key(4), (2, 4, cfg.cross_attention_dim))
    kw = dict(pooled_text=pooled, time_ids=tid, ip_tokens=ip, ip_scale=0.7)
    a = unet_lib.apply(params, lat, jnp.zeros((2,), jnp.int32), ctx, cfg, **kw)
    b = unet_lib.apply(fused, lat, jnp.zeros((2,), jnp.int32), ctx, cfg, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


def test_precomputed_cross_kv_is_exact(rng):
    """precompute_cross_kv hoists the constant-context projections out
    of the scan; outputs must be bit-identical (same matmuls, same
    operands). Also exercised through the fused-qkv tree."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instructany2pix_tpu.models import unet as unet_lib

    cfg = unet_lib.UNetConfig.tiny(with_ip=True)
    params = unet_lib.init(rng, cfg)
    lat = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(2), (2, 7, cfg.cross_attention_dim))
    pooled = jax.random.normal(jax.random.key(3), (2, cfg.pooled_dim))
    tid = jnp.ones((2, 6))
    ip = jax.random.normal(jax.random.key(4), (2, 4, cfg.cross_attention_dim))
    kw = dict(pooled_text=pooled, time_ids=tid, ip_scale=0.7)
    t = jnp.zeros((2,), jnp.int32)
    a = unet_lib.apply(params, lat, t, ctx, cfg, ip_tokens=ip, **kw)
    ckv = unet_lib.precompute_cross_kv(params, cfg, ctx, ip)
    b = unet_lib.apply(params, lat, t, ctx, cfg, ip_tokens=ip, cross_kv=ckv, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # without IP tokens: kv tree has no ip entries, ip branch fully off
    a2 = unet_lib.apply(params, lat, t, ctx, cfg, **kw)
    ckv2 = unet_lib.precompute_cross_kv(params, cfg, ctx, None)
    b2 = unet_lib.apply(params, lat, t, ctx, cfg, cross_kv=ckv2, **kw)
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2))
    # fused tree carries to_kv; precompute must handle it identically
    fused = unet_lib.fuse_qkv(params)
    ckv3 = unet_lib.precompute_cross_kv(fused, cfg, ctx, ip)
    c = unet_lib.apply(fused, lat, t, ctx, cfg, ip_tokens=ip, cross_kv=ckv3, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-5, rtol=1e-4)


def test_split_geglu_preserves_outputs(rng):
    """split_geglu (TP-time geglu unfuse, models/unet.py) is bit-exact:
    the two half-matmuls read the same weight columns the fused matmul
    does, and the gelu gate sees identical operands."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instructany2pix_tpu.models import unet as unet_lib

    cfg = unet_lib.UNetConfig.tiny(with_ip=True)
    params = unet_lib.init(rng, cfg)
    split = unet_lib.split_geglu(params)
    flat_keys = str(jax.tree_util.tree_structure(split))
    assert "ff_in_a" in flat_keys and "'ff_in'" not in flat_keys
    lat = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(2), (2, 7, cfg.cross_attention_dim))
    pooled = jax.random.normal(jax.random.key(3), (2, cfg.pooled_dim))
    tid = jnp.ones((2, 6))
    ip = jax.random.normal(jax.random.key(4), (2, 4, cfg.cross_attention_dim))
    kw = dict(pooled_text=pooled, time_ids=tid, ip_tokens=ip, ip_scale=0.7)
    a = unet_lib.apply(params, lat, jnp.zeros((2,), jnp.int32), ctx, cfg, **kw)
    b = unet_lib.apply(split, lat, jnp.zeros((2,), jnp.int32), ctx, cfg, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
