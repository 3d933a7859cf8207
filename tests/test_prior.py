"""Diffusion prior: sequence assembly, CFG semantics, training loss."""

import jax
import jax.numpy as jnp
import numpy as np

from instructany2pix_tpu.diffusion.schedulers import Schedule, SchedulerConfig
from instructany2pix_tpu.prior import model as prior


def _cond(cfg, b=1, with_noisy=False):
    rs = np.random.RandomState(0)
    cond = {
        "src_type": jnp.full((b, 1), prior.MODALITY.VIDEO, jnp.int32),
        "imagebind": jnp.asarray(rs.randn(b, 1, cfg.imagebind_dim), jnp.float32),
        "crossattn_clip": (
            jnp.asarray(rs.randn(b, cfg.text_len, cfg.text_dim), jnp.float32),
            jnp.ones((b, cfg.text_len), jnp.float32),
        ),
        "score": jnp.asarray(rs.randn(b, 1, cfg.score_dim), jnp.float32),
    }
    if with_noisy:
        cond["noisy_inputs"] = jnp.asarray(
            rs.randn(b, 1, cfg.embed_dim), jnp.float32
        )
    return cond


def test_assemble_sequence_length_and_order(rng):
    cfg = prior.PriorConfig.tiny()
    params = prior.init(rng, cfg)
    emb, mask = prior.assemble_sequence(params, cfg, _cond(cfg))
    # src_type(1) + sos/ib/eos(3) + sos/text(7)/eos(9) + sos/score/eos(3)
    assert emb.shape == (1, 1 + 3 + 9 + 3, cfg.embed_dim)
    assert mask.shape == (1, 16)
    emb2, _ = prior.assemble_sequence(params, cfg, _cond(cfg, with_noisy=True))
    assert emb2.shape[1] == 16 + 3
    # prompt prefix identical when noisy tokens appended at the end
    np.testing.assert_allclose(np.asarray(emb), np.asarray(emb2[:, :16]))
    # src_type token is the modality embedding row
    np.testing.assert_allclose(
        np.asarray(emb[0, 0]),
        np.asarray(params["modality_embedding"]["w"][prior.MODALITY.VIDEO]),
    )


def test_no_diffusion_equals_eps_transform_chain(rng):
    """The closed-form x0 CFG must equal the reference's chain:
    sample-pred → get_eps at t=0 → CFG in ε space → DDPM step
    (reference prior/model.py:608-655 with num_inference_steps=1)."""
    cfg = prior.PriorConfig.tiny()
    params = prior.init(rng, cfg)
    b, g = 1, 10.0
    src = jnp.asarray(np.random.RandomState(1).randn(b, cfg.imagebind_dim), jnp.float32)
    th = jnp.asarray(np.random.RandomState(2).randn(b, cfg.text_len, cfg.text_dim), jnp.float32)
    tm = jnp.ones((b, cfg.text_len), jnp.float32)

    out = prior.generate_diffusion(
        params, cfg, prior.MODALITY.VIDEO, prior.MODALITY.IMAGE, src, th, tm,
        guidance_scale=g, score=6.5, no_diffusion=True,
    )

    # manual chain
    sched = Schedule.create(SchedulerConfig())
    score_emb = jnp.tile(prior.score_embedding(6.5, cfg.score_dim), (b, 1, 1))
    neg_emb = jnp.tile(prior.score_embedding(2.0, cfg.score_dim), (b, 1, 1))
    cond_c = {
        "src_type": jnp.full((b, 1), prior.MODALITY.VIDEO, jnp.int32),
        "imagebind": src.reshape(b, 1, -1),
        "crossattn_clip": (th, tm),
        "score": score_emb,
    }
    cond_u = dict(cond_c, imagebind=jnp.zeros_like(src).reshape(b, 1, -1), score=neg_emb)
    ec, mc = prior.assemble_sequence(params, cfg, cond_c)
    eu, mu = prior.assemble_sequence(params, cfg, cond_u)
    x0_c = prior._ar_decode(params, cfg, ec, mc, 1)
    x0_u = prior._ar_decode(params, cfg, eu, mu, 1)
    xt = jax.random.normal(jax.random.key(9), x0_c.shape)
    t = jnp.zeros((b,), jnp.int32)
    # sample-pred → ε (reference get_eps formula, NOT schedule.to_epsilon
    # which is a no-op under the default epsilon prediction type)
    a = sched.alpha_bar(t).reshape(-1, 1, 1)
    eps_c = (xt - jnp.sqrt(a) * x0_c) / jnp.sqrt(1 - a)
    eps_u = (xt - jnp.sqrt(a) * x0_u) / jnp.sqrt(1 - a)
    eps_mix = eps_u + g * (eps_c - eps_u)
    # DDPM step at t=0 with a_bar_prev=1 reduces to the x0 estimate
    x0_mix = (xt - jnp.sqrt(1 - a) * eps_mix) / jnp.sqrt(a)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0_mix), atol=1e-4, rtol=1e-4)


def test_generate_diffusion_multistep_runs(rng):
    cfg = prior.PriorConfig.tiny()
    params = prior.init(rng, cfg)
    src = jnp.ones((1, cfg.imagebind_dim))
    th = jnp.zeros((1, cfg.text_len, cfg.text_dim))
    tm = jnp.ones((1, cfg.text_len))
    out = prior.generate_diffusion(
        params, cfg, prior.MODALITY.VIDEO, prior.MODALITY.IMAGE, src, th, tm,
        key=jax.random.key(0), num_inference_steps=4, no_diffusion=False,
    )
    assert out.shape == (1, 1, cfg.output_dim)
    assert np.all(np.isfinite(np.asarray(out)))


def test_train_forward_loss_and_grads(rng):
    cfg = prior.PriorConfig.tiny()
    params = prior.init(rng, cfg)
    cond = _cond(cfg, b=2)
    target = jnp.asarray(np.random.RandomState(3).randn(2, 1, cfg.embed_dim), jnp.float32)

    def loss_fn(p):
        return prior.train_forward(p, cfg, cond, target, jax.random.key(0))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gmax = max(float(jnp.abs(g).max()) for g in jax.tree.leaves(grads["gpt2"]))
    assert gmax > 0


def test_prior_training_aux(rng):
    """Optimizer schedule (warmup → StepLR decay) and target masking
    parity helpers (reference prior/model.py:262-270, 383-420)."""
    import jax
    import jax.numpy as jnp

    from instructany2pix_tpu.prior import model as prior

    tx = prior.make_optimizer(1e-3, warmup_steps=10, steps_per_epoch=10,
                              step_size_epochs=2, gamma=0.5)
    p = {"w": jnp.ones((4, 4))}
    state = tx.init(p)
    g = {"w": jnp.ones((4, 4))}
    # warmup: first update is tiny relative to post-warmup
    up1, state = tx.update(g, state, p)
    for _ in range(30):
        up, state = tx.update(g, state, p)
    assert float(jnp.abs(up1["w"]).mean()) < float(jnp.abs(up["w"]).mean()) * 10

    tgt = jax.random.normal(jax.random.key(1), (2, 8, 4))
    am = jnp.ones((2, 8))
    masked, am2, keep = prior.mask_target_sequence(
        tgt, am, jax.random.key(2), mask_ratio=0.5
    )
    assert keep is not None and bool((~keep).sum() > 0)
    assert float(am2.sum()) < float(am.sum())
    # zeroed where dropped
    import numpy as np
    np.testing.assert_array_equal(
        np.asarray(masked)[~np.asarray(keep)], 0.0
    )
    # below threshold: no-op
    a, b, k = prior.mask_target_sequence(tgt, am, jax.random.key(3), 0.0)
    assert k is None
    assert prior.param_count(p) == 16
