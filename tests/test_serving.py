"""Batched serving: scheduler microbatching + sharded batched denoise."""

import time

import jax
import numpy as np
import pytest

from instructany2pix_tpu import serving
from instructany2pix_tpu.core.mesh import make_mesh
from instructany2pix_tpu.models import unet as unet_lib


def _req(cfg, steps=2, seed=0):
    rs = np.random.RandomState(seed)
    return serving.EditRequest(
        latents=rs.randn(16, 16, 4).astype(np.float32),
        ctx=rs.randn(5, cfg.cross_attention_dim).astype(np.float32),
        ctx_uncond=np.zeros((5, cfg.cross_attention_dim), np.float32),
        pooled=rs.randn(cfg.pooled_dim).astype(np.float32),
        pooled_uncond=np.zeros((cfg.pooled_dim,), np.float32),
        ip_tokens=rs.randn(4, cfg.cross_attention_dim).astype(np.float32),
        num_inference_steps=steps,
    )


def test_scheduler_batches_compatible_requests():
    calls = []

    def run_batch(reqs):
        calls.append(len(reqs))
        return [r.latents for r in reqs]

    sched = serving.BatchScheduler(run_batch, max_batch=4, max_wait_s=0.2).start()
    try:
        futs = [sched.submit(_d()) for _d in [lambda: _dummy()] * 3]
        outs = [f.result(timeout=10) for f in futs]
        assert len(outs) == 3
        assert max(calls) > 1  # batched at least once
    finally:
        sched.stop()


def _dummy():
    return serving.EditRequest(
        latents=np.zeros((4, 4, 4), np.float32),
        ctx=np.zeros((3, 8), np.float32),
        ctx_uncond=np.zeros((3, 8), np.float32),
        pooled=np.zeros((8,), np.float32),
        pooled_uncond=np.zeros((8,), np.float32),
    )


def test_batched_denoiser_on_mesh(rng, mesh8):
    cfg = unet_lib.UNetConfig.tiny(with_ip=True)
    params = unet_lib.init(rng, cfg)
    den = serving.BatchedDenoiser(params, cfg, mesh=mesh8)
    reqs = [_req(cfg, seed=i) for i in range(3)]  # pads to 4 (data axis)
    outs = den.run_batch(reqs)
    assert len(outs) == 3
    for o in outs:
        assert o.shape == (16, 16, 4)
        assert np.all(np.isfinite(o))
    # distinct requests produce distinct outputs
    assert np.abs(outs[0] - outs[1]).max() > 1e-4


def test_end_to_end_scheduler_with_denoiser(rng, mesh8):
    cfg = unet_lib.UNetConfig.tiny(with_ip=True)
    params = unet_lib.init(rng, cfg)
    den = serving.BatchedDenoiser(params, cfg, mesh=mesh8)
    sched = serving.BatchScheduler(den.run_batch, max_batch=4, max_wait_s=0.25).start()
    try:
        futs = [sched.submit(_req(cfg, seed=i)) for i in range(4)]
        outs = [f.result(timeout=180) for f in futs]
        assert all(o.shape == (16, 16, 4) for o in outs)
    finally:
        sched.stop()
