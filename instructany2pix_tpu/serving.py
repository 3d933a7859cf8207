"""Batched edit serving over a TPU mesh.

The reference serves one request at a time through a gradio queue on a
single GPU (reference serve.py:115 — queue(max 20), no batching). This
module adds the production path SURVEY.md §7 step 7 calls for:

  * `BatchScheduler` — microbatching request queue (max batch size /
    max wait), thread-safe, futures-based.
  * `BatchedDenoiser` — one jitted CFG-denoise graph per (steps,
    resolution) bucket, batch dimension sharded over the mesh's "data"
    axis and UNet weights sharded by the tensor-parallel rules
    (parallel.sharding.UNET_TP_RULES) so a v5e-8 slice serves batches
    with XLA-inserted collectives.
  * `serve_http` — minimal aiohttp front-end (optional; the gradio UI
    in serve.py remains the interactive path).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .core.mesh import DATA_AXIS, make_mesh
from .diffusion import sampler as sampler_lib
from .diffusion.schedulers import Schedule, SchedulerConfig
from .models import unet as unet_lib
from .parallel import sharding as sh


@dataclasses.dataclass
class EditRequest:
    latents: np.ndarray  # (h, w, 4) initial latents
    ctx: np.ndarray  # (S, ctx_dim) prompt embeds
    ctx_uncond: np.ndarray
    pooled: np.ndarray
    pooled_uncond: np.ndarray
    ip_tokens: Optional[np.ndarray] = None  # (n, ctx_dim)
    guidance_scale: float = 10.0
    num_inference_steps: int = 25


class BatchScheduler:
    """Groups compatible requests into microbatches."""

    def __init__(
        self,
        run_batch: Callable[[List[EditRequest]], List[np.ndarray]],
        max_batch: int = 8,
        max_wait_s: float = 0.05,
    ):
        self._run = run_batch
        self.max_batch = max_batch
        self.max_wait_s = max_wait_s
        self._q: "queue.Queue[Tuple[EditRequest, Future]]" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=5)

    def submit(self, req: EditRequest) -> Future:
        fut: Future = Future()
        self._q.put((req, fut))
        return fut

    def _bucket(self, req: EditRequest):
        return (req.num_inference_steps, req.latents.shape, req.guidance_scale)

    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            key = self._bucket(first[0])
            deadline = time.monotonic() + self.max_wait_s
            while len(batch) < self.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    item = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                if self._bucket(item[0]) == key:
                    batch.append(item)
                else:
                    self._q.put(item)  # incompatible — next round
                    break
            reqs = [r for r, _ in batch]
            futs = [f for _, f in batch]
            try:
                outs = self._run(reqs)
                for f, o in zip(futs, outs):
                    f.set_result(o)
            except Exception as e:  # noqa: BLE001 — propagate to callers
                for f in futs:
                    f.set_exception(e)


class BatchedDenoiser:
    """Sharded batched CFG denoise executor."""

    def __init__(
        self,
        unet_params,
        unet_cfg: unet_lib.UNetConfig,
        mesh=None,
        schedule: Optional[Schedule] = None,
        shard_model: bool = True,
    ):
        self.cfg = unet_cfg
        self.mesh = mesh or make_mesh(n_model=1)
        self.schedule = schedule or Schedule.create(SchedulerConfig())
        if shard_model and self.mesh.devices.size > 1:
            self.params = sh.apply_tp_rules(unet_params, self.mesh, sh.UNET_TP_RULES)
        else:
            self.params = unet_params
        self._jitted: Dict[Any, Callable] = {}

    def _get_fn(self, steps: int, guidance: float):
        key = (steps, guidance)
        if key not in self._jitted:
            sched = self.schedule
            cfg = self.cfg

            def fn(params, lat, ctx, ctx_u, pooled, pooled_u, tid, ip, ip_u):
                return sampler_lib.denoise(
                    params, cfg, sched, lat, ctx, ctx_u, pooled, pooled_u, tid,
                    num_inference_steps=steps, guidance_scale=guidance,
                    ip_tokens=ip, ip_tokens_uncond=ip_u,
                )

            self._jitted[key] = jax.jit(fn)
        return self._jitted[key]

    def run_batch(self, reqs: List[EditRequest]) -> List[np.ndarray]:
        n = len(reqs)
        n_data = self.mesh.shape[DATA_AXIS]
        pad = (-n) % n_data  # batch must divide the data axis
        def stack(get):
            arrs = [np.asarray(get(r)) for r in reqs]
            arrs += [arrs[-1]] * pad
            return jnp.asarray(np.stack(arrs))

        lat = stack(lambda r: r.latents)
        ctx = stack(lambda r: r.ctx)
        ctx_u = stack(lambda r: r.ctx_uncond)
        pooled = stack(lambda r: r.pooled)
        pooled_u = stack(lambda r: r.pooled_uncond)
        has_ip = reqs[0].ip_tokens is not None
        ip = stack(lambda r: r.ip_tokens) if has_ip else None
        ip_u = jnp.zeros_like(ip) if has_ip else None
        size = lat.shape[1] * 8
        tid = sampler_lib.default_time_ids(size, size, lat.shape[0])

        batch_sharding = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec(DATA_AXIS)
        )
        lat = jax.device_put(lat, batch_sharding)
        fn = self._get_fn(reqs[0].num_inference_steps, reqs[0].guidance_scale)
        with jax.set_mesh(self.mesh):
            out = fn(self.params, lat, ctx, ctx_u, pooled, pooled_u, tid, ip, ip_u)
        out = np.asarray(out)
        return [out[i] for i in range(n)]


def make_server(
    unet_params,
    unet_cfg: unet_lib.UNetConfig,
    mesh=None,
    max_batch: int = 8,
    max_wait_s: float = 0.05,
) -> BatchScheduler:
    den = BatchedDenoiser(unet_params, unet_cfg, mesh=mesh)
    return BatchScheduler(den.run_batch, max_batch, max_wait_s).start()


def serve_http(scheduler: BatchScheduler, host: str = "0.0.0.0", port: int = 8080):
    """Minimal aiohttp JSON endpoint: POST /edit with base64 npz of the
    request tensors → npz of latents."""
    import asyncio
    import base64
    import io

    from aiohttp import web

    async def edit(request: web.Request) -> web.Response:
        payload = await request.read()
        data = np.load(io.BytesIO(base64.b64decode(payload)))
        req = EditRequest(
            latents=data["latents"],
            ctx=data["ctx"],
            ctx_uncond=data["ctx_uncond"],
            pooled=data["pooled"],
            pooled_uncond=data["pooled_uncond"],
            ip_tokens=data.get("ip_tokens"),
            guidance_scale=float(data.get("guidance_scale", 10.0)),
            num_inference_steps=int(data.get("steps", 25)),
        )
        fut = scheduler.submit(req)
        out = await asyncio.wrap_future(fut)
        buf = io.BytesIO()
        np.savez(buf, latents=out)
        return web.Response(body=base64.b64encode(buf.getvalue()))

    app = web.Application()
    app.router.add_post("/edit", edit)
    web.run_app(app, host=host, port=port)
