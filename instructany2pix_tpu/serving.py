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

import contextlib
import dataclasses
import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from typing import Any, Callable, Dict, List, Optional, Tuple

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
    # uncond IP tokens (projection of zero embeds — NOT zero tokens,
    # reference ip_adapter.py:205-209); zeros_like fallback when absent
    ip_tokens_uncond: Optional[np.ndarray] = None
    guidance_scale: float = 10.0
    num_inference_steps: int = 25
    ip_scale: float = 1.0


class BatchScheduler:
    """Groups compatible requests into microbatches."""

    def __init__(
        self,
        run_batch: Callable[[List[EditRequest]], List[np.ndarray]],
        max_batch: int = 8,
        max_wait_s: float = 0.05,
        bucket_fn: Optional[Callable[[Any], Any]] = None,
    ):
        self._run = run_batch
        self.max_batch = max_batch
        self.max_wait_s = max_wait_s
        self._bucket_fn = bucket_fn
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
        if self._bucket_fn is not None:
            return self._bucket_fn(req)
        # every array shape that np.stack's inside the executor must match:
        # latents, ctx, and the IP token blocks (global-vs-local IP embeds
        # produce different n_ip — stacking them together would raise)
        return (
            req.num_inference_steps, req.latents.shape, req.guidance_scale,
            req.ip_scale, req.ctx.shape,
            None if req.ip_tokens is None else req.ip_tokens.shape,
            None if req.ip_tokens_uncond is None else req.ip_tokens_uncond.shape,
        )

    def _loop(self):
        # `pending` holds requests in arrival order; incompatible requests
        # stay at their position rather than being re-queued to the tail,
        # so alternating-bucket traffic keeps FIFO fairness.
        pending: "deque[Tuple[EditRequest, Future]]" = deque()
        while not self._stop.is_set():
            if not pending:
                try:
                    pending.append(self._q.get(timeout=0.1))
                except queue.Empty:
                    continue
            key = self._bucket(pending[0][0])
            deadline = time.monotonic() + self.max_wait_s
            while sum(1 for it in pending if self._bucket(it[0]) == key) < self.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    pending.append(self._q.get(timeout=timeout))
                except queue.Empty:
                    break
            batch: List[Tuple[EditRequest, Future]] = []
            rest: "deque[Tuple[EditRequest, Future]]" = deque()
            for it in pending:
                if len(batch) < self.max_batch and self._bucket(it[0]) == key:
                    batch.append(it)
                else:
                    rest.append(it)
            pending = rest
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
        unet_params=None,
        unet_cfg: unet_lib.UNetConfig = None,  # type: ignore[assignment]
        mesh=None,
        schedule: Optional[Schedule] = None,
        shard_model: bool = True,
        params_provider: Optional[Callable[[], Any]] = None,
    ):
        """`params_provider` (single-chip staged deployments): resolve
        the UNet tree per batch instead of capturing it — a
        StagedParams store deletes evicted device buffers, so a
        captured tree would go stale between batches."""
        self.cfg = unet_cfg
        self.mesh = mesh or make_mesh(n_model=1)
        self.schedule = schedule or Schedule.create(SchedulerConfig())
        self._provider = params_provider
        self._tp = (
            params_provider is None
            and shard_model
            and self.mesh.devices.size > 1
        )
        if params_provider is not None:
            assert self.mesh.devices.size == 1, (
                "staged params are a single-chip deployment; multi-chip "
                "meshes hold the UNet resident (pass unet_params)"
            )
            self.params = None
        elif shard_model and self.mesh.devices.size > 1:
            # split_geglu + Megatron activation pinning: without them
            # GSPMD re-lays the residual stream between head-sharded and
            # hidden-sharded layouts every block (~160 collective-permutes
            # per CFG step at SDXL width — benchmarks/tp_comm_ab.py)
            self.params = sh.apply_tp_rules(
                unet_lib.split_geglu(unet_params), self.mesh, sh.UNET_TP_RULES
            )
        else:
            self.params = unet_params
        self._jitted: Dict[Any, Callable] = {}

    def _resolve_params(self):
        return self._provider() if self._provider is not None else self.params

    def _get_fn(self, steps: int, guidance: float, ip_scale: float = 1.0):
        key = (steps, guidance, ip_scale)
        if key not in self._jitted:
            sched = self.schedule
            cfg = self.cfg

            def fn(params, lat, ctx, ctx_u, pooled, pooled_u, tid, ip, ip_u):
                return sampler_lib.denoise(
                    params, cfg, sched, lat, ctx, ctx_u, pooled, pooled_u, tid,
                    num_inference_steps=steps, guidance_scale=guidance,
                    ip_tokens=ip, ip_tokens_uncond=ip_u, ip_scale=ip_scale,
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
        if has_ip and reqs[0].ip_tokens_uncond is not None:
            ip_u = stack(lambda r: r.ip_tokens_uncond)
        else:
            ip_u = jnp.zeros_like(ip) if has_ip else None
        size = lat.shape[1] * 8
        tid = sampler_lib.default_time_ids(size, size, lat.shape[0])

        batch_sharding = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec(DATA_AXIS)
        )
        lat = jax.device_put(lat, batch_sharding)
        fn = self._get_fn(reqs[0].num_inference_steps, reqs[0].guidance_scale,
                          reqs[0].ip_scale)
        # the constraint context matters only while fn is TRACED (first
        # call per bucket); re-entering it on later calls is free
        act_ctx = (
            sh.tp_activation_constraints(self.mesh)
            if self._tp
            else contextlib.nullcontext()
        )
        with act_ctx, jax.set_mesh(self.mesh):
            out = fn(
                self._resolve_params(), lat, ctx, ctx_u, pooled, pooled_u,
                tid, ip, ip_u,
            )
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


# ---------------------------------------------------------- full pipeline


@dataclasses.dataclass
class PipelineRequest:
    """Instruction-level request (what serve.run receives,
    reference serve.py:14-45)."""

    inst: str
    mm_data: List[dict]
    alpha: float = 0.7
    h: tuple = (0.0, 0.4, 1.0)
    norm: float = 20.0
    num_inference_steps: int = 25
    cfg: float = 10.0
    scale: float = 1.0
    refinement: float = 0.0
    seed: int = 0


@dataclasses.dataclass
class PipelineResult:
    image: Optional[np.ndarray]
    caption: str


class PipelineServer:
    """Batched full-pipeline server: every hot stage — LLM generation
    (left-padded prompt batching), prior refinement, DDIM inversion, IP
    denoise, VAE — runs ONCE per microbatch as a sharded jit over the
    mesh, instead of per request (BASELINE.json config 5; the reference
    serializes requests through a gradio queue, serve.py:115).

    Batch compatibility (scheduler bucket): num_inference_steps, cfg,
    refinement, ip scale. Prompts of different lengths batch together
    via per-row left-padding (generate(prefix_pads=...)); caption-only
    LLM outcomes return without joining the diffusion stages; the
    refiner runs as one batched img2img when refinement > 0. Random
    streams are per-request ((B,) PRNG keys through generate/VAE/noise),
    so a request's result depends only on its own seed, not on batch
    composition. Subject consistency is a per-request interactive
    feature and stays on the pipeline path.
    """

    def __init__(
        self,
        pipe,
        mesh=None,
        max_batch: int = 4,
        max_wait_s: float = 0.05,
        bucket: int = 64,
        max_new_tokens: int = 100,
        shard_model: bool = True,
    ):
        from .parallel import sharding as _sh

        self.pipe = pipe
        self.mesh = mesh or make_mesh(n_model=1)
        self.bucket = bucket
        self.max_new_tokens = max_new_tokens
        from .core.staging import StagedParams

        staged = isinstance(pipe.params, StagedParams)
        multi = self.mesh.devices.size > 1 and shard_model
        assert not (staged and multi), (
            "StagedParams is a single-chip deployment; multi-chip serving "
            "holds everything resident and sharded"
        )
        if multi:
            _sh.assert_unfused_for_tp(pipe.params["llm"]["llama"])
            pipe.params["llm"]["llama"] = _sh.apply_tp_rules(
                pipe.params["llm"]["llama"], self.mesh, _sh.LLAMA_TP_RULES
            )
            # TP-sharded quantized decode weights can't be partitioned by
            # pallas_call; inside jit the router can't see shardings
            # (params are traced), so pin the XLA dequant path for this
            # serving process.
            import os as _os

            _os.environ["IA2P_QMV"] = "off"
        self.denoiser = BatchedDenoiser(
            None if staged else pipe.params["unet"], pipe.cfg.unet,
            mesh=self.mesh, schedule=pipe.schedule, shard_model=multi,
            # staged store: resolve per batch — evictions delete buffers
            params_provider=(lambda: pipe.params["unet"]) if staged else None,
        )
        self.scheduler = BatchScheduler(
            self._run_batch, max_batch, max_wait_s,
            bucket_fn=lambda req: (
                req.num_inference_steps, req.cfg, req.refinement, req.scale
            ),
        )
        self._jits: Dict[Any, Callable] = {}
        self.scheduler.start()

    def _jit(self, key, maker):
        """Per-server jit cache: stage graphs (inversion/refiner/VAE/
        prior) trace once per (key, shapes) instead of re-tracing every
        microbatch — on a 1-core host the eager 50-step scan retrace
        costs seconds per batch. Params ride as arguments so a staged
        store can swap weights between batches."""
        if key not in self._jits:
            self._jits[key] = jax.jit(maker())
        return self._jits[key]

    def submit(self, req: PipelineRequest) -> Future:
        return self.scheduler.submit(req)

    def stop(self):
        self.scheduler.stop()

    # ------------------------------------------------------------ stages

    def _batched_mm_embed(self, reqs: List[PipelineRequest]):
        """ImageBind featurization for the WHOLE microbatch in one
        dispatch per modality (the per-item loop in embed_mm_data costs
        a host sync per media file — serving glue, BASELINE.md r4).
        Returns one renormed (N_i, D) aux matrix per request, matching
        `pipe.embed_mm_data` exactly."""
        from . import pipeline as pipeline_mod
        from .codecs import image_io
        from .models import imagebind as ib_lib

        pipe = self.pipe
        c = pipe.cfg
        slots, vis_px, aud_clips = [], [], []
        for r in reqs:
            row = []
            for item in r.mm_data:
                if "embed" in item:
                    row.append(("embed", np.asarray(item["embed"], np.float32)
                                .reshape(1, -1)))
                elif item["type"] == "image":
                    from .utils.filecache import cached

                    sz = c.imagebind_vision.image_size or 224
                    vis_px.append(cached(
                        item["fname"], ("ib_vis", sz),
                        lambda: ib_lib.preprocess_vision(
                            image_io.load_image(item["fname"]), sz),
                    )[0])
                    row.append(("vis", len(vis_px) - 1))
                elif item["type"] == "audio":
                    from .utils.filecache import cached

                    aud_clips.append(cached(
                        item["fname"], "ib_aud",
                        lambda: ib_lib.preprocess_audio(
                            pipeline_mod._load_wav(item["fname"])),
                    ))
                    row.append(("aud", len(aud_clips) - 1))
                else:
                    raise ValueError(item["type"])
            slots.append(row)
        vis_out = aud_out = None
        if vis_px:
            vfn = self._jit(
                "ib_vision_b",
                lambda: lambda p, x: ib_lib.apply(p, x, c.imagebind_vision),
            )
            vis_out = vfn(
                pipe.params["imagebind_vision"], jnp.asarray(np.stack(vis_px))
            )
        if aud_clips:
            nclips = aud_clips[0].shape[0]

            def make_audio(nclips=nclips):
                # derive the item count from the input shape — a closure
                # over this call's locals would go stale in the cached jit
                def fn(p, x):
                    o = ib_lib.apply(p, x, c.imagebind_audio)
                    return jnp.mean(o.reshape(-1, nclips, o.shape[-1]), axis=1)

                return fn

            afn = self._jit(("ib_audio_b", nclips), make_audio)
            aud_out = afn(
                pipe.params["imagebind_audio"],
                jnp.asarray(np.concatenate(aud_clips)),
            )
        auxes = []
        for row in slots:
            embeds = [
                v.reshape(1, -1) if kind == "embed"
                else (vis_out[v].reshape(1, -1) if kind == "vis"
                      else aud_out[v].reshape(1, -1))
                for kind, v in row
            ]
            a = (
                jnp.concatenate([jnp.asarray(e) for e in embeds], axis=0)
                if embeds
                else jnp.zeros((0, c.llm.image_codec_dim))
            )
            auxes.append(
                a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-9)
                * c.embed_norm
            )
        return auxes

    def _llm_stage(self, reqs: List[PipelineRequest]):
        """One batched KV-cached generate over left-padded prompts."""
        import jax as _jax

        from .llm import generate as gen_lib

        pipe = self.pipe
        prepared = []
        aux = self._batched_mm_embed(reqs)
        for r, a in zip(reqs, aux):
            prepared.append(pipe._prepare_llm_inputs(r.inst, a))
        lens = [e.shape[1] for _, e in prepared]
        tgt = -(-max(lens) // self.bucket) * self.bucket
        emb = jnp.concatenate(
            [
                jnp.pad(e, ((0, 0), (tgt - e.shape[1], 0), (0, 0)))
                for _, e in prepared
            ],
            axis=0,
        )
        prefix_pads = jnp.asarray([tgt - n for n in lens], jnp.int32)
        eos_id = getattr(pipe.tokenizer, "eos_token_id", 2)
        # (B,) per-request keys: row i's sampling depends only on
        # reqs[i].seed, independent of batch composition
        row_keys = jnp.stack([_jax.random.key(r.seed) for r in reqs])
        result = gen_lib.generate(
            pipe.params["llm"]["llama"], pipe.cfg.llm.llama, emb,
            row_keys,
            max_new_tokens=self.max_new_tokens, temperature=0.3,
            eos_id=eos_id, prefix_pads=prefix_pads,
        )
        outs = []
        for i, (r, (ids, _)) in enumerate(zip(reqs, prepared)):
            n_out = min(int(result.done_at[i]) + 1, result.tokens.shape[1])
            outs.append(
                pipe._postprocess_llm(
                    np.asarray(result.tokens[i, :n_out]),
                    result.hiddens[i, :n_out], ids, aux[i], r.mm_data,
                )
            )
        return outs

    def _run_batch(self, reqs: List[PipelineRequest]) -> List[PipelineResult]:
        from .diffusion import sampler as S
        from .models import vae as vae_lib
        from .prior import model as prior_lib
        from .codecs import image_io
        from . import pipeline as pipeline_mod

        pipe = self.pipe
        c = pipe.cfg
        llm_outs = self._llm_stage(reqs)

        # requests that produced no gen tokens answer caption-only
        live = [i for i, o in enumerate(llm_outs) if o[0] is not None]
        results: List[Optional[PipelineResult]] = [
            PipelineResult(None, o[2]) for o in llm_outs
        ]
        if not live:
            return results

        # ---- prior stage: one batched no-diffusion refinement
        srcs = jnp.concatenate(
            [
                llm_outs[i][0].reshape(1, -1)
                / (jnp.linalg.norm(llm_outs[i][0]) + 1e-9) * 100.0
                for i in live
            ]
        )
        th, tm = pipe._encode_prior_text("")
        th = jnp.tile(th, (len(live), 1, 1))
        tm = jnp.tile(tm, (len(live), 1))
        y = self._jit(
            "prior",
            lambda: lambda p, s, th, tm: prior_lib.generate_diffusion(
                p, c.prior, prior_lib.MODALITY.VIDEO, prior_lib.MODALITY.IMAGE,
                s, th, tm, guidance_scale=10.0, score=6.5, no_diffusion=True,
            )[:, 0],
        )(pipe.params["prior"], srcs, th, tm)

        # ---- latents: batched VAE + inversion; the conditioning mix,
        # polar interpolation and IP projection run as ONE vectorized
        # jit below (per-row dispatch loops cost a tunnel/PCIe sync per
        # row per op — measured serving glue, BASELINE.md r4)
        imgs = []
        base_es, img_es = [], []
        for j, i in enumerate(live):
            image_embeds, base_embed, caption, base_path, _ = llm_outs[i]
            imgs.append(image_io.to_model_range(pipe.load_base_img(base_path)))
            base_es.append(np.asarray(base_embed).reshape(-1))
            img_es.append(np.asarray(image_embeds).reshape(-1))
        x = jnp.asarray(np.stack(imgs))
        import jax as _jax

        steps = reqs[live[0]].num_inference_steps
        vae_keys = jnp.stack([_jax.random.key(reqs[i].seed) for i in live])
        ctx_null, pooled_null = pipe._encode_sdxl_prompt("")
        b = len(live)
        tid = S.default_time_ids(c.image_size, c.image_size, b)
        from .core.prng import row_normal
        from .diffusion import ip_adapter as ipa_lib
        from .models import clip as clip_lib

        noise_keys = jnp.stack([_jax.random.key(reqs[i].seed + 1) for i in live])

        # ---- batched prompt encode (host tokenization feeds it, so it
        # stays outside the fused core)
        prompts = ["best quality, high quality" + llm_outs[i][2] for i in live]
        ids1 = np.concatenate([
            pipe._clip_ids(pipe.clip_tok1, pr, c.text1.max_positions,
                           c.text1.eos_token_id) for pr in prompts
        ])
        ids2 = np.concatenate([
            pipe._clip_ids(pipe.clip_tok2, pr, c.text2.max_positions,
                           c.text2.eos_token_id) for pr in prompts
        ])
        ctx_p, pooled_p = self._jit(
            "sdxl_prompt",
            lambda: lambda t1, t2, i1, i2: S.encode_prompt_sdxl(
                t1, c.text1, t2, c.text2, i1, i2
            ),
        )(
            pipe.params["text1"], pipe.params["text2"],
            jnp.asarray(ids1), jnp.asarray(ids2),
        )
        h_arr = jnp.asarray(np.stack([reqs[i].h for i in live]), jnp.float32)
        norm_arr = jnp.asarray([reqs[i].norm for i in live], jnp.float32)
        alpha_arr = jnp.asarray([reqs[i].alpha for i in live], jnp.float32)
        base_arr = jnp.asarray(np.stack(base_es), jnp.float32)
        img_arr = jnp.asarray(np.stack(img_es), jnp.float32)

        def mix_polar_ip_ops(ip_params, lat_inv, nkeys, base, img, y, h,
                             norm, alpha):
            # mix_latents semantics, vectorized (reference
            # pipeline.py:322-324): h0·base + h1·llm + h2·20·ŷ,
            # renormalized per row
            yn = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + 1e-9)
            la = h[:, 0:1] * base + h[:, 1:2] * img + h[:, 2:3] * 20.0 * yn
            la = la / (
                jnp.linalg.norm(la, axis=-1, keepdims=True) + 1e-9
            ) * norm[:, None]
            noise = row_normal(nkeys, lat_inv.shape)
            lat2 = jax.vmap(S.polar_interpolate)(lat_inv, noise, alpha)
            ip_c, ip_u = ipa_lib.get_image_embeds(
                ip_params, c.image_proj, clip_image_embeds=la, mode="global"
            )
            return lat2, ip_c, ip_u

        if self.mesh.devices.size == 1:
            # ---- fused edit core (VERDICT r4 item 5): VAE encode →
            # inversion scan → mix/polar/IP → CFG denoise scan → VAE
            # decode in ONE dispatch per microbatch. The staged stage
            # dispatches cost a tunnel/PCIe upload+sync boundary each;
            # one graph also lets XLA overlap the VAE/conditioning work
            # with the scan prologue. Single-chip path only — the TP
            # denoise keeps its explicitly sharded dispatch below.
            cfg_scale, ip_scale = reqs[live[0]].cfg, reqs[live[0]].scale

            def make_edit_core():
                def fn(unet_p, vae_p, ip_params, x, vkeys, nkeys, ctx_n,
                       pooled_n, ctx_p, pooled_p, y, base, img_e, h, norm,
                       alpha, tid):
                    bb = x.shape[0]
                    ctx_nb = jnp.tile(ctx_n, (bb, 1, 1))
                    pooled_nb = jnp.tile(pooled_n, (bb, 1))
                    src_lat = vae_lib.encode(vae_p, x, key=vkeys, cfg=c.vae)
                    lat_inv = S.ddim_invert(
                        unet_p, c.unet, pipe.schedule, src_lat, ctx_nb,
                        pooled_nb, tid, num_inference_steps=steps,
                    )
                    lat2, ip_c, ip_u = mix_polar_ip_ops(
                        ip_params, lat_inv, nkeys, base, img_e, y, h, norm,
                        alpha,
                    )
                    lats = S.denoise(
                        unet_p, c.unet, pipe.schedule, lat2, ctx_p, ctx_nb,
                        pooled_p, pooled_nb, tid, num_inference_steps=steps,
                        guidance_scale=cfg_scale, ip_tokens=ip_c,
                        ip_tokens_uncond=ip_u, ip_scale=ip_scale,
                    )
                    return vae_lib.decode(vae_p, lats, c.vae)

                return fn

            dec = self._jit(
                ("edit_core", steps, cfg_scale, ip_scale), make_edit_core
            )(
                pipe.params["unet"], pipe.params["vae"],
                pipe.params["image_proj"], x, vae_keys, noise_keys,
                ctx_null, pooled_null, ctx_p, pooled_p,
                y.astype(jnp.float32), base_arr, img_arr, h_arr, norm_arr,
                alpha_arr, tid,
            )
        else:
            vae_enc = self._jit(
                "vae_enc",
                lambda: lambda p, x, k: vae_lib.encode(p, x, key=k, cfg=c.vae),
            )
            src_lat = vae_enc(pipe.params["vae"], x, vae_keys)
            latent_inv = self._jit(
                ("invert", steps),
                lambda: lambda p, lat, ctx, pooled, tid: S.ddim_invert(
                    p, c.unet, pipe.schedule, lat, ctx, pooled, tid,
                    num_inference_steps=steps,
                ),
            )(
                pipe.params["unet"], src_lat, jnp.tile(ctx_null, (b, 1, 1)),
                jnp.tile(pooled_null, (b, 1)), tid,
            )
            latent_inv, ip_cond, ip_uncond = self._jit(
                "mix_polar_ip", lambda: mix_polar_ip_ops
            )(
                pipe.params["image_proj"], latent_inv, noise_keys,
                base_arr, img_arr, y.astype(jnp.float32), h_arr, norm_arr,
                alpha_arr,
            )
            # device-direct denoise: TP/batch sharding handled exactly
            # like run_batch — params from the denoiser (TP-sharded),
            # batch padded to the data axis and sharded over it.
            denoise_fn = self.denoiser._get_fn(
                steps, reqs[live[0]].cfg, reqs[live[0]].scale
            )
            n_data = self.mesh.shape[DATA_AXIS]
            pad = (-b) % n_data

            def pad_rows(a):
                if pad == 0:
                    return a
                return jnp.concatenate([a] + [a[-1:]] * pad, axis=0)

            lat_in = _jax.device_put(
                pad_rows(latent_inv),
                _jax.sharding.NamedSharding(
                    self.mesh, _jax.sharding.PartitionSpec(DATA_AXIS)
                ),
            )
            with _jax.set_mesh(self.mesh):
                lats = denoise_fn(
                    self.denoiser._resolve_params(),
                    lat_in, pad_rows(ctx_p),
                    jnp.tile(ctx_null, (b + pad, 1, 1)), pad_rows(pooled_p),
                    jnp.tile(pooled_null, (b + pad, 1)),
                    S.default_time_ids(c.image_size, c.image_size, b + pad),
                    pad_rows(ip_cond), pad_rows(ip_uncond),
                )
            lats = lats[:b]
            vae_dec = self._jit(
                "vae_dec", lambda: lambda p, z: vae_lib.decode(p, z, c.vae)
            )
            dec = vae_dec(pipe.params["vae"], lats)

        # ---- refiner stage (batch shares `refinement` via the bucket):
        # one batched img2img through the refiner UNet, per-row keys
        # (mirrors pipeline.run's block, reference pipeline.py:358-359)
        refinement = reqs[live[0]].refinement
        if refinement > 0:
            from .diffusion import img2img as i2i

            rprompts = [
                llm_outs[i][2] + ",high quality,well-formed,award-winning"
                for i in live
            ]
            rids2 = np.concatenate([
                pipe._clip_ids(pipe.clip_tok2, pr, c.text2.max_positions,
                               c.text2.eos_token_id) for pr in rprompts
            ])
            text2_fn = self._jit(
                "text2_apply",
                lambda: lambda p, i: clip_lib.text_apply(p, i, c.text2),
            )
            o2 = text2_fn(pipe.params["text2"], jnp.asarray(rids2))
            rctx = o2["hidden_states"][-2]
            rpooled = o2.get("text_embeds", o2["pooled"])
            rids2n = pipe._clip_ids(
                pipe.clip_tok2, "", c.text2.max_positions, c.text2.eos_token_id
            )
            o2n = text2_fn(pipe.params["text2"], jnp.asarray(rids2n))
            rctx_u = jnp.tile(o2n["hidden_states"][-2], (b, 1, 1))
            rpooled_u = jnp.tile(o2n.get("text_embeds", o2n["pooled"]), (b, 1))
            rtid = jnp.tile(
                jnp.asarray([[c.image_size, c.image_size, 0, 0, 6.0]], jnp.float32),
                (b, 1),
            )
            rtid_u = jnp.tile(
                jnp.asarray([[c.image_size, c.image_size, 0, 0, 2.5]], jnp.float32),
                (b, 1),
            )
            enc_keys = jnp.stack([_jax.random.key(reqs[i].seed + 2) for i in live])
            noise_keys2 = jnp.stack([_jax.random.key(reqs[i].seed + 3) for i in live])

            def make_refine_core():
                def fn(ref_p, vae_p, d, ekeys, nkeys, ctx, ctx_u, pooled,
                       pooled_u, tid, tid_u):
                    # Round-trip the decoded image through uint8 before
                    # re-encoding, exactly like the single-request
                    # pipeline (pipeline.run saves `non_refined` as uint8
                    # then to_model_range's it back) — keeps same-seed
                    # results bit-consistent between the two paths.
                    # jnp.floor before the cast: numpy's astype(uint8)
                    # truncates, XLA's convert rounds.
                    d8 = jnp.floor(
                        jnp.clip((d.astype(jnp.float32) + 1.0) * 127.5, 0, 255)
                    ).astype(jnp.float32) / 127.5 - 1.0
                    rlat = vae_lib.encode(vae_p, d8, key=ekeys, cfg=c.vae)
                    rlat = i2i.img2img(
                        ref_p, c.refiner, pipe.schedule, rlat, nkeys, ctx,
                        ctx_u, pooled, pooled_u, tid,
                        # diffusers img2img defaults (reference
                        # pipeline.py:358): 50-step grid regardless of the
                        # edit's step count, guidance 5.0, negative
                        # aesthetic score 2.5 on uncond
                        num_inference_steps=pipeline_mod.REFINER_NUM_STEPS,
                        strength=refinement,
                        guidance_scale=5.0,
                        time_ids_uncond=tid_u,
                    )
                    return vae_lib.decode(vae_p, rlat, c.vae)

                return fn

            # one dispatch: uint8 round-trip + VAE encode + refiner scan
            # + VAE decode (was 4 — serving glue, VERDICT r4 item 5)
            dec = self._jit(("refine_core", refinement), make_refine_core)(
                pipe.params["refiner"], pipe.params["vae"], dec, enc_keys,
                noise_keys2, rctx, rctx_u, rpooled, rpooled_u, rtid, rtid_u,
            )

        for j, i in enumerate(live):
            results[i] = PipelineResult(
                image_io.from_model_range(np.asarray(dec[j])), llm_outs[i][2]
            )
        return results
