"""Benchmark: TRUE end-to-end 50-step 512x512 edit latency on the real
TPU chip (BASELINE.json north-star config; VERDICT r1 item 1).

Measures every stage of `InstructAny2PixPipeline.__call__` at FULL model
size (reference pipeline.py:303-386 trace):
  1. LLM generation  — vicuna-7B-class decoder, weight-only
     quantized per IA2P_BENCH_LLM_QUANT: int4 (default; blockwise
     group-128 scales = the reference's bnb-NF4 precision class,
     pipeline.py:30), int4pc (faster per-channel scales), int8, or
     bf16. 128-token prompt prefill + 100-token KV-cached decode in
     ONE jitted graph, Pallas decode matvec kernels, fused
     qkv/gate_up projections.
  2. Text encodes    — SDXL text1+text2 (3 prompts) + prior CLIP-H.
  3. Diffusion prior — GPT-2-medium, no_diffusion single step.
  4. VAE encode/decode at 512² (encode for inversion, decode after
     denoise, encode+decode around the refiner).
  5. DDIM inversion  — 50 non-CFG SDXL UNet forwards as one lax.scan.
  6. IP denoise      — 50 CFG (batch-2) UNet forwards as one lax.scan.
  7. Refiner         — 25 CFG refiner-UNet forwards (strength 0.5).

The one physical chip (16 GB) cannot hold the 7B LLM and the SDXL
stack simultaneously, so weights are staged (LLM freed before the
diffusion stages load) — weight residency is a deployment-topology
concern (v5e-8 holds everything sharded); the metric is compute
latency per stage, host-sync corrected for the axon tunnel.

Prints the JSON payload line
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N, ...}
IMMEDIATELY after the composed stages (so a timeout in the optional
wall-clock section can never erase it — VERDICT r4 item 1), and prints
the superset payload (wall-clock + server fields merged) as the final
line when that section runs. vs_baseline is measured against the 2.0 s
north-star (>1 = faster). Per-stage breakdown goes to stderr (and
belongs in BASELINE.md).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: a repeat bench run (same graphs) skips the
# 20-40 s/graph remote compiles — works with the axon PJRT backend.
# Derived from this file's location (not a hardcoded path) and only set
# when the caller hasn't configured a cache of their own.
if jax.config.jax_compilation_cache_dir is None:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --------------------------------------------------------------- watchdog
# The axon tunnel can wedge hard enough that a single device op never
# returns (observed r5: a trivial jnp.sum blocked >30 min from a fresh
# process). A hung main thread would reproduce the r4 rc=124/no-payload
# failure, so a daemon thread holds a deadline and, if the main thread
# hasn't disarmed/re-armed it in time, prints the best payload available
# at that moment (marked `partial`/`wall_stalled`) and exits 0 — the
# driver always captures a parseable final JSON line.
_WD = {"deadline": None, "payload_fn": None, "note": None, "done": False}


def _wd_arm(seconds: float, payload_fn, note: str) -> None:
    _WD["payload_fn"] = payload_fn
    _WD["note"] = note
    _WD["deadline"] = time.monotonic() + seconds


def _wd_disarm() -> None:
    _WD["deadline"] = None


def _wd_start() -> None:
    import threading

    def loop():
        while not _WD["done"]:
            time.sleep(5)
            dl = _WD["deadline"]
            if dl is not None and time.monotonic() > dl:
                try:
                    p = _WD["payload_fn"]()
                    p["stalled"] = _WD["note"]
                    print(json.dumps(p), flush=True)
                except Exception as e:  # payload itself must never raise
                    print(json.dumps({"metric": "bench_stalled",
                                      "value": None, "unit": "s",
                                      "error": repr(e)}), flush=True)
                os._exit(0)

    threading.Thread(target=loop, daemon=True).start()


def sync(x):
    """Host readback — the only reliable completion barrier over the
    axon tunnel (block_until_ready returns early)."""
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def measure_sync_overhead(probe):
    t0 = time.perf_counter()
    for _ in range(5):
        sync(probe)
    return (time.perf_counter() - t0) / 5


def probe_tunnel_gbps(nbytes: int = 64 << 20) -> float:
    """One small host→device transfer to measure the link. The dev
    tunnel runs at ~0.03 GB/s (500x slower than PCIe); the wall-clock
    section stages several GB, so its feasibility is a link question —
    decided up front instead of discovering it via a driver timeout
    (VERDICT r4 item 1: BENCH_r04 died mid-staging with rc=124)."""
    arr = np.ones((nbytes // 4,), np.float32)
    t0 = time.perf_counter()
    x = jnp.asarray(arr)
    jax.block_until_ready(x)
    sync(x)
    dt = time.perf_counter() - t0
    try:
        x.delete()
    except Exception:
        pass
    return nbytes / 1e9 / max(dt, 1e-9)


def init_bf16(init_fn, key):
    """Init a param tree directly in bf16 inside one jit (fp32
    intermediates die leaf-by-leaf, so the watermark stays ~bf16 size)."""

    @jax.jit
    def go(k):
        return jax.tree.map(lambda x: x.astype(jnp.bfloat16), init_fn(k))

    params = go(key)
    jax.block_until_ready(params)
    return params


def free(params):
    for leaf in jax.tree.leaves(params):
        try:
            leaf.delete()
        except Exception:
            pass


def time_once(fn, *args, label="", t_sync=0.0, reps=3):
    """Compile, then time `reps` executions of a single-dispatch fn."""
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(fn(*args))
    dt = (time.perf_counter() - t0) / reps - t_sync
    log(f"  {label}: {dt * 1e3:.1f} ms")
    return max(dt, 0.0)


def to_host(tree):
    return jax.tree.map(np.asarray, tree)


def bench_llm(t_sync, quant: str, host_out=None):
    from instructany2pix_tpu.llm import generate as gen_lib
    from instructany2pix_tpu.models import llama

    cfg = llama.LlamaConfig.vicuna_7b()
    log(f"LLM stage: vicuna-7B config, quant={quant} ...")
    t0 = time.perf_counter()
    params = init_bf16(lambda k: llama.init(k, cfg), jax.random.key(0))
    log(f"  init 7B bf16: {time.perf_counter() - t0:.1f}s")

    if quant in ("int8", "int4", "int4pc"):
        from instructany2pix_tpu.ops import quant as quant_lib

        t0 = time.perf_counter()
        params = quant_lib.quantize_llama(
            params, bits=8 if quant == "int8" else 4, free_originals=True,
            int4_grouped=(quant != "int4pc"),
        )
        jax.block_until_ready(params)
        log(f"  {quant} weight quantization: {time.perf_counter() - t0:.1f}s")
        # single-chip decode: 4 fused matvec kernels/layer instead of 7
        params = llama.fuse_projections(params)

    prompt_len, new_tokens = 128, 100
    emb = jax.random.normal(
        jax.random.key(1), (1, prompt_len, cfg.hidden_size), jnp.bfloat16
    )

    def fn(params, emb, key):
        # generate is itself jitted — one dispatch for prefill + scan
        return gen_lib.generate(
            params, cfg, emb, key, max_new_tokens=new_tokens,
            temperature=0.3, eos_id=2,
        ).tokens
    log("  compiling generate graph (prefill + 100-step decode scan)...")
    t0 = time.perf_counter()
    toks = fn(params, emb, jax.random.key(2))
    sync(toks)
    log(f"  compile+first: {time.perf_counter() - t0:.1f}s")
    t = time_once(fn, params, emb, jax.random.key(3),
                  label=f"llm prefill({prompt_len})+decode({new_tokens})",
                  t_sync=t_sync, reps=3)
    if host_out is not None:
        # host copy of the packed tree — the wall-clock section stages
        # it back without paying init+quantization again (the on-disk
        # artifact of scripts/convert_checkpoints.py --quant-llm)
        host_out["llama"] = to_host(params)
    free(params)
    return t


def bench_wallclock(host, size, quant, mode="resident"):
    """One COMPLETE edit through the real `InstructAny2PixPipeline.
    __call__` (VERDICT r3 item 1): LLM generation, prior, inversion,
    denoise, refiner, VAE — plus weight staging swaps, host transfers
    and orchestration, i.e. everything a user's wall clock sees. The
    params come from a StagedParams store primed with the full-size
    host trees built above (= the convert_checkpoints.py --quant-llm
    on-disk artifact: boot is a device_put, never a re-quantization).

    The 7B LLM + ImageBind + SDXL stack total ~18 GB bf16/int4 — more
    than one v5e's 16 GB — so part of the stack swaps in/out per edit
    (the reference makes the same single-GPU squeeze with NF4+fp16,
    reference pipeline.py:30,101). Staging seconds are attributed
    separately: over this dev tunnel host→device runs at ~0.06 GB/s,
    ~100-500x slower than a local PCIe host, so `wall_minus_staging`
    is the hardware-comparable number."""
    import tempfile
    import wave

    from PIL import Image

    from instructany2pix_tpu import pipeline as pl
    from instructany2pix_tpu.core.prng import KeyChain
    from instructany2pix_tpu.core.staging import StagedParams
    from instructany2pix_tpu.llm import multimodal as mm_lib
    from instructany2pix_tpu.utils.profiling import collect_stages

    log("wall-clock: assembling staged pipeline (full-size, real path)...")
    cfg = pl.PipelineConfig(image_size=size, llm=mm_lib.Any2PixLMConfig())

    # llm group = quantized llama + the small projector/predictor heads
    kc = KeyChain(jax.random.key(99))
    d = cfg.llm.llama.hidden_size
    heads = {
        "vae_projector_image": mm_lib._projector_init(kc, cfg.llm.image_codec_dim, d),
        "vae_projector_audio": mm_lib._projector_init(kc, cfg.llm.audio_codec_dim, d),
        "vae_predictor_image": mm_lib._predictor_init(kc, d, cfg.llm.image_codec_dim),
        "vae_predictor_audio": mm_lib._predictor_init(kc, d, cfg.llm.audio_codec_dim),
    }
    heads = jax.tree.map(lambda x: np.asarray(x.astype(jnp.bfloat16)), heads)
    host["llm"] = {"llama": host.pop("llama"), **heads}

    # staging policy per mode (VERDICT r4 item 2):
    #   resident — int4 LLM + int8-linear diffusion stack ≈ 12.9 GB:
    #     everything fits, ZERO swaps after the initial loads.
    #   planned  — bf16 stack with the small groups + UNet pinned, so
    #     only the LLM and refiner rotate: 8.3 GB/edit in 2 swaps
    #     (was 18.7 GB / 10 swaps under plain LRU at 12.5 GB).
    #   lru      — the r4 baseline policy.
    small_groups = (
        "vae", "text1", "text2", "prior_text", "prior", "image_proj",
        "imagebind_vision", "imagebind_audio",
    )
    if mode == "resident":
        default_budget, pins = 14.2e9, ()
    elif mode == "planned":
        # peak live = small(4.6) + unet(5.8) + llm/refiner max(4.5)
        # ≈ 14.9 GB; the store evicts-before-materialize so the peak
        # never exceeds live+0 (r4's OOM was shrink-after-materialize)
        default_budget, pins = 15.0e9, small_groups + ("unet",)
    else:
        default_budget, pins = 12.5e9, ()
    budget = float(os.environ.get("IA2P_STAGING_BUDGET", default_budget))
    factories = {
        k: (lambda kk=k: jax.tree.map(jnp.asarray, host[kk])) for k in host
    }
    store = StagedParams(
        factories, budget_bytes=budget, pin=pins,
        aliases={"inpaint_unet": "unet"}, host_trees=host,
    )
    pipe = pl.InstructAny2PixPipeline(params=store, config=cfg, seed=0)

    # media fixtures on disk — file IO is part of the product path
    tmp = tempfile.mkdtemp()
    img_path = os.path.join(tmp, "in.png")
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (size, size, 3), np.uint8)
    ).save(img_path)
    wav_path = os.path.join(tmp, "in.wav")
    with wave.open(wav_path, "w") as f:
        f.setnchannels(1); f.setsampwidth(2); f.setframerate(16000)
        f.writeframes(
            np.random.default_rng(1).integers(-3000, 3000, 32000, np.int16).tobytes()
        )
    media = [{"type": "image", "fname": img_path},
             {"type": "audio", "fname": wav_path}]

    # random 7B weights never emit the <im_gen>…<video> pattern, so the
    # diffusion branch would caption-fallback; keep the REAL postprocess
    # cost but pin its return to full-dim embeds (the tests' seed-cache
    # trick, applied after the genuine bookkeeping ran)
    rs = np.random.RandomState(7)
    dc = cfg.llm.image_codec_dim
    seeded = (
        jnp.asarray(rs.randn(1, dc), np.float32),
        jnp.asarray(rs.randn(dc), np.float32),
        "a bench caption",
        img_path,
        dict(all_objs=[], extra_embeds=None, extra_idx=None),
    )
    real_post = pipe._postprocess_llm

    def post(*a, **kw):
        real_post(*a, **kw)
        return seeded

    pipe._postprocess_llm = post

    def one_edit(seed):
        return pipe(
            "add the sound of [audio] to [image]", media,
            num_inference_steps=50, refinement=0.5, seed=seed,
        )

    log(f"wall-clock ({mode}): cold edit (compiles + first staging)...")
    t0 = time.perf_counter()
    one_edit(0)
    cold = time.perf_counter() - t0
    log(f"  cold edit: {cold:.1f}s")

    swaps0, swap_s0 = store.stats["swaps"], store.stats["swap_s"]
    swap_b0 = store.stats["swap_bytes"]
    with collect_stages() as st:
        t0 = time.perf_counter()
        _, warm_img, _ = one_edit(1)
        warm = time.perf_counter() - t0
    swap_s = store.stats["swap_s"] - swap_s0
    nswaps = store.stats["swaps"] - swaps0
    log(f"  warm edit wall: {warm:.2f}s  (staging: {nswaps} swaps, "
        f"{swap_s:.2f}s; evict_s total {store.stats['evict_s']:.2f}s)  "
        f"minus-staging: {warm - swap_s:.2f}s")
    for k, v in sorted(st.times.items(), key=lambda kv: -kv[1]):
        log(f"    {k:>18}: {v:.3f}s")
    swap_gb = (store.stats["swap_bytes"] - swap_b0) / 1e9
    payload = {
        "wall_mode": mode,
        "wall_clock": round(warm, 3),
        "wall_minus_staging": round(warm - swap_s, 3),
        "wall_cold": round(cold, 1),
        "staging_swaps": nswaps,
        "staging_swap_s": round(swap_s, 3),
        "staging_swap_gb": round(swap_gb, 2),
        # same swaps over a deployment-class host link (PCIe ≥8 GB/s)
        # instead of this dev tunnel
        "wall_projected_pcie": round(warm - swap_s + swap_gb / 8.0, 2),
        "wall_stages": {k: round(v, 3) for k, v in st.times.items()},
    }

    # ---------------------------------------------- server throughput
    # Full-pipeline PipelineServer batched throughput (VERDICT r3 item
    # 9): every stage — batched LLM generate, prior, batched inversion,
    # batched CFG denoise, batched refiner img2img, VAE — runs once per
    # microbatch over the staged store (the reference serializes
    # requests through a gradio queue, serve.py:115). Staging seconds
    # attributed separately as in the wall-clock row.
    if os.environ.get("IA2P_BENCH_SERVER", "1") == "1":
        # non-fatal: a remote-compile relay hiccup in the batched graphs
        # must not void the wall-clock/stage payload above
        try:
            from instructany2pix_tpu import serving

            server = serving.PipelineServer(pipe, max_batch=4, max_wait_s=0.3)
            mk = lambda i: serving.PipelineRequest(  # noqa: E731
                "add the sound of [audio] to [image]", media,
                num_inference_steps=50, refinement=0.5, seed=i,
            )
            try:
                log("server: warm batch of 4 (compiles batched graphs)...")
                t0 = time.perf_counter()
                futs = [server.submit(mk(i)) for i in range(4)]
                outs = [f.result(timeout=5400) for f in futs]
                log(f"  warm batch: {time.perf_counter() - t0:.1f}s")
                assert all(o.image is not None for o in outs)
                swaps0, swap_s0 = store.stats["swaps"], store.stats["swap_s"]
                swb0 = store.stats["swap_bytes"]
                t0 = time.perf_counter()
                futs = [server.submit(mk(4 + i)) for i in range(4)]
                outs = [f.result(timeout=5400) for f in futs]
                dt = time.perf_counter() - t0
                swap_s = store.stats["swap_s"] - swap_s0
                nsw = store.stats["swaps"] - swaps0
                sw_gb = (store.stats["swap_bytes"] - swb0) / 1e9
                log(
                    f"  steady batch of 4: {dt:.2f}s ({4 / dt:.3f} img/s/chip; "
                    f"staging {nsw} swaps {swap_s:.2f}s {sw_gb:.1f}GB -> "
                    f"{4 / (dt - swap_s):.3f} img/s minus-staging)"
                )
                payload["server_img_s"] = round(4 / dt, 3)
                payload["server_img_s_minus_staging"] = round(
                    4 / (dt - swap_s), 3
                )
                payload["server_img_s_projected_pcie"] = round(
                    4 / (dt - swap_s + sw_gb / 8.0), 3
                )
            finally:
                server.stop()
        except Exception as e:  # noqa: BLE001
            log(f"server section FAILED (non-fatal): {type(e).__name__}: {e}")
            payload["server_error"] = f"{type(e).__name__}: {e}"

    return payload, warm_img


def main():
    quant = os.environ.get("IA2P_BENCH_LLM_QUANT", "int4")
    stage_s = {}

    # Stall insurance, armed BEFORE the first device op: the r5 wedge
    # blocked a trivial jnp.sum for >30 min, which no later watchdog
    # would catch. If the composed stages (incl. the first op) don't
    # finish inside IA2P_BENCH_DEADLINE_S, report whatever completed.
    def _partial_payload():
        done = {k: round(v, 3) for k, v in stage_s.items()}
        return {
            "metric": "e2e_50step_edit_latency",
            "value": round(sum(done.values()), 3) if done else None,
            "unit": "s",
            "partial": True,
            "stages": done,
            "llm_quant": quant,
        }

    _wd_start()
    _wd_arm(float(os.environ.get("IA2P_BENCH_DEADLINE_S", "2400")),
            _partial_payload, "composed stages exceeded deadline")

    dev = jax.devices()[0]
    log(f"device: {dev}")

    probe = jnp.ones((8, 8))
    sync(probe)
    t_sync = measure_sync_overhead(probe)
    log(f"host-sync roundtrip: {t_sync * 1e3:.1f} ms")

    # ------------------------------------------- wall-clock feasibility
    # The wall-clock section stages the full weight stack host→device
    # (~13 GB resident / ~19 GB bf16). Over a PCIe-class link that is
    # seconds; over the dev tunnel it is tens of minutes and killed the
    # r4 driver run before the payload printed. Decide NOW from a
    # measured link probe; the composed-stage payload prints either way
    # (VERDICT r4 item 1). IA2P_BENCH_WALLCLOCK: 1 = budget-gated
    # (default), force = always, 0 = never. Budget in seconds via
    # IA2P_BENCH_WALL_BUDGET_S (covers cold staging only; compiles and
    # the edits come on top, so keep it a fraction of the driver cap).
    wall_env = os.environ.get("IA2P_BENCH_WALLCLOCK", "1")
    wall_mode = os.environ.get("IA2P_BENCH_WALL_MODE", "resident")
    wall_budget = float(os.environ.get("IA2P_BENCH_WALL_BUDGET_S", "300"))
    wall_on, wall_skip = False, None
    if wall_env == "0":
        wall_skip = "disabled (IA2P_BENCH_WALLCLOCK=0)"
    else:
        gbps = probe_tunnel_gbps()
        log(f"host->device link probe: {gbps:.3f} GB/s")
        # cold staging moves the whole stack once; warm edits move the
        # per-edit swap set (0 resident / 8.3 GB planned / 18.7 GB lru)
        est_gb = {"resident": 13.0, "planned": 19.0 + 8.3}.get(wall_mode, 19.0 * 2)
        proj_s = est_gb / max(gbps, 1e-9)
        if wall_env == "force" or proj_s <= wall_budget:
            wall_on = True
        else:
            wall_skip = (
                f"projected staging {proj_s:.0f}s (~{est_gb:.0f} GB at "
                f"{gbps:.3f} GB/s) > budget {wall_budget:.0f}s"
            )
            log(f"wall-clock section SKIPPED: {wall_skip}")

    # ---------------------------------------------------------- LLM stage
    # host copies of every full-size tree for the wall-clock run — only
    # paid when that section will actually run (several GB of host RAM
    # + device→host pulls over the slow tunnel otherwise, ADVICE r4)
    host = {} if wall_on else None
    stage_s["llm"] = bench_llm(t_sync, quant, host_out=host)

    # ------------------------------------------- input featurization stage
    # ImageBind encodes of the request's media (reference pipeline.py:
    # 159-164 runs ImageBind-huge per mm_data item — on CPU there; here
    # the full ViT-H vision trunk + ViT-B audio trunk on-chip, 1 image +
    # 1 three-clip audio like the north-star audio+image+text edit)
    from instructany2pix_tpu.models import imagebind as ib

    vcfg_ib = ib.ViTConfig.imagebind_vision()
    acfg_ib = ib.ViTConfig.imagebind_audio()
    vision_p = init_bf16(lambda k: ib.init(k, vcfg_ib), jax.random.key(20))
    n_audio_patches = ((128 - 16) // 10 + 1) * ((204 - 16) // 10 + 1)
    audio_p = init_bf16(
        lambda k: ib.init(k, acfg_ib, num_patches=n_audio_patches),
        jax.random.key(21),
    )
    img_in = jnp.zeros((1, 224, 224, 3), jnp.bfloat16)
    aud_in = jnp.zeros((3, 128, 204, 1), jnp.bfloat16)

    @jax.jit
    def featurize(vision_p, audio_p, img_in, aud_in):
        v = ib.apply(vision_p, img_in, vcfg_ib)
        a = jnp.mean(ib.apply(audio_p, aud_in, acfg_ib), axis=0, keepdims=True)
        return v, a

    stage_s["imagebind"] = time_once(
        featurize, vision_p, audio_p, img_in, aud_in,
        label="imagebind vision(1x224^2) + audio(3 clips)", t_sync=t_sync,
    )
    if wall_on:
        if wall_mode == "resident":
            from instructany2pix_tpu.ops.quant import quantize_linears

            vision_p = quantize_linears(vision_p, free_originals=True)
            audio_p = quantize_linears(audio_p, free_originals=True)
        host["imagebind_vision"] = to_host(vision_p)
        host["imagebind_audio"] = to_host(audio_p)
    free(vision_p); free(audio_p)

    # ------------------------------------------------- diffusion stack init
    from instructany2pix_tpu.diffusion import img2img as i2i
    from instructany2pix_tpu.diffusion import ip_adapter as ipa
    from instructany2pix_tpu.diffusion import sampler as S
    from instructany2pix_tpu.diffusion.schedulers import Schedule, SchedulerConfig
    from instructany2pix_tpu.models import clip as clip_lib
    from instructany2pix_tpu.models import unet as unet_lib
    from instructany2pix_tpu.models import vae as vae_lib
    from instructany2pix_tpu.prior import model as prior_lib

    log("initializing SDXL stack (bf16)...")
    t0 = time.perf_counter()
    ucfg = unet_lib.UNetConfig.sdxl_base(with_ip=True)
    rcfg = unet_lib.UNetConfig.sdxl_refiner()
    vcfg = vae_lib.VAEConfig()
    t1cfg = clip_lib.CLIPTextConfig.vit_l()
    t2cfg = clip_lib.CLIPTextConfig.open_clip_bigg()
    ptcfg = clip_lib.CLIPTextConfig.vit_h()
    pcfg = prior_lib.PriorConfig()
    ipcfg = ipa.ImageProjConfig()
    unet_p = init_bf16(lambda k: unet_lib.init(k, ucfg), jax.random.key(10))
    ref_p = init_bf16(lambda k: unet_lib.init(k, rcfg), jax.random.key(11))
    vae_p = init_bf16(lambda k: vae_lib.init(k, vcfg), jax.random.key(12))
    t1_p = init_bf16(lambda k: clip_lib.text_init(k, t1cfg), jax.random.key(13))
    t2_p = init_bf16(lambda k: clip_lib.text_init(k, t2cfg), jax.random.key(14))
    pt_p = init_bf16(lambda k: clip_lib.text_init(k, ptcfg), jax.random.key(15))
    prior_p = init_bf16(lambda k: prior_lib.init(k, pcfg), jax.random.key(16))
    ip_p = init_bf16(lambda k: ipa.init(k, ipcfg), jax.random.key(17))
    log(f"  sdxl-stack init: {time.perf_counter() - t0:.1f}s")
    schedule = Schedule.create(SchedulerConfig())

    # IA2P_BENCH_SIZE=1024 measures the reference's NATIVE resolution
    # (pipeline loads 1024x1024 center crops, pipeline.py:41-88); the
    # default 512 is the BASELINE.json north-star config
    size = int(os.environ.get("IA2P_BENCH_SIZE", "512"))
    lat_hw, steps = size // 8, 50

    # ---------------------------------------------------- text encode stage
    ids1 = jnp.ones((1, 77), jnp.int32)
    ids2 = jnp.ones((1, 77), jnp.int32)

    @jax.jit
    def encode_prompts(t1_p, t2_p, pt_p, ids1, ids2):
        # 3 prompts (null, edit, refine) through SDXL's two encoders +
        # the prior's CLIP-H "" prompt — batched per encoder
        i1 = jnp.tile(ids1, (3, 1))
        i2 = jnp.tile(ids2, (3, 1))
        ctx, pooled = S.encode_prompt_sdxl(t1_p, t1cfg, t2_p, t2cfg, i1, i2)
        pt = clip_lib.text_apply(pt_p, ids1, ptcfg)["last_hidden_state"]
        return ctx, pooled, pt

    ctx3, pooled3, prior_text = encode_prompts(t1_p, t2_p, pt_p, ids1, ids2)
    sync(ctx3)
    stage_s["text_encode"] = time_once(
        encode_prompts, t1_p, t2_p, pt_p, ids1, ids2,
        label="text encodes (3 prompts x 2 encoders + CLIP-H)",
        t_sync=t_sync,
    )
    ctx_p, ctx_null = ctx3[0:1], ctx3[1:2]
    pooled_p, pooled_null = pooled3[0:1], pooled3[1:2]
    rctx, rpooled = ctx3[2:3, :, -1280:], pooled3[2:3]

    # ---------------------------------------------------------- prior stage
    src = jax.random.normal(jax.random.key(20), (1, pcfg.imagebind_dim))
    tmask = jnp.ones((1, prior_text.shape[1]), jnp.float32)

    @jax.jit
    def prior_fn(prior_p, src, th, tm):
        return prior_lib.generate_diffusion(
            prior_p, pcfg, prior_lib.MODALITY.VIDEO, prior_lib.MODALITY.IMAGE,
            src, th, tm, guidance_scale=10.0, score=6.5, no_diffusion=True,
        )

    y = prior_fn(prior_p, src, prior_text, tmask)
    sync(y)
    stage_s["prior"] = time_once(
        prior_fn, prior_p, src, prior_text, tmask,
        label="prior (no_diffusion, CFG)", t_sync=t_sync,
    )

    # ------------------------------------------------------------ VAE stage
    img = jax.random.normal(jax.random.key(21), (1, size, size, 3), jnp.bfloat16)

    @jax.jit
    def vae_enc(vae_p, img):
        return vae_lib.encode(vae_p, img, cfg=vcfg, sample=False)

    @jax.jit
    def vae_dec(vae_p, lat):
        return vae_lib.decode(vae_p, lat, vcfg)

    src_lat = vae_enc(vae_p, img)
    sync(src_lat)
    t_enc = time_once(vae_enc, vae_p, img, label=f"vae encode {size}²", t_sync=t_sync)
    lat0 = jax.random.normal(jax.random.key(22), (1, lat_hw, lat_hw, 4), jnp.bfloat16)
    dec = vae_dec(vae_p, lat0)
    sync(dec)
    t_dec = time_once(vae_dec, vae_p, lat0, label=f"vae decode {size}²", t_sync=t_sync)
    # encode x2 (inversion, refiner input) + decode x2 (denoise, refiner)
    stage_s["vae"] = 2 * t_enc + 2 * t_dec

    # ------------------------------------------------------ inversion stage
    tid = S.default_time_ids(size, size, 1)

    @jax.jit
    def invert_fn(unet_p, lat, ctx, pooled, tid):
        return S.ddim_invert(
            unet_p, ucfg, schedule, lat, ctx, pooled, tid,
            num_inference_steps=steps,
        )

    log(f"  compiling inversion scan ({steps} steps)...")
    lat_inv = invert_fn(unet_p, src_lat, ctx_null, pooled_null, tid)
    sync(lat_inv)
    stage_s["ddim_inversion"] = time_once(
        invert_fn, unet_p, src_lat, ctx_null, pooled_null, tid,
        label=f"ddim inversion ({steps} UNet fwd, batch 1)",
        t_sync=t_sync, reps=2,
    )

    # -------------------------------------------------------- denoise stage
    ip_cond, ip_uncond = ipa.get_image_embeds(
        ip_p, ipcfg,
        clip_image_embeds=jax.random.normal(jax.random.key(23), (1, 1024)),
        mode="global",
    )

    @jax.jit
    def denoise_fn(unet_p, lat, ctx, ctx_n, pooled, pooled_n, tid, ip, ip_u):
        return S.denoise(
            unet_p, ucfg, schedule, lat, ctx, ctx_n, pooled, pooled_n, tid,
            num_inference_steps=steps, guidance_scale=10.0,
            ip_tokens=ip, ip_tokens_uncond=ip_u, ip_scale=1.0,
        )

    log(f"  compiling denoise scan ({steps} CFG steps)...")
    lat_out = denoise_fn(
        unet_p, lat_inv, ctx_p, ctx_null, pooled_p, pooled_null, tid,
        ip_cond, ip_uncond,
    )
    sync(lat_out)
    stage_s["ip_denoise"] = time_once(
        denoise_fn, unet_p, lat_inv, ctx_p, ctx_null, pooled_p, pooled_null,
        tid, ip_cond, ip_uncond,
        label=f"ip denoise ({steps} CFG UNet fwd, batch 2)",
        t_sync=t_sync, reps=2,
    )

    # -------------------------------------------------------- refiner stage
    rtid = jnp.asarray([[size, size, 0, 0, 6.0]], jnp.float32)
    rctx_n = jnp.zeros_like(rctx)
    rpooled_n = jnp.zeros_like(rpooled)

    @jax.jit
    def refiner_fn(ref_p, lat, key, ctx, ctx_n, pooled, pooled_n, tid):
        return i2i.img2img(
            ref_p, rcfg, schedule, lat, key, ctx, ctx_n, pooled, pooled_n,
            tid, num_inference_steps=steps, strength=0.5, guidance_scale=5.0,
        )

    log("  compiling refiner scan (25 CFG steps)...")
    rlat = refiner_fn(
        ref_p, lat_out, jax.random.key(24), rctx, rctx_n, rpooled, rpooled_n, rtid
    )
    sync(rlat)
    stage_s["refiner"] = time_once(
        refiner_fn, ref_p, lat_out, jax.random.key(25), rctx, rctx_n, rpooled,
        rpooled_n, rtid,
        label="refiner (25 CFG refiner fwd, strength 0.5)",
        t_sync=t_sync, reps=2,
    )

    # --------------------------------------------------------- quality
    # CLIP-score the bench edit's decoded image against a fixed caption
    # (BASELINE quality metric — CLIP-score parity with the reference's
    # paper eval, readme.MD:34). Uses the full ViT-H towers when a CLIP
    # checkpoint exists on disk; otherwise the deterministic tiny-dims
    # regression pin (clip_score.make_tiny_scoring_clip). The RAW cosine
    # is the headline pin: random tiny towers land negative, and the
    # standard max(cos,0) clamp published a dead 0.00 in r4 (VERDICT r4
    # item 7); `clip_score` is only emitted for real ViT-H towers.
    # Disable with IA2P_BENCH_QUALITY=0; tests/test_clip_score.py.
    clip_raw = None
    clip_is_pin = True
    clip_det = None
    score_image = None
    if "--quality" in sys.argv or os.environ.get("IA2P_BENCH_QUALITY", "1") == "1":
        from instructany2pix_tpu.codecs import image_io
        from instructany2pix_tpu.utils import clip_score as cs_lib

        towers = cs_lib.load_scoring_clip("ckpts")
        if towers is None:
            towers = cs_lib.make_tiny_scoring_clip()
            log("quality: no full CLIP checkpoint under ckpts/ — using "
                "the tiny-dims regression pin")
        clip_is_pin = bool(towers.get("tiny_pin"))
        caption = "an antique shop with a grandfather clock"

        def score_image(img_arr):
            t_emb = cs_lib.clip_text_embed(
                towers["text_params"], towers["text_cfg"],
                towers["tokenizer"], [caption],
            )
            v_emb = cs_lib.clip_image_embed(
                towers["vision_params"], towers["vision_cfg"], [img_arr]
            )
            return float(100.0 * jnp.sum(t_emb * v_emb))

        # determinism: re-execute the refiner graph and decode again —
        # identical output bytes tie the pin to the edit result, not to
        # a lucky sampling of nondeterministic kernels
        img_out = image_io.from_model_range(
            np.asarray(vae_dec(vae_p, rlat)[0].astype(jnp.float32))
        )
        # key(24) matches the rlat the pin scores — the timing reps above
        # run key(25), and re-executing with that key made this check
        # compare two DIFFERENT noise draws (always-false determinism)
        rlat2 = refiner_fn(
            ref_p, lat_out, jax.random.key(24), rctx, rctx_n, rpooled,
            rpooled_n, rtid,
        )
        img_out2 = image_io.from_model_range(
            np.asarray(vae_dec(vae_p, rlat2)[0].astype(jnp.float32))
        )
        clip_det = bool(np.array_equal(img_out, img_out2))
        clip_raw = score_image(img_out)
        kind = "tiny-pin" if clip_is_pin else "ViT-H"
        log(f"quality: CLIP-score raw ({kind}) {clip_raw:.2f}; "
            f"deterministic={clip_det}")

    # ------------------------------------------------------ early report
    # The composed-stage payload prints BEFORE the (potentially long)
    # wall-clock section so a driver timeout can never erase the round's
    # canonical number again (VERDICT r4 item 1). If the wall section
    # completes, a superset payload prints as the final line — parsers
    # taking either the first or the last JSON line get a valid payload.
    total = sum(stage_s.values())
    log("--- stage breakdown (s) ---")
    for k, v in stage_s.items():
        log(f"  {k:>16}: {v:.3f}")
    log(f"  {'TOTAL e2e':>16}: {total:.3f}")
    payload = {
        "metric": f"e2e_50step_{size}px_edit_latency",
        "value": round(total, 3),
        "unit": "s",
        "vs_baseline": round(2.0 / total, 3),
        "stages": {k: round(v, 3) for k, v in stage_s.items()},
        "llm_quant": quant,
    }
    if clip_raw is not None:
        payload["clip_score_raw"] = round(clip_raw, 2)
        payload["clip_deterministic"] = clip_det
        if not clip_is_pin:
            payload["clip_score"] = round(max(clip_raw, 0.0), 2)
    if wall_skip is not None:
        payload["wall_skipped"] = wall_skip
    _wd_disarm()
    print(json.dumps(payload), flush=True)

    # ------------------------------------------------- wall-clock edit
    # ONE complete edit through the REAL InstructAny2PixPipeline.__call__
    # — weight staging, host transfers, tokenization, file IO and
    # orchestration included (the reference's unit of work is one
    # __call__, reference pipeline.py:303-386). The composed stage sum
    # above times bench-private graphs; this times the product path.
    if wall_on:
        # Re-arm for the wall section: on a stall the already-complete
        # composed payload reprints (with a wall_stalled marker) as the
        # final line instead of the process dying payload-less at the
        # driver's cap. Budget covers staging (link-probe-gated above),
        # compiles, and two full edits.
        _wd_arm(
            float(os.environ.get("IA2P_BENCH_WALL_DEADLINE_S", "1800")),
            lambda: {**payload, "wall_stalled": True},
            "wall-clock section exceeded deadline",
        )
        if wall_mode == "resident":
            # int8-linear the diffusion stack ON DEVICE before pulling
            # host copies: resident totals ≈12.9 GB (zero swaps) and the
            # tunnel copies halve (UNet int8 linears measured −2.7% step
            # time vs bf16, BASELINE.md r2)
            from instructany2pix_tpu.ops.quant import quantize_linears

            unet_p = quantize_linears(unet_p, free_originals=True)
            ref_p = quantize_linears(ref_p, free_originals=True)
            t2_p = quantize_linears(t2_p, free_originals=True)
            pt_p = quantize_linears(pt_p, free_originals=True)
            prior_p = quantize_linears(prior_p, free_originals=True)
        host["unet"] = to_host(unet_p)
        host["refiner"] = to_host(ref_p)
        host["vae"] = to_host(vae_p)
        host["text1"] = to_host(t1_p)
        host["text2"] = to_host(t2_p)
        host["prior_text"] = to_host(pt_p)
        host["prior"] = to_host(prior_p)
        host["image_proj"] = to_host(ip_p)
        for p in (unet_p, ref_p, vae_p, t1_p, t2_p, pt_p, prior_p, ip_p):
            free(p)
        wall, warm_img = bench_wallclock(host, size, quant, mode=wall_mode)
        payload.update(wall)
        if warm_img is not None and score_image is not None:
            # the SAME pin through the PRODUCT path (__call__ output
            # bytes), not only the bench-private graphs (VERDICT r4
            # item 7) — in resident mode the delta vs clip_score_raw is
            # the int8-stack quality shift
            payload["clip_score_raw_product"] = round(
                score_image(np.asarray(warm_img)), 2
            )
        _wd_disarm()
        _WD["done"] = True
        print(json.dumps(payload), flush=True)


if __name__ == "__main__":
    main()
