"""Measured warm boot from a converted orbax root (VERDICT r4 item 6).

Boots the REAL `InstructAny2PixPipeline` over
`loaders.staged_params_from_root` (lazy per-group restore) with the
persistent compile cache, runs one complete 50-step 512² edit, and
attributes the cold path: per-group disk→device restore seconds
(store.stats.load_s), compile+run remainder, then a warm second edit.
The reference re-quantizes the LLM to NF4 on every boot
(reference pipeline.py:30; r2 measured 64.6 s of quantization alone) —
this artifact restores packed int4 + int8 weights directly.

Run on the real chip after `benchmarks/make_root.py` (or a real
`convert_checkpoints.py --bf16 --quant-llm int4 --quant-stack`) built
the root:   python benchmarks/warm_boot.py [root]
Second invocation measures the compile-cache-warm boot.
"""

import os
import sys
import tempfile
import time
import wave

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

if jax.config.jax_compilation_cache_dir is None:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from PIL import Image

from instructany2pix_tpu import loaders
from instructany2pix_tpu import pipeline as pl
from instructany2pix_tpu.llm import multimodal as mm_lib
from instructany2pix_tpu.utils.profiling import collect_stages


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else ".bench_root"
    budget = float(os.environ.get("IA2P_STAGING_BUDGET", 14.2e9))

    t_start = time.perf_counter()
    cfg = pl.PipelineConfig(image_size=512, llm=mm_lib.Any2PixLMConfig())
    store = loaders.staged_params_from_root(cfg, root, budget_bytes=budget)
    pipe = pl.InstructAny2PixPipeline(
        ckpt=root, params=store, config=cfg, seed=0
    )
    t_ctor = time.perf_counter() - t_start
    print(f"pipeline ctor (tokenizers, no weights): {t_ctor:.2f}s", flush=True)

    tmp = tempfile.mkdtemp()
    img_path = os.path.join(tmp, "in.png")
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (512, 512, 3), np.uint8)
    ).save(img_path)
    wav_path = os.path.join(tmp, "in.wav")
    with wave.open(wav_path, "w") as f:
        f.setnchannels(1); f.setsampwidth(2); f.setframerate(16000)
        f.writeframes(
            np.random.default_rng(1).integers(-3000, 3000, 32000, np.int16)
            .tobytes()
        )
    media = [{"type": "image", "fname": img_path},
             {"type": "audio", "fname": wav_path}]

    # random weights never emit the gen-token pattern: keep the real
    # postprocess cost, pin its return (the bench_wallclock shim)
    rs = np.random.RandomState(7)
    dc = cfg.llm.image_codec_dim
    seeded = (
        jnp.asarray(rs.randn(1, dc), np.float32),
        jnp.asarray(rs.randn(dc), np.float32),
        "a bench caption", img_path,
        dict(all_objs=[], extra_embeds=None, extra_idx=None),
    )
    real_post = pipe._postprocess_llm

    def post(*a, **kw):
        real_post(*a, **kw)
        return seeded

    pipe._postprocess_llm = post

    t0 = time.perf_counter()
    pipe("add the sound of [audio] to [image]", media,
         num_inference_steps=50, refinement=0.5, seed=0)
    first = time.perf_counter() - t0
    restore_s = sum(store.stats["load_s"].values())
    print(f"cold first edit: {first:.1f}s = restore(disk->host->device) "
          f"{restore_s:.1f}s + compile+run {first - restore_s:.1f}s",
          flush=True)
    for k, v in sorted(store.stats["load_s"].items(), key=lambda kv: -kv[1]):
        print(f"    restore {k:>18}: {v:.1f}s", flush=True)
    print(f"  boot-to-first-edit total: {t_ctor + first:.1f}s "
          f"(swaps since: {store.stats['swaps']}, "
          f"{store.stats['swap_bytes'] / 1e9:.1f} GB)", flush=True)

    with collect_stages() as st:
        t0 = time.perf_counter()
        pipe("add the sound of [audio] to [image]", media,
             num_inference_steps=50, refinement=0.5, seed=1)
        warm = time.perf_counter() - t0
    sw = store.stats["swaps"]
    print(f"warm edit: {warm:.2f}s (cumulative swaps {sw}, "
          f"swap_s {store.stats['swap_s']:.2f})", flush=True)
    for k, v in sorted(st.times.items(), key=lambda kv: -kv[1]):
        print(f"    {k:>18}: {v:.3f}s", flush=True)


if __name__ == "__main__":
    main()
