"""Build a full-size converted orbax root with random weights.

No real checkpoints ship in this environment (/root/reference/ckpts is
a placeholder), so the warm-boot measurement (VERDICT r4 item 6 —
restore + compile to first edit, staging attributed) uses a root that
is byte-for-byte the SHAPE of `scripts/convert_checkpoints.py --bf16
--quant-llm int4 --quant-stack` output: int4-grouped fused LLM, int8
linears across the diffusion stack, bf16 elsewhere. IO and compile cost
don't depend on the weight values.

Usage:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
            python benchmarks/make_root.py --out .bench_root
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def fill_random(shapes_tree, rng) -> dict:
    """Leaves of eval_shape → numpy bf16 (cheap single-core fill)."""
    return jax.tree.map(
        lambda s: jnp.asarray(
            rng.standard_normal(s.shape, dtype=np.float32).astype(np.float32)
            * 0.02,
            jnp.bfloat16,
        ),
        shapes_tree,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".bench_root")
    args = ap.parse_args()

    from instructany2pix_tpu.core import checkpoint as ckpt_lib
    from instructany2pix_tpu.core.prng import KeyChain
    from instructany2pix_tpu.llm import multimodal as mm_lib
    from instructany2pix_tpu.models import clip as clip_lib
    from instructany2pix_tpu.models import imagebind as ib
    from instructany2pix_tpu.models import llama as llama_lib
    from instructany2pix_tpu.models import unet as unet_lib
    from instructany2pix_tpu.models import vae as vae_lib
    from instructany2pix_tpu.diffusion import ip_adapter as ipa
    from instructany2pix_tpu.ops import quant as Q
    from instructany2pix_tpu.pipeline import PipelineConfig, _audio_patches

    cfg = PipelineConfig()
    cfg_llm = mm_lib.Any2PixLMConfig()
    rng = np.random.default_rng(0)
    os.makedirs(args.out, exist_ok=True)

    def shapes(f):
        return jax.eval_shape(f, jax.random.key(0))

    def emit(name, params):
        t0 = time.perf_counter()
        ckpt_lib.save(os.path.join(args.out, name), params)
        n = sum(x.size for x in jax.tree.leaves(params))
        print(f"  {name}: {n / 1e6:.1f}M params saved "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)

    # LLM: int4-grouped quantized + fused projections + bf16 heads
    print("building llm (int4-grouped, fused) ...", flush=True)
    llama_p = fill_random(
        shapes(lambda k: llama_lib.init(k, llama_lib.LlamaConfig.vicuna_7b())),
        rng,
    )
    llama_p = Q.quantize_llama(llama_p, bits=4, free_originals=True)
    llama_p = llama_lib.fuse_projections(llama_p)
    kc = KeyChain(jax.random.key(1))
    d = cfg_llm.llama.hidden_size
    llm = {
        "llama": llama_p,
        "vae_projector_image": mm_lib._projector_init(kc, cfg_llm.image_codec_dim, d),
        "vae_projector_audio": mm_lib._projector_init(kc, cfg_llm.audio_codec_dim, d),
        "vae_predictor_image": mm_lib._predictor_init(kc, d, cfg_llm.image_codec_dim),
        "vae_predictor_audio": mm_lib._predictor_init(kc, d, cfg_llm.audio_codec_dim),
    }
    emit("llm", llm)
    del llm, llama_p

    # diffusion stack: int8 linears (the resident-mode artifact)
    for name, f in (
        ("unet", lambda k: unet_lib.init(k, cfg.unet)),
        ("refiner", lambda k: unet_lib.init(k, cfg.refiner)),
        ("vae", lambda k: vae_lib.init(k, cfg.vae)),
        ("text1", lambda k: clip_lib.text_init(k, cfg.text1)),
        ("text2", lambda k: clip_lib.text_init(k, cfg.text2)),
        ("prior_text", lambda k: clip_lib.text_init(k, cfg.prior_text)),
        ("imagebind_vision", lambda k: ib.init(k, cfg.imagebind_vision)),
        ("imagebind_audio", lambda k: ib.init(
            k, cfg.imagebind_audio,
            num_patches=_audio_patches(cfg.imagebind_audio))),
    ):
        print(f"building {name} (int8 linears) ...", flush=True)
        p = fill_random(shapes(f), rng)
        if name != "vae":
            p = Q.quantize_linears(p, free_originals=True)
        emit(name, p)
        del p

    from instructany2pix_tpu.prior import model as prior_lib

    print("building prior ...", flush=True)
    p = fill_random(shapes(lambda k: prior_lib.init(k, cfg.prior)), rng)
    emit("prior", Q.quantize_linears(p, free_originals=True))

    # ip_adapter: stored split like convert_checkpoints (image_proj +
    # per-layer ip attn weights merged at load)
    print("building ip_adapter ...", flush=True)
    ip_proj = fill_random(shapes(lambda k: ipa.init(k, cfg.image_proj)), rng)
    # the unet above was initialized with_ip=True, so its to_k_ip/
    # to_v_ip leaves already exist — no separate ip_attn dict to merge
    emit("ip_adapter", {"image_proj": ip_proj})
    print("done:", args.out)


if __name__ == "__main__":
    main()
