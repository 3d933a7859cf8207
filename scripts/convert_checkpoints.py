"""One-time torch→orbax checkpoint conversion CLI.

Sweeps the reference's released checkpoint layout (reference
pipeline.py:96-147: `ckpts/<llm_folder>` HF dir, `ckpts/prior/model.bin`,
SDXL diffusers dirs, `ckpts/sdxl/ip_adapter_global_local_2_view.bin`,
`ckpts/imagebind_huge.pth`, `ckpts/gdino/*`) through the per-model
converters once and writes orbax checkpoints — subsequent pipeline
startups restore sharded arrays directly instead of re-parsing torch
pickles (the converter tool SURVEY.md §5.4 requires).

Usage:
  python scripts/convert_checkpoints.py --ckpt ckpts --llm-folder llm-retrained \
      --out ckpts-orbax [--bf16] [--quant-llm int4|int4pc|int8] \
      [--only llm,prior,sdxl,ip,imagebind,gdino]

Per-component subdirectories are written under --out; `--quant-llm`
bakes weight-only quantization into the stored LLM (ops/quant.py — the
counterpart of the reference's bitsandbytes 4-bit load, pipeline.py:30).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp


def _cast_bf16(params):
    import jax

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.asarray(x, jnp.bfloat16)
        return jnp.asarray(x)

    return jax.tree.map(cast, params)


def main(argv=None, cfg=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="ckpts", help="reference checkpoint root")
    ap.add_argument("--llm-folder", default="llm-retrained")
    ap.add_argument("--out", required=True, help="orbax output root")
    ap.add_argument("--bf16", action="store_true", help="cast floats to bf16")
    ap.add_argument("--quant-llm", choices=["int8", "int4", "int4pc"], default=None)
    ap.add_argument(
        "--quant-stack", action="store_true",
        help="int8 weight-only linears across the diffusion stack "
        "(UNet/refiner/text encoders/prior/ImageBind) — with --quant-llm "
        "int4 the whole pipeline fits one 16 GB chip resident, zero "
        "per-edit staging (VERDICT r4 item 2; int8 UNet linears measured "
        "-2.7%% step time, BASELINE.md r2)",
    )
    ap.add_argument(
        "--only", default="llm,prior,sdxl,ip,imagebind,gdino",
        help="comma list of component groups to convert",
    )
    args = ap.parse_args(argv)
    only = set(args.only.split(","))

    from instructany2pix_tpu import loaders
    from instructany2pix_tpu.core import checkpoint as ckpt_lib
    from instructany2pix_tpu.models import clip as clip_lib
    from instructany2pix_tpu.models import unet_convert
    from instructany2pix_tpu.pipeline import PipelineConfig

    # `cfg` override: tests convert tiny fixture trees in-process
    cfg = cfg or PipelineConfig()
    os.makedirs(args.out, exist_ok=True)

    # groups whose linears go int8 under --quant-stack (vae is convs;
    # image_proj is small and shape-sensitive to the 2-view contract)
    _STACK = {
        "unet", "refiner", "text1", "text2", "prior_text", "prior",
        "imagebind_vision", "imagebind_audio",
    }

    def emit(name, params):
        if args.bf16:
            params = _cast_bf16(params)
        if args.quant_stack and name in _STACK:
            from instructany2pix_tpu.ops import quant as quant_lib

            params = quant_lib.quantize_linears(params)
        path = os.path.join(args.out, name)
        ckpt_lib.save(path, params)
        n = sum(x.size for x in __import__("jax").tree.leaves(params))
        print(f"  {name}: {n / 1e6:.1f}M params -> {path}")

    # tokenizers ride along so the orbax root boots self-contained
    # (pipeline.__init__ reads them from the same relative paths)
    import shutil

    for rel in (
        os.path.join(args.llm_folder, "tokenizer"),
        os.path.join("sdxl-base", "tokenizer"),
        os.path.join("sdxl-base", "tokenizer_2"),
        os.path.join("clip-vit-h", "tokenizer"),
    ):
        src = os.path.join(args.ckpt, rel)
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(args.out, rel), dirs_exist_ok=True)

    if "llm" in only:
        print("converting LLM ...")
        llm = loaders.load_llm(os.path.join(args.ckpt, args.llm_folder))
        if args.quant_llm:
            from instructany2pix_tpu.models import llama as llama_lib
            from instructany2pix_tpu.ops import quant as quant_lib

            llm["llama"] = quant_lib.quantize_llama(
                _cast_bf16(llm["llama"]) if args.bf16 else llm["llama"],
                bits=8 if args.quant_llm == "int8" else 4,
                int4_grouped=(args.quant_llm != "int4pc"),
            )
            llm["llama"] = llama_lib.fuse_projections(llm["llama"])
        emit("llm", llm)

    if "prior" in only:
        print("converting prior ...")
        emit("prior", loaders.load_prior(os.path.join(args.ckpt, "prior", "model.bin")))

    if "sdxl" in only:
        print("converting SDXL base/refiner/VAE/text encoders ...")
        sdxl_dir = os.path.join(args.ckpt, "sdxl-base")
        emit("unet", unet_convert.load_unet(os.path.join(sdxl_dir, "unet"), cfg.unet))
        emit("vae", unet_convert.load_vae(os.path.join(sdxl_dir, "vae"), cfg.vae))
        emit("text1", clip_lib.convert_text_from_hf(
            loaders._load_sharded_hf(os.path.join(sdxl_dir, "text_encoder"))))
        emit("text2", clip_lib.convert_text_from_hf(
            loaders._load_sharded_hf(os.path.join(sdxl_dir, "text_encoder_2"))))
        emit("refiner", unet_convert.load_unet(
            os.path.join(args.ckpt, "sdxl-refiner", "unet"), cfg.refiner))
        emit("prior_text", clip_lib.convert_text_from_hf(
            loaders._load_sharded_hf(os.path.join(args.ckpt, "clip-vit-h"))))

    if "ip" in only:
        print("converting IP-Adapter ...")
        ip = loaders.load_ip_adapter(
            os.path.join(args.ckpt, "sdxl", "ip_adapter_global_local_2_view.bin"),
            unet_convert.cross_attn_paths(cfg.unet),
        )
        emit("ip_adapter", ip)

    if "imagebind" in only:
        print("converting ImageBind ...")
        from instructany2pix_tpu.models import imagebind as ib

        ib_sd = ckpt_lib.load_torch_state_dict(
            os.path.join(args.ckpt, "imagebind_huge.pth"))
        emit("imagebind_vision", ib.convert_from_imagebind(ib_sd, "vision"))
        emit("imagebind_audio", ib.convert_from_imagebind(ib_sd, "audio"))

    if "gdino" in only:
        print("converting GroundingDINO + SAM ...")
        from instructany2pix_tpu.grounding import gdino as gdino_lib
        from instructany2pix_tpu.grounding import sam as sam_lib

        sam_path = os.path.join(args.ckpt, "gdino", "sam_vit_h_4b8939.pth")
        dino_path = os.path.join(args.ckpt, "gdino", "gdino.pth")
        if os.path.exists(sam_path):
            scfg = sam_lib.SAMConfig.vit_h()
            emit("sam", sam_lib.convert_from_sam(sam_path, scfg))
        else:
            print("  sam skipped: no checkpoint")
        if os.path.exists(dino_path):
            dcfg = gdino_lib.GDinoConfig.swint()
            emit("gdino", gdino_lib.convert_from_torch(dino_path, dcfg))
        else:
            print("  gdino skipped: no checkpoint")

    print("done.")


if __name__ == "__main__":
    main()
