"""Demo: instruction-driven edit (script form of the reference's demo
notebooks, which ship as missing LFS blobs — reference
.MISSING_LARGE_BLOBS).

With real checkpoints under ckpts/ this runs the full-quality model;
without, it runs the tiny random-weight pipeline so the end-to-end
graph is demonstrable anywhere.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from instructany2pix_tpu import InstructAny2PixPipeline
from instructany2pix_tpu.codecs.image_io import save_image
from instructany2pix_tpu.utils.profiling import collect_stages


def main():
    pipe = InstructAny2PixPipeline()
    print(f"pipeline mode: {'tiny/random' if pipe.tiny else 'full checkpoints'}")

    # the reference's worked example: antique shop + clock ticking
    # (reference serve.py:48-56) — markers rewritten to <video>
    instruction = "add <video> to <video>"
    from PIL import Image

    os.makedirs("/tmp/demo", exist_ok=True)
    rs = np.random.RandomState(0)
    img_path = "/tmp/demo/antique_shop.png"
    Image.fromarray(rs.randint(0, 255, (128, 128, 3), np.uint8)).save(img_path)
    mm_data = [
        {"type": "image", "fname": img_path},
        # audio conditioning via a precomputed ImageBind embedding
        {"type": "audio", "fname": "clock_ticking.wav",
         "embed": rs.randn(pipe.cfg.llm.image_codec_dim).astype(np.float32)},
    ]

    with collect_stages() as stages:
        non_refined, refined, msg = pipe(
            instruction, mm_data, num_inference_steps=4, refinement=0.5, seed=42
        )
    print("stage times:", stages)
    if non_refined is None:
        print("LLM returned caption only:", msg)
        return
    save_image("/tmp/demo/edit.png", non_refined)
    save_image("/tmp/demo/edit_refined.png", refined)
    print("saved /tmp/demo/edit.png and /tmp/demo/edit_refined.png —", msg)


if __name__ == "__main__":
    main()
