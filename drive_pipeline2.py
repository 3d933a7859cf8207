"""Verify the full diffusion branch: seed pipe.cache (public use_cache
semantics, reference pipeline.py:151-153/311) so the edit graph runs."""
import time
import numpy as np
from PIL import Image
import jax, jax.numpy as jnp

t0 = time.time()
def lap(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)

from instructany2pix_tpu import InstructAny2PixPipeline
pipe = InstructAny2PixPipeline(tiny=True, seed=0)
lap("pipeline built")

rs = np.random.RandomState(0)
Image.fromarray(rs.randint(0, 255, (96, 80, 3), np.uint8)).save("/tmp/v_img1.png")
media = [{"type": "image", "fname": "/tmp/v_img1.png"}]
d = pipe.cfg.llm.image_codec_dim
pipe.cache = (
    jnp.asarray(rs.randn(1, d), jnp.float32),      # image_embeds
    jnp.asarray(rs.randn(d), jnp.float32),         # base_embed
    "a cat on a chair",                            # caption
    "/tmp/v_img1.png",                             # base image path
    dict(all_objs=["cat"], extra_embeds=rs.randn(1, d).astype(np.float32),
         extra_idx=np.array([0])),
)
non_refined, refined, msg = pipe("edit", media, use_cache=True,
                                 num_inference_steps=3, refinement=0.5, seed=0)
lap(f"full edit: {non_refined.shape} {refined.shape} msg={msg}")
assert non_refined.shape == (64, 64, 3) and refined.shape == (64, 64, 3)
assert np.asarray(non_refined).std() > 0, "degenerate output"
Image.fromarray(non_refined).save("/tmp/v_nonrefined.png")
Image.fromarray(refined).save("/tmp/v_refined.png")

# probe: subject consistency (fallback grounder + box segmentor + inpaint UNet)
non2, ref2, msg2 = pipe("edit", media, use_cache=True, num_inference_steps=2,
                        refinement=0.0, subject_strength=0.7, seed=1, debug=True)
lap(f"subject-consistency edit ran; debug keys: {sorted(k for k in msg2)}")
assert msg2["annotations"] is not None
lap(f"annotations: {msg2['annotations']['phrases']}")

# probe: steps=1 edge
o = pipe("edit", media, use_cache=True, num_inference_steps=1, refinement=0.0, seed=2)
lap(f"steps=1 edit ok: {o[0].shape}")
print("DONE")
