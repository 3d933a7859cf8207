"""Verify: drive InstructAny2PixPipeline end-to-end on the real TPU."""
import time
import numpy as np
from PIL import Image
import jax

t0 = time.time()
def lap(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)

print("backend:", jax.default_backend(), jax.devices())
from instructany2pix_tpu import InstructAny2PixPipeline
from instructany2pix_tpu.pipeline import preprocess_mm_data

lap("building tiny pipeline")
pipe = InstructAny2PixPipeline(tiny=True, seed=0)
lap("built")

rs = np.random.RandomState(0)
Image.fromarray(rs.randint(0, 255, (96, 80, 3), np.uint8)).save("/tmp/v_img1.png")
Image.fromarray(rs.randint(0, 255, (70, 120, 3), np.uint8)).save("/tmp/v_img2.png")
media = preprocess_mm_data([
    {"type": "image", "fname": "/tmp/v_img1.png"},
    {"type": "audio", "fname": "clock.wav", "embed": rs.randn(16).astype(np.float32)},
])

# probe: llm_only
a, b, cap = pipe("describe <video>", media, llm_only=True)
lap(f"llm_only -> caption ({len(cap)} chars), a/b None: {a is None, b is None}")

# full edit
for seed in range(4):
    out = pipe("add <video> to <video>", media, num_inference_steps=2,
               refinement=0.5, seed=seed)
    if out[0] is not None:
        lap(f"seed {seed}: full edit OK shapes {out[0].shape} {out[1].shape} msg={out[2]}")
        Image.fromarray(out[0]).save("/tmp/v_out.png")
        break
    else:
        lap(f"seed {seed}: caption-only ({out[2][:30]!r})")
else:
    print("NOTE: random tiny LLM emitted no gen tokens in 4 seeds")

# probe: debug dict + cache reuse
out = pipe("add <video> to <video>", media, num_inference_steps=2, refinement=0.0,
           debug=True, use_cache=True, subject_strength=0.0)
if out[0] is not None:
    lap(f"debug keys: {sorted(out[2].keys())}")
else:
    lap("debug run: caption-only branch")

# probe: three-image input, base selection via cosine
media3 = media + [{"type": "image", "fname": "/tmp/v_img2.png"}]
r = pipe.forward_llm("merge <video> <video> <video>", media3)
lap(f"3-input forward_llm: base={r[3]}, caption={str(r[2])[:40]!r}")

# probe: subject consistency path with fallback grounder
out = pipe("add <video> to <video>", media, num_inference_steps=2, refinement=0.0,
           subject_strength=0.7, use_cache=True)
lap(f"subject-strength run: {'image' if out[0] is not None else 'caption-only'}")
print("DONE")
