import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from instructany2pix_tpu.grounding import sam as S
from instructany2pix_tpu.core.prng import KeyChain
from benchmarks.timing import roundtrip, bench_loop

rt = roundtrip()
cfg = S.SAMConfig.vit_h()
kc = KeyChain(jax.random.PRNGKey(0))
x = jax.random.normal(jax.random.key(1), (1, 64, 64, 1280), jnp.bfloat16)

for is_global in (False, True):
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                     S._enc_block_init(kc, cfg, is_global))
    fn = lambda x, p: S._enc_block(p, x, cfg, is_global)
    t = bench_loop(fn, (x, p), iters=30, rt=rt)
    n = 4 if is_global else 28
    print(f"{'global' if is_global else 'window'} block: {t*1e3:7.2f} ms x{n} = {t*n*1e3:6.1f} ms", flush=True)
