"""LLM decode throughput on TPU: ~1.1B-param llama config, bf16."""
import time
import jax, jax.numpy as jnp
from instructany2pix_tpu.models import llama
from instructany2pix_tpu.llm import generate as gen_lib

cfg = llama.LlamaConfig(
    vocab_size=32009, hidden_size=2048, intermediate_size=5632,
    num_layers=22, num_heads=16, num_kv_heads=16, max_seq_len=2048,
)
params = llama.init(jax.random.key(0), cfg)
for k in list(params):
    params[k] = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params[k])
    jax.block_until_ready(params[k])
from instructany2pix_tpu.core.tree import param_count
print(f"params: {param_count(params)/1e9:.2f}B", flush=True)

ids = jnp.ones((1, 256), jnp.int32)
emb = llama.embed(params, ids)
t0 = time.perf_counter()
res = gen_lib.generate(params, cfg, emb, jax.random.key(1),
                       max_new_tokens=64, temperature=0.3, eos_id=-1, bucket=256)
host = float(jnp.sum(res.hiddens.astype(jnp.float32)))
print(f"compile+first gen (256 prompt + 64 tok): {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
n = 3
for i in range(n):
    res = gen_lib.generate(params, cfg, emb, jax.random.key(i),
                           max_new_tokens=64, temperature=0.3, eos_id=-1, bucket=256)
    host = float(jnp.sum(res.hiddens.astype(jnp.float32)))
dt = (time.perf_counter() - t0) / n
print(f"gen 64 tokens: {dt*1e3:.0f} ms -> {64/dt:.1f} tok/s decode (incl prefill+sync)", flush=True)
