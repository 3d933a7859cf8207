"""Orbax save/restore roundtrip + delta surgery + FSDP sharding specs."""

import jax
import jax.numpy as jnp
import numpy as np

from instructany2pix_tpu.core import checkpoint as ckpt_lib
from instructany2pix_tpu.core.mesh import make_mesh
from instructany2pix_tpu.core import tree as tree_util
from instructany2pix_tpu.parallel import sharding as sh
from instructany2pix_tpu.utils import surgery


def test_orbax_roundtrip(tmp_path, rng):
    from instructany2pix_tpu.models import llama

    cfg = llama.LlamaConfig.tiny()
    params = llama.init(rng, cfg)
    path = str(tmp_path / "ckpt")
    ckpt_lib.save(path, params)
    restored = ckpt_lib.restore(path, like=params)
    tree_util.assert_trees_close(params, restored)


def test_delta_roundtrip_with_resized_embeddings():
    rs = np.random.RandomState(0)
    base = {"embed": {"w": rs.randn(10, 4).astype(np.float32)},
            "layer": {"w": rs.randn(4, 4).astype(np.float32)}}
    fine = {"embed": {"w": rs.randn(13, 4).astype(np.float32)},  # +3 tokens
            "layer": {"w": rs.randn(4, 4).astype(np.float32)}}
    delta = surgery.make_delta(fine, base)
    merged = surgery.apply_delta(delta, base)
    tree_util.assert_trees_close(merged, fine)


def test_torch_statedict_rule_engine(tmp_path):
    import torch

    sd = {"a.weight": torch.randn(3, 5), "a.bias": torch.randn(3)}
    p = tmp_path / "m.bin"
    torch.save(sd, p)
    loaded = ckpt_lib.load_torch_state_dict(str(p))
    tree = ckpt_lib.convert_state_dict(
        loaded,
        [(r"a\.weight", r"a.w", ckpt_lib.linear_w), (r"a\.bias", r"a.b", None)],
    )
    assert tree["a"]["w"].shape == (5, 3)
    np.testing.assert_allclose(tree["a"]["w"], loaded["a.weight"].T)


def test_fsdp_specs_shard_large_replicate_small(mesh8):
    big = jnp.zeros((64, 128))
    tiny = jnp.zeros((4,))
    spec_big = sh.fsdp_spec(big.shape, mesh8)
    spec_tiny = sh.fsdp_spec(tiny.shape, mesh8, min_size=1024)
    assert spec_big != jax.sharding.PartitionSpec()
    assert spec_tiny == jax.sharding.PartitionSpec()
    sharded = sh.shard_params_fsdp({"w": big}, mesh8, min_size=16)
    assert not sharded["w"].sharding.is_fully_replicated


def test_tp_rules_llama(mesh8, rng):
    from instructany2pix_tpu.models import llama

    params = llama.init(rng, llama.LlamaConfig.tiny())
    sharded = sh.apply_tp_rules(params, mesh8, sh.LLAMA_TP_RULES)
    flat = tree_util.flatten(sharded)
    # column-parallel q: output dim sharded over model axis
    q = flat["layer_0.q.w"]
    assert "model" in str(q.sharding.spec)
    # norms replicated
    assert flat["layer_0.input_norm.g"].sharding.is_fully_replicated


def test_tp_rules_quantized_llama_decode_matches(mesh8, rng):
    """Quantized (int4-grouped + tp_rows_int8) decoder TP-shards via the
    extended LLAMA_TP_RULES and generates identically to the unsharded
    tree — the v5e-8 int4 decode deployment path (docs/PERF.md §4)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instructany2pix_tpu.llm import generate as gen_lib
    from instructany2pix_tpu.models import llama
    from instructany2pix_tpu.ops import quant as Q

    # dims sized so column shards divide across 2 model devices and
    # int4 grouping applies (K % 256 == 0)
    cfg = llama.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=4, num_kv_heads=4, max_seq_len=64,
    )
    params = llama.init(rng, cfg)
    qparams = Q.quantize_llama(params, bits=4, tp_rows_int8=True)
    assert "w_q4" in qparams["layer_0"]["q"] and "gscale" in qparams["layer_0"]["q"]
    assert "w_q" in qparams["layer_0"]["o"]  # row-parallel stays int8
    assert "w_q" in qparams["layer_0"]["down"]

    ids = jnp.asarray([[1, 5, 9, 20]])
    emb = llama.embed(qparams, ids)
    ref = gen_lib.generate(qparams, cfg, emb, jax.random.key(0),
                           max_new_tokens=4, temperature=0.0, eos_id=2, max_len=16)

    sharded = sh.apply_tp_rules(qparams, mesh8, sh.LLAMA_TP_RULES)
    flat = tree_util.flatten(sharded)
    assert "model" in str(flat["layer_0.q.w_q4"].sharding.spec)
    assert "model" in str(flat["layer_0.q.gscale"].sharding.spec)
    assert "model" in str(flat["layer_0.o.w_q"].sharding.spec)
    with jax.set_mesh(mesh8):
        got = gen_lib.generate(sharded, cfg, emb, jax.random.key(0),
                               max_new_tokens=4, temperature=0.0, eos_id=2,
                               max_len=16)
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))


def test_tp_rejects_fused_projections(mesh8, rng):
    """ADVICE r2 #1: fused qkv/gate_up trees must be refused by TP
    sharding — a raw column shard crosses q/k/v boundaries."""
    import pytest

    from instructany2pix_tpu.models import llama

    fused = llama.fuse_projections(llama.init(rng, llama.LlamaConfig.tiny()))
    with pytest.raises(ValueError, match="unfused"):
        sh.assert_unfused_for_tp(fused)
    # unfused tree passes
    sh.assert_unfused_for_tp(llama.init(rng, llama.LlamaConfig.tiny()))
