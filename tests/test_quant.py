"""int8/int4 weight-only quantization (ops/quant.py) — the TPU
counterpart of the reference's bitsandbytes 4-bit LLM loading
(reference pipeline.py:30)."""

import jax
import jax.numpy as jnp
import numpy as np

from instructany2pix_tpu.models import layers as L
from instructany2pix_tpu.models import llama
from instructany2pix_tpu.ops import quant as Q


def test_int8_roundtrip_error_bounded():
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(64, 32).astype(np.float32))
    q = Q.quantize_weight(w)
    assert q["w_q"].dtype == jnp.int8 and q["w_q"].shape == w.shape
    deq = Q.dequantize_weight(q)
    err = np.abs(np.asarray(deq - w))
    amax = np.abs(np.asarray(w)).max(axis=0)
    assert (err <= amax / 127.0 * 0.51 + 1e-6).all()  # half-step rounding


def test_int4_pack_unpack_exact():
    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.randint(-7, 8, (16, 8)).astype(np.int8))
    # even/odd interleaved packing: row 2i low nibble, row 2i+1 high —
    # the layout pltpu.bitcast(…, int4) restores to original row order
    lo = q[0::2] & 0x0F
    hi = (q[1::2] & 0x0F) << 4
    packed = (lo | hi).astype(jnp.int8)
    np.testing.assert_array_equal(
        np.asarray(Q._pack_nibbles(q)), np.asarray(packed)
    )
    unpacked = Q.unpack_int4(packed)
    np.testing.assert_array_equal(np.asarray(unpacked), np.asarray(q))


def test_pallas_qmatmul_matches_dequant():
    rs = np.random.RandomState(3)
    w = jnp.asarray(rs.randn(64, 128).astype(np.float32))
    x = jnp.asarray(rs.randn(2, 64).astype(np.float32))
    q8 = Q.quantize_weight(w)
    np.testing.assert_allclose(
        np.asarray(Q.pallas_qmatmul(x, q8)),
        np.asarray(x @ Q.dequantize_weight(q8)),
        atol=1e-3, rtol=1e-3,
    )
    q4 = Q.quantize_weight_int4(w)
    np.testing.assert_allclose(
        np.asarray(Q.pallas_qmatmul(x, q4)),
        np.asarray(Q.int4_matmul(x, q4)),
        atol=1e-3, rtol=1e-3,
    )


def test_linear_dispatches_on_quantized_params():
    rs = np.random.RandomState(2)
    p = {"w": jnp.asarray(rs.randn(32, 16).astype(np.float32)),
         "b": jnp.asarray(rs.randn(16).astype(np.float32))}
    x = jnp.asarray(rs.randn(4, 32).astype(np.float32))
    ref = L.linear(p, x)
    q8 = {**Q.quantize_weight(p["w"]), "b": p["b"]}
    got8 = L.linear(q8, x)
    # int8: ~0.4% weight error → small output error
    assert np.abs(np.asarray(got8 - ref)).max() < 0.15 * np.abs(np.asarray(ref)).max() + 0.05
    q4 = {**Q.quantize_weight_int4(p["w"]), "b": p["b"]}
    got4 = L.linear(q4, x)
    assert np.isfinite(np.asarray(got4)).all()
    # int4 error is larger but bounded
    assert np.abs(np.asarray(got4 - ref)).max() < 0.6 * np.abs(np.asarray(ref)).max() + 0.3


def test_quantize_llama_generates_close_tokens():
    """Greedy generation from an int8-quantized tiny llama matches the
    fp model on a short horizon (weight error is sub-quantization-step)."""
    from instructany2pix_tpu.llm import generate as gen_lib

    cfg = llama.LlamaConfig.tiny()
    params = llama.init(jax.random.key(0), cfg)
    qparams = Q.quantize_llama(params)
    # every decoder linear got quantized, embeddings untouched
    assert "w_q" in qparams["layer_0"]["q"] and "w" not in qparams["layer_0"]["q"]
    assert "w" in qparams["embed_tokens"]
    ids = jnp.asarray([[1, 5, 9, 20]])
    emb = llama.embed(params, ids)
    a = gen_lib.generate(params, cfg, emb, jax.random.key(0),
                         max_new_tokens=4, temperature=0.0, eos_id=2, max_len=16)
    b = gen_lib.generate(qparams, cfg, emb, jax.random.key(0),
                         max_new_tokens=4, temperature=0.0, eos_id=2, max_len=16)
    # logits shift slightly; first greedy token should agree
    assert int(a.tokens[0, 0]) == int(b.tokens[0, 0])


def test_int4_grouped_roundtrip_and_quality():
    """Blockwise (group-128) int4: exact pack/unpack bookkeeping, and
    materially lower error than per-channel int4 on outlier-heavy
    weights (the reason bnb-NF4/GPTQ/AWQ all use blockwise scales)."""
    rs = np.random.RandomState(7)
    w = rs.randn(512, 128).astype(np.float32)
    w[13, :] *= 50.0  # one outlier row poisons per-channel scales
    w = jnp.asarray(w)
    qg = Q.quantize_weight_int4_grouped(w, group=128)
    assert qg["w_q4"].shape == (256, 128) and qg["gscale"].shape == (4, 128)
    err_g = np.abs(np.asarray(Q.dequantize_weight_int4_grouped(qg) - w))
    qc = Q.quantize_weight_int4(w)
    wc = Q.unpack_int4(qc["w_q4"]).astype(jnp.float32) * qc["scale"][None]
    err_c = np.abs(np.asarray(wc - w))
    # exclude the outlier row itself; everywhere else grouped is much tighter
    mask = np.ones(512, bool); mask[13] = False
    # outlier poisons only 1 of 4 scale groups instead of every column
    assert err_g[mask].mean() < 0.5 * err_c[mask].mean()


def test_pallas_qmatmul_grouped_matches_xla():
    rs = np.random.RandomState(8)
    w = jnp.asarray(rs.randn(512, 256).astype(np.float32))
    x = jnp.asarray(rs.randn(3, 512).astype(np.float32))
    qg = Q.quantize_weight_int4_grouped(w, group=128)
    got = Q.pallas_qmatmul(x, qg)
    ref = Q.int4_matmul(x, qg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3, rtol=1e-3)


def test_quantize_tree_bits4_prefers_grouped():
    p = {"proj": {"w": jnp.asarray(np.random.RandomState(9).randn(256, 128), jnp.float32)}}
    q = Q.quantize_tree(p, should_quantize=lambda _: True, bits=4)
    assert "gscale" in q["proj"] and "w_q4" in q["proj"]


def test_fuse_projections_preserves_forward():
    """fuse_projections (qkv + gate_up concat) is semantics-preserving
    on float and quantized trees."""
    cfg = llama.LlamaConfig.tiny()
    params = llama.init(jax.random.key(0), cfg)
    ids = jnp.asarray([[1, 5, 9, 20]])
    ref = llama.forward(params, cfg, input_ids=ids)["logits"]

    fused = llama.fuse_projections(params)
    assert "qkv" in fused["layer_0"] and "q" not in fused["layer_0"]
    got = llama.forward(fused, cfg, input_ids=ids)["logits"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)

    qfused = llama.fuse_projections(Q.quantize_llama(params))
    assert "w_q" in qfused["layer_0"]["qkv"]
    qref = llama.forward(Q.quantize_llama(params), cfg, input_ids=ids)["logits"]
    qgot = llama.forward(qfused, cfg, input_ids=ids)["logits"]
    np.testing.assert_allclose(np.asarray(qgot), np.asarray(qref), atol=1e-4, rtol=1e-4)


def test_int4_skips_lane_unaligned_weights():
    """bits=4 falls back to int8 where the Pallas kernel can't run
    (odd N like the 32009-wide vocab head) — never the slow XLA unpack."""
    p = {"head": {"w": jnp.ones((64, 130), jnp.float32)},
         "proj": {"w": jnp.ones((64, 128), jnp.float32)}}
    q = Q.quantize_tree(p, should_quantize=lambda _: True, bits=4)
    assert "w_q" in q["head"] and "w_q4" not in q["head"]
    assert "w_q4" in q["proj"]


def test_quantized_param_size_halves():
    cfg = llama.LlamaConfig.tiny()
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), llama.init(jax.random.key(0), cfg)
    )
    def nbytes(t):
        return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(t))
    q = Q.quantize_llama(params)
    lin_before = nbytes(params["layer_0"]["q"])
    lin_after = nbytes({k: v for k, v in q["layer_0"]["q"].items() if k == "w_q"})
    assert lin_after <= lin_before * 0.55


def test_quantized_linear_applies_lora():
    """LoRA factors survive quantization (the early-return path must not
    drop them — r2 review fix)."""
    rs = np.random.RandomState(5)
    p = {"w": jnp.asarray(rs.randn(32, 16), jnp.float32)}
    p = L.add_lora(p, jax.random.key(0), rank=4, alpha=4.0)
    p["lora_b"] = jnp.asarray(rs.randn(4, 16) * 0.1, jnp.float32)
    x = jnp.asarray(rs.randn(2, 32), jnp.float32)
    ref_delta = np.asarray(
        (x @ p["lora_a"]) @ p["lora_b"] * p["lora_scale"]
    )
    q = {**Q.quantize_weight(p["w"]),
         "lora_a": p["lora_a"], "lora_b": p["lora_b"], "lora_scale": p["lora_scale"]}
    base = np.asarray(x @ Q.dequantize_weight(q))
    got = np.asarray(L.linear(q, x))
    np.testing.assert_allclose(got, base + ref_delta, atol=1e-4, rtol=1e-4)


def test_fuse_projections_skips_lora_and_mixed_layers():
    """Layers carrying LoRA (or mixed quant formats) stay unfused rather
    than silently dropping the adapters."""
    cfg = llama.LlamaConfig.tiny()
    params = llama.init(jax.random.key(0), cfg)
    params["layer_0"]["q"] = L.add_lora(params["layer_0"]["q"], jax.random.key(1))
    fused = llama.fuse_projections(params)
    assert "qkv" not in fused["layer_0"]  # LoRA on q blocks qkv fusion
    assert "gate_up" in fused["layer_0"]  # untouched projections still fuse
    assert "qkv" in fused["layer_1"]


def test_pallas_qmatmul_long_k_matches():
    """K>8192 (llama `down`-shaped) decode matvecs run at a wider
    block_n under the bits-aware VMEM cap — both formats must still
    match the XLA path at that routing."""
    import jax.numpy as jnp

    rs = np.random.RandomState(0)
    K, N = 11008, 512
    w = jnp.asarray(rs.randn(K, N).astype(np.float32) * 0.02)
    x = jnp.asarray(rs.randn(1, K).astype(np.float32))
    q8 = Q.quantize_weight(w)
    want = (x @ q8["w_q"].astype(x.dtype)) * q8["scale"]
    got = Q.pallas_qmatmul(x, q8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3, rtol=1e-3)

    q4 = Q.quantize_weight_int4(w)
    want4 = Q.int4_matmul(x, q4)
    got4 = Q.pallas_qmatmul(x, q4, interpret=True)
    np.testing.assert_allclose(np.asarray(got4), np.asarray(want4), atol=1e-3, rtol=1e-3)


def test_pallas_qmatmul_fused_prologue_epilogue():
    """The decode-glue fusion kwargs (norm prologue, swiglu pairing,
    residual epilogue — BASELINE.md r4 decode-attribution row) must
    match the composed unfused ops for every quant format."""
    rs = np.random.RandomState(7)
    k, n = 256, 128
    g = jnp.asarray(rs.randn(k).astype(np.float32) * 0.1 + 1.0)
    res = jnp.asarray(rs.randn(2, n).astype(np.float32))
    for quant in (Q.quantize_weight, Q.quantize_weight_int4,
                  Q.quantize_weight_int4_grouped):
        q = quant(jnp.asarray(rs.randn(k, n).astype(np.float32)))
        x = jnp.asarray(rs.randn(2, k).astype(np.float32))
        # norm prologue
        want = Q.pallas_qmatmul(L.rms_norm({"g": g}, x, 1e-6), q)
        got = Q.pallas_qmatmul(x, q, norm_g=g, norm_eps=1e-6)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-3, rtol=2e-3)
        # swiglu pairing: x is the (M, 2K) gate_up pair
        gu = jnp.asarray(rs.randn(2, 2 * k).astype(np.float32))
        want = Q.pallas_qmatmul(L.silu(gu[:, :k]) * gu[:, k:], q)
        got = Q.pallas_qmatmul(gu, q, swiglu=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-3, rtol=2e-3)
        # residual epilogue
        want = Q.pallas_qmatmul(x, q) + res
        got = Q.pallas_qmatmul(x, q, residual=res)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-3, rtol=2e-3)
        # all three together (norm + residual; swiglu is exclusive of
        # norm in the llama block but compose anyway)
        want = Q.pallas_qmatmul(L.rms_norm({"g": g}, x, 1e-6), q) + res
        got = Q.pallas_qmatmul(x, q, norm_g=g, norm_eps=1e-6, residual=res)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-3, rtol=2e-3)


def test_linear_fused_kwargs_all_paths_agree():
    """layers.linear(norm=, swiglu=, residual=) must give the same
    answer through the float path, the XLA quant path, and the Pallas
    kernel path (interpret on CPU)."""
    rs = np.random.RandomState(8)
    k, n = 256, 128
    w = jnp.asarray(rs.randn(k, n).astype(np.float32) * 0.05)
    g = jnp.asarray(rs.randn(k).astype(np.float32) * 0.1 + 1.0)
    x = jnp.asarray(rs.randn(1, 1, k).astype(np.float32))
    res = jnp.asarray(rs.randn(1, 1, n).astype(np.float32))
    pf = {"w": w}
    q4 = Q.quantize_weight_int4_grouped(w)
    ref = L.rms_norm({"g": g}, x, 1e-6) @ w + res
    got_f = L.linear(pf, x, norm=(g, 1e-6), residual=res)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # quant path: compare against the composed ops over the SAME
    # quantized weights (isolates the fusion, not the quant error)
    ref_q = L.linear(q4, L.rms_norm({"g": g}, x, 1e-6)) + res
    got_q = L.linear(q4, x, norm=(g, 1e-6), residual=res)
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(ref_q),
                               atol=2e-3, rtol=2e-3)
    # swiglu through both paths
    gu = jnp.asarray(rs.randn(1, 1, 2 * k).astype(np.float32))
    ref = (L.silu(gu[..., :k]) * gu[..., k:]) @ w
    got_f = L.linear(pf, gu, swiglu=True)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    ref_q = L.linear(q4, L.silu(gu[..., :k]) * gu[..., k:])
    got_q = L.linear(q4, gu, swiglu=True)
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(ref_q),
                               atol=2e-3, rtol=2e-3)


def test_decode_forward_fused_glue_matches_unfused_reference():
    """llama.forward decode step with fused projections + quantized
    weights (the production decode graph, now with in-kernel norm/
    swiglu/residual) vs the bf16 float forward on the same weights."""
    cfg = llama.LlamaConfig.tiny()
    params = llama.init(jax.random.key(0), cfg)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    ids = jnp.asarray([[3, 5, 7, 2, 9, 4]])
    cache = llama.KVCache.create(cfg, 1, 32)
    out_f = llama.forward(params, cfg, input_ids=ids, cache=cache)
    qparams = llama.fuse_projections(
        Q.quantize_llama(params, bits=4)
    )
    out_q = llama.forward(qparams, cfg, input_ids=ids, cache=cache)
    # same argmax trajectory is the meaningful bar at tiny dims
    lf = np.asarray(out_f["logits"].astype(jnp.float32))
    lq = np.asarray(out_q["logits"].astype(jnp.float32))
    corr = np.corrcoef(lf.ravel(), lq.ravel())[0, 1]
    assert corr > 0.98, corr
    # decode one more token through the quantized fused path
    step = llama.forward(
        qparams, cfg, input_ids=ids[:, -1:].at[:].set(1),
        cache=out_q["cache"],
    )
    assert np.isfinite(np.asarray(step["logits"].astype(jnp.float32))).all()


def test_quantize_linears_unet_resident_mode():
    """`quantize_linears` (the single-chip resident mode's memory lever,
    VERDICT r4 item 2) quantizes every UNet linear, leaves convs /
    embeddings / norms alone, and the quantized UNet forward tracks the
    float one (weight-only int8, per-output-channel scales — measured
    −2.7% step time at full SDXL size, BASELINE.md r2)."""
    from instructany2pix_tpu.models import unet as unet_lib

    cfg = unet_lib.UNetConfig.tiny(with_ip=True)
    params = unet_lib.init(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.key(2), (1, 9, cfg.cross_attention_dim))
    pooled = jax.random.normal(jax.random.key(3), (1, cfg.pooled_dim))
    tid = jnp.tile(jnp.array([[512, 512, 0, 0, 512, 512]]), (1, 1))

    ref = unet_lib.apply(
        params, x, jnp.array([500]), ctx, cfg, pooled_text=pooled, time_ids=tid
    )
    q = Q.quantize_linears(params, min_elems=0)

    # structure: attention/ff linears quantized, convs + norms untouched
    def count(tree, key):
        n = 0
        for leaf_path in jax.tree_util.tree_flatten_with_path(tree)[0]:
            if any(getattr(k, "key", None) == key for k in leaf_path[0]):
                n += 1
        return n

    assert count(q, "w_q") > 0
    blk = q["down_1"]["attn_0"]["block_0"]
    assert "w_q" in blk["attn2"]["to_k"] and "w" not in blk["attn2"]["to_k"]
    assert "w" in q["conv_in"] and "w_q" not in q["conv_in"]

    got = unet_lib.apply(
        q, x, jnp.array([500]), ctx, cfg, pooled_text=pooled, time_ids=tid
    )
    assert np.all(np.isfinite(np.asarray(got)))
    # int8 weight error propagates through ~tiny-depth UNet; loose bound
    err = np.abs(np.asarray(got - ref)).mean()
    scale = np.abs(np.asarray(ref)).mean() + 1e-6
    assert err / scale < 0.15, (err, scale)


def test_quantize_linears_skips_embeddings_and_small():
    from instructany2pix_tpu.models import clip as clip_lib

    cfg = clip_lib.CLIPTextConfig.tiny()
    params = clip_lib.text_init(jax.random.key(0), cfg)
    q = Q.quantize_linears(params, min_elems=0)
    # embedding tables keep their float "w" (looked up, never matmul'd)
    assert "w" in q["token_embedding"] and "w_q" not in q["token_embedding"]
    assert "w" in q["position_embedding"]
    # attention / mlp linears quantized
    assert "w_q" in q["layer_0"]["q"] and "w_q" in q["layer_0"]["fc1"]
    ids = jnp.asarray([[1, 4, 9, 2] + [0] * (cfg.max_positions - 4)], jnp.int32)
    ref = clip_lib.text_apply(params, ids, cfg)["last_hidden_state"]
    got = clip_lib.text_apply(q, ids, cfg)["last_hidden_state"]
    assert np.all(np.isfinite(np.asarray(got)))
    rel = np.abs(np.asarray(got - ref)).mean() / (np.abs(np.asarray(ref)).mean() + 1e-6)
    assert rel < 0.2, rel

    # min_elems gate: everything below the floor stays float
    q2 = Q.quantize_linears(params, min_elems=1 << 30)
    assert "w" in q2["layer_0"]["q"] and "w_q" not in q2["layer_0"]["q"]
