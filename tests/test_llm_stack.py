"""Multimodal LLM layer: splice semantics, losses, generation loop,
conversation templates, tokenizer."""

import jax
import jax.numpy as jnp
import numpy as np

from instructany2pix_tpu.llm import constants as C
from instructany2pix_tpu.llm import generate as gen_lib
from instructany2pix_tpu.llm import multimodal as mm
from instructany2pix_tpu.llm.conversation import conv_templates
from instructany2pix_tpu.llm.tokenizer import ByteTokenizer, initialize_vision_tokenizer
from instructany2pix_tpu.models import llama


def test_vicuna_v1_prompt_format():
    conv = conv_templates["vicuna_v1"].copy()
    conv.append_message(conv.roles[0], "add <video> to <video>")
    conv.append_message(conv.roles[1], None)
    p = conv.get_prompt()
    assert p.startswith("A chat between a curious user")
    assert p.endswith("USER: add <video> to <video> ASSISTANT:")


def test_byte_tokenizer_roundtrip_and_specials():
    tok = ByteTokenizer()
    ids = initialize_vision_tokenizer(tok)
    assert len(ids) == 9
    text = "edit <video> please <im_gen> done"
    enc = tok.encode(text, add_special_tokens=False)
    assert ids["<video>"] in enc and ids["<im_gen>"] in enc
    assert tok.decode(enc) == text
    # ids are stable and beyond the byte range
    assert min(ids.values()) == 259


def test_splice_replaces_video_positions(rng):
    tok = ByteTokenizer()
    tok_ids = initialize_vision_tokenizer(tok)
    cfg = mm.Any2PixLMConfig.tiny(tok_ids)
    params = mm.init(rng, cfg)
    vid = cfg.video_token_id
    ids = jnp.asarray([[1, 7, vid, 9, vid, 11]])
    data = jax.random.normal(jax.random.key(1), (2, cfg.image_codec_dim))
    types = jnp.array([C.REPLACEMENT_TYPE.INPUT, C.REPLACEMENT_TYPE.INPUT])
    emb = mm.splice_input_embeds(params, cfg, ids, data, types)
    plain = llama.embed(params["llama"], ids)
    # non-video positions untouched
    np.testing.assert_allclose(np.asarray(emb[0, 0]), np.asarray(plain[0, 0]))
    np.testing.assert_allclose(np.asarray(emb[0, 3]), np.asarray(plain[0, 3]))
    # video positions replaced with the projector output, in order
    proj = mm._projector(params["vae_projector_image"], data)
    np.testing.assert_allclose(np.asarray(emb[0, 2]), np.asarray(proj[0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(emb[0, 4]), np.asarray(proj[1]), rtol=1e-5)
    # BASE-type rows are NOT spliced (only INPUT)
    types2 = jnp.array([C.REPLACEMENT_TYPE.BASE, C.REPLACEMENT_TYPE.INPUT])
    emb2 = mm.splice_input_embeds(params, cfg, ids, data, types2)
    np.testing.assert_allclose(np.asarray(emb2[0, 2]), np.asarray(plain[0, 2]))


def test_train_forward_losses_and_grads(rng):
    cfg = mm.Any2PixLMConfig.tiny()
    params = mm.init(rng, cfg)
    b, s = 2, 10
    rs = np.random.RandomState(0)
    ids = rs.randint(3, 250, (b, s))
    ids[0, 4] = cfg.im_gen_token_id
    ids[1, 6] = cfg.video_token_id
    labels = ids.copy()
    labels[:, :3] = C.IGNORE_INDEX
    gen_mask = ids == cfg.im_gen_token_id
    rep_type = np.full((b, s), -1)
    rep_type[1, 6] = C.REPLACEMENT_TYPE.BASE
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "attention_mask": jnp.ones((b, s), bool),
        "replacement_data": jnp.asarray(
            rs.randn(b, s, cfg.image_codec_dim), jnp.float32
        ),
        "replacement_type": jnp.asarray(rep_type),
        "gen_target_image": jnp.asarray(
            rs.randn(b, s, cfg.image_codec_dim), jnp.float32
        ),
        "gen_mask_image": jnp.asarray(gen_mask),
    }

    def loss_fn(p):
        loss, ind = mm.train_forward(p, cfg, batch)
        return loss, ind

    (loss, ind), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert {"loss_lang", "loss_img", "loss_extra"} <= set(ind)
    # every head that participates gets gradient signal
    for head in ["vae_projector_image", "vae_predictor_image"]:
        gmax = max(
            float(jnp.abs(g).max()) for g in jax.tree.leaves(grads[head])
        )
        assert gmax > 0, head
    # loss_img uses MSE×dim semantics: scale target up → loss grows ~quadratically
    batch2 = dict(batch)
    batch2["gen_target_image"] = batch["gen_target_image"] * 3.0
    _, ind2 = mm.train_forward(params, cfg, batch2)
    assert float(ind2["loss_img"]) > float(ind["loss_img"])


def test_train_forward_discrete_ce_head(rng):
    """Discrete VQ codec: CE over codebook logits at gen positions, no
    ×dim scaling (reference any2pix_llama.py:377-395 `img_loss_obj='ar'`
    branch); predictor out dim = codebook vocab size."""
    import dataclasses

    from instructany2pix_tpu.llm import multimodal as mm
    from instructany2pix_tpu.llm.tokenizer import ByteTokenizer, initialize_vision_tokenizer

    tok = ByteTokenizer()
    token_ids = initialize_vision_tokenizer(tok)
    vocab_vq = 32
    cfg = dataclasses.replace(mm.Any2PixLMConfig.tiny(token_ids), image_vocab_size=vocab_vq)
    params = mm.init(rng, cfg)
    assert params["vae_predictor_image"]["fc2"]["w"].shape[-1] == vocab_vq

    b, s = 2, 12
    rs = np.random.RandomState(0)
    ids = rs.randint(3, 250, (b, s))
    ids[:, 4] = cfg.im_gen_token_id
    labels = ids.copy()
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "attention_mask": jnp.ones((b, s), bool),
        # quantized embeddings still drive the input splice
        "gen_target_image": jnp.asarray(rs.randn(b, s, cfg.image_codec_dim), jnp.float32),
        "gen_mask_image": jnp.asarray(ids == cfg.im_gen_token_id),
        "gen_index_image": jnp.asarray(rs.randint(0, vocab_vq, (b, s))),
    }
    loss, ind = mm.train_forward(params, cfg, batch)
    assert np.isfinite(float(loss))
    assert "loss_img" in ind
    # CE magnitude sanity: near log(V) for a random head, NOT scaled by dim
    assert float(ind["loss_img"]) < 3 * np.log(vocab_vq)
    # gradient flows into the predictor head
    g = jax.grad(lambda p: mm.train_forward(p, cfg, batch)[0])(params)
    gmax = max(
        float(jnp.max(jnp.abs(x))) for x in jax.tree.leaves(g["vae_predictor_image"])
    )
    assert gmax > 0


def test_generate_greedy_matches_full_forward(rng):
    cfg = llama.LlamaConfig.tiny()
    params = llama.init(rng, cfg)
    ids = jnp.asarray([[1, 5, 9, 20]])
    emb = llama.embed(params, ids)
    res = gen_lib.generate(
        params, cfg, emb, jax.random.key(0), max_new_tokens=6, temperature=0.0,
        eos_id=2, max_len=16,
    )
    # reference: repeated full forwards, greedy
    cur = ids
    expect = []
    for _ in range(6):
        out = llama.forward(params, cfg, input_ids=cur)
        nxt = int(jnp.argmax(out["logits"][0, -1]))
        expect.append(nxt)
        cur = jnp.concatenate([cur, jnp.asarray([[nxt]])], axis=1)
        if nxt == 2:
            break
    got = list(np.asarray(res.tokens[0, : len(expect)]))
    assert got == expect
    # hidden capture: hiddens[i] is the state that predicted tokens[i]
    out0 = llama.forward(params, cfg, input_ids=ids)
    np.testing.assert_allclose(
        np.asarray(res.hiddens[0, 0]),
        np.asarray(out0["hidden_norm"][0, -1]),
        atol=2e-4, rtol=1e-3,
    )


def test_generate_stops_at_eos(rng):
    cfg = llama.LlamaConfig.tiny()
    params = llama.init(rng, cfg)
    ids = jnp.asarray([[1, 5]])
    # use the model's own greedy first token as the "eos" id so the very
    # first sampled token triggers stopping
    first = int(jnp.argmax(llama.forward(params, cfg, input_ids=ids)["logits"][0, -1]))
    emb = llama.embed(params, ids)
    res = gen_lib.generate(
        params, cfg, emb, jax.random.key(0), max_new_tokens=8, temperature=0.0,
        eos_id=first, max_len=16,
    )
    assert int(res.done_at[0]) == 0
    assert np.all(np.asarray(res.tokens[0]) == first)


def test_generate_multitoken_keyword_stop(rng):
    """`stop_sequences` halts generation when the last K emitted ids
    match a keyword's id suffix — the reference's
    KeywordsStoppingCriteria for arbitrary strings (mm_utils.py:77-107)."""
    cfg = llama.LlamaConfig.tiny()
    params = llama.init(rng, cfg)
    ids = jnp.asarray([[1, 5, 9, 20]])
    emb = llama.embed(params, ids)
    base = gen_lib.generate(
        params, cfg, emb, jax.random.key(0), max_new_tokens=8, temperature=0.0,
        eos_id=2, max_len=24,
    )
    toks = list(np.asarray(base.tokens[0]))
    # pick the greedy tokens at steps 1-2 as a 2-token stop keyword
    kw = (int(toks[1]), int(toks[2]))
    res = gen_lib.generate(
        params, cfg, emb, jax.random.key(0), max_new_tokens=8, temperature=0.0,
        eos_id=2, max_len=24, stop_sequences=(kw,),
    )
    assert int(res.done_at[0]) == 2  # index of the keyword's final token
    # tokens up to and including the keyword are unchanged
    assert list(np.asarray(res.tokens[0, :3])) == toks[:3]
    # a keyword that never occurs changes nothing
    res2 = gen_lib.generate(
        params, cfg, emb, jax.random.key(0), max_new_tokens=8, temperature=0.0,
        eos_id=2, max_len=24, stop_sequences=((123456 % cfg.vocab_size, 1, 1),),
    )
    np.testing.assert_array_equal(np.asarray(res2.tokens), np.asarray(base.tokens))
    np.testing.assert_array_equal(np.asarray(res2.done_at), np.asarray(base.done_at))


def test_keyword_stop_sequences_helper():
    from instructany2pix_tpu.llm.tokenizer import ByteTokenizer

    tok = ByteTokenizer()
    seqs = gen_lib.keyword_stop_sequences(tok, ["ab", "</s>"])
    assert seqs[0] == (3 + ord("a"), 3 + ord("b"))
    assert seqs[1] == (tok.eos_token_id,)


def test_generate_dynamic_stop_matches_scan(rng):
    """while_loop early-exit decode returns identical tokens/hiddens up
    to done_at as the fixed-length scan."""
    cfg = llama.LlamaConfig.tiny()
    params = llama.init(rng, cfg)
    ids = jnp.asarray([[1, 5, 9, 20], [1, 7, 3, 2]])
    emb = llama.embed(params, ids)
    a = gen_lib.generate(params, cfg, emb, jax.random.key(0), max_new_tokens=8,
                         temperature=0.0, eos_id=2, max_len=24)
    d = gen_lib.generate(params, cfg, emb, jax.random.key(0), max_new_tokens=8,
                         temperature=0.0, eos_id=2, max_len=24, dynamic_stop=True)
    np.testing.assert_array_equal(np.asarray(a.done_at), np.asarray(d.done_at))
    for i in range(2):
        n = min(int(a.done_at[i]) + 1, 8)
        np.testing.assert_array_equal(
            np.asarray(a.tokens[i, :n]), np.asarray(d.tokens[i, :n])
        )
        np.testing.assert_allclose(
            np.asarray(a.hiddens[i, :n]), np.asarray(d.hiddens[i, :n]),
            atol=2e-4, rtol=1e-3,
        )
    # early stop: force first greedy token as eos, loop exits immediately
    first = int(jnp.argmax(llama.forward(params, cfg, input_ids=ids[:1])["logits"][0, -1]))
    e = gen_lib.generate(params, cfg, llama.embed(params, ids[:1]),
                         jax.random.key(0), max_new_tokens=8, temperature=0.0,
                         eos_id=first, max_len=24, dynamic_stop=True)
    assert int(e.done_at[0]) == 0


def test_generate_bucketed_matches_unbucketed(rng):
    """Left-padded bucketing must be a pure compile-count optimization:
    greedy outputs identical to the unbucketed run."""
    cfg = llama.LlamaConfig.tiny()
    params = llama.init(rng, cfg)
    ids = jnp.asarray([[1, 5, 9, 20, 7]])
    emb = llama.embed(params, ids)
    a = gen_lib.generate(
        params, cfg, emb, jax.random.key(0), max_new_tokens=6, temperature=0.0,
        eos_id=2, max_len=32,
    )
    b = gen_lib.generate(
        params, cfg, emb, jax.random.key(0), max_new_tokens=6, temperature=0.0,
        eos_id=2, max_len=32, bucket=16,
    )
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    np.testing.assert_allclose(
        np.asarray(a.hiddens), np.asarray(b.hiddens), atol=2e-4, rtol=1e-3
    )


def test_conversation_registry_parity_vs_reference():
    """Every registry entry produces byte-identical prompts to the
    reference (reference llm/conversation.py:361-374) — the template
    strings are the fine-tuned models' prompt formats."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_conversation",
        "/root/reference/instructany2pix/llm/conversation.py",
    )
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    assert set(conv_templates) == set(ref.conv_templates)
    dialog = [
        ("add <video> to <video>", "a photo [a cat] additions:cat:<video>."),
        ("make it snow", None),
    ]
    for name, ours in conv_templates.items():
        theirs = ref.conv_templates[name].copy()
        mine = ours.copy()
        assert mine.offset == theirs.offset, name
        # the reference PLAIN template has sep2=None and is only ever
        # used with a single (first-turn) message — a second message
        # would crash its get_prompt; match that usage here
        turns = dialog[:1] if name in ("plain", "v0_plain") else dialog
        second = None if name in ("plain", "v0_plain") else True
        for (q, a) in turns:
            mine.append_message(mine.roles[0], q)
            theirs.append_message(theirs.roles[0], q)
            if second:
                mine.append_message(mine.roles[1], a)
                theirs.append_message(theirs.roles[1], a)
        assert mine.get_prompt() == theirs.get_prompt(), name
