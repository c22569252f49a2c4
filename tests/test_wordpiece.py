"""WordPiece tokenizer parity vs transformers.BertTokenizer.

The reference zoo tokenizes with HF BertTokenizer over bert-base-uncased's
vocab.txt (blip.py init_tokenizer); our from-scratch WordPiece must split
identically: greedy longest-match, ## continuations, unk fallback,
punctuation/CJK/accent handling.
"""

import numpy as np
import pytest

from mr_blip_tpu.text.wordpiece import (
    BertWordPieceTokenizer,
    basic_tokenize,
    wordpiece_split,
)

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] the a un ##aff ##able want ##ed runn "
    "##ing dog cat ##s , . ! ? ' s 1 ##2 ##3 over jump ##ps quick brown "
    "fox lazy do ##g e ##x ##am ##ple te ##st co ##co ##a"
).split()


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("wp") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def hf_tok(vocab_file):
    from transformers import BertTokenizer

    return BertTokenizer(vocab_file, do_lower_case=True)


@pytest.fixture(scope="module")
def mine(vocab_file):
    return BertWordPieceTokenizer(vocab_file, add_blip_tokens=False)


SENTENCES = [
    "the quick brown fox jumps over the lazy dog",
    "unaffable",
    "running dogs, cats!  WANTED?",
    "café cócoa 123",            # accents (composed + combining)
    "an unknownword te st",
    "a中文b example",               # CJK chars force splits
    "dog's cat's",
    "",
]


def test_tokenization_matches_hf(hf_tok, mine):
    for s in SENTENCES:
        assert mine.tokenize(s) == hf_tok.tokenize(s), s


def test_encode_matches_hf(hf_tok, mine):
    for s in SENTENCES:
        want = hf_tok(s)["input_ids"]
        assert mine.encode(s) == want, s


def test_batched_call_and_decode(mine):
    ids, mask = mine(["the quick brown fox", "a dog"], max_len=16)
    assert ids.shape == mask.shape
    assert mask[1].sum() < mask[0].sum()
    assert ids[0, 0] == mine.cls_token_id
    text = mine.decode(ids[0])
    assert "quick" in text and "[CLS]" not in text
    # ## continuations merge back into words
    rt = mine.decode(mine.encode("running wanted"))
    assert rt == "running wanted"


def test_greedy_longest_match():
    vocab = {t: i for i, t in enumerate(VOCAB)}
    assert wordpiece_split("unaffable", vocab) == ["un", "##aff", "##able"]
    assert wordpiece_split("zzz", vocab) == ["[UNK]"]


def test_basic_tokenize_rules():
    assert basic_tokenize("Hello, WORLD!") == ["hello", ",", "world", "!"]
    assert basic_tokenize("a中 b") == ["a", "中", "b"]
    assert basic_tokenize("café") == ["cafe"]


def test_blip_special_tokens(vocab_file):
    tok = BertWordPieceTokenizer(vocab_file, add_blip_tokens=True)
    assert tok.bos_token_id == len(VOCAB)      # [DEC] appended
    assert tok.enc_token_id == len(VOCAB) + 1  # [ENC] appended
    assert tok.vocab_size == len(VOCAB) + 2
