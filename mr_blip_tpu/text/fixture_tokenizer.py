"""Synthesize a structurally faithful flan-T5 tokenizer for offline testing.

The real flan-t5 SentencePiece model cannot ship in this environment, but
every metric-shifting tokenizer behavior the reference depends on
(blip2_mr.py:1299-1306, 1497-1608) is *structural*:

* pad=0, </s>=1, <unk>=2, id 3 = the bare space piece "▁";
* 100 ``<extra_id_k>`` sentinels with ``extra_id_0`` at the HIGHEST id
  (T5 convention: id(extra_id_k) = V-1-k);
* the answer letters "A".."E" at ids **71, 272, 205, 309, 262** (the
  reference hard-codes exactly these for the QA logits trick);
* most integers < 200 are single pieces; an "annoying" subset tokenizes to
  multiple pieces — some starting with the bare-space id 3 (stripped by
  ``get_clean_timestamp_tokens``), some not (remapped to the nearest
  single-token integer);
* Metaspace pre-tokenization/decoding (whitespace → "▁").

This module builds a real ``tokenizers`` Unigram model with those facts
baked in and saves it as a loadable HF ``T5TokenizerFast`` directory — so
the HFT5Tokenizer code path (the production path once real assets exist)
is exercised by CI instead of only the mock.

Crafted annoying sets (chosen, then *derived* back by the tests):
    space-flavor  (first piece id 3):      {87, 113, 157}
    nonspace-flavor (first piece != 3):    {123, 124, 149}
"""

from __future__ import annotations

import os
import string

VOCAB_SIZE = 1280
ANSWER_IDS = {"A": 71, "B": 272, "C": 205, "D": 309, "E": 262}
ANNOYING_SPACE = (87, 113, 157)
ANNOYING_NONSPACE = (123, 124, 149)

_WORDS = (
    "Query Given the video and query find relevant windows Relevant Option "
    "Question Answer a is person doing something interesting of to in on "
    "Considering information presented frame select correct answer from "
    "options duration seconds"
).split()


def _build_piece_table():
    """Return an ordered list of (piece, score) with the crafted id layout."""
    pieces: list = [None] * VOCAB_SIZE
    scores: dict = {}

    def put(idx, piece, score=-8.0):
        assert pieces[idx] is None, (idx, piece, pieces[idx])
        pieces[idx] = piece
        scores[piece] = score

    put(0, "<pad>", 0.0)
    put(1, "</s>", 0.0)
    put(2, "<unk>", 0.0)
    put(3, "▁", -2.0)  # bare space piece
    for letter, idx in ANSWER_IDS.items():
        put(idx, "▁" + letter, -5.0)
    # extra sentinels: id(extra_id_k) = V-1-k
    for k in range(100):
        put(VOCAB_SIZE - 1 - k, f"<extra_id_{k}>", 0.0)

    pool = []
    # digits as continuation pieces (cheap, so multi-piece numbers segment
    # digit-by-digit after the flavor-choosing first piece)
    for d in string.digits:
        pool.append((d, -3.0))
    # single-token integers 0..199 except the crafted annoying ones
    annoying = set(ANNOYING_SPACE) | set(ANNOYING_NONSPACE)
    # score -2.5: the single piece must beat the "▁"+continuation split
    # (-2.0 + -1.x) so only the crafted numbers come out annoying
    for n in range(200):
        if n in annoying:
            continue
        pool.append(("▁" + str(n), -2.5))
    # space-flavor annoying: "▁" + whole-number continuation piece must beat
    # any "▁d…" split => make the continuation piece very likely
    for n in ANNOYING_SPACE:
        pool.append((str(n), -1.0))
    # nonspace-flavor annoying: "▁<first digit>" exists (it does: single
    # digits are non-annoying) and the remainder is a likely continuation
    for n in ANNOYING_NONSPACE:
        pool.append((str(n)[1:], -1.5))
    # punctuation / structure used by prompts and span strings
    for p in ["[", "]", "[[", "]]", ",", ".", ":", ">", "?", "(", ")", "-"]:
        pool.append((p, -6.0))
        pool.append(("▁" + p, -6.0))
    # prompt words, plus lowercase fallbacks
    for w in _WORDS:
        pool.append(("▁" + w, -5.0))
        pool.append((w, -7.0))
    for c in string.ascii_letters:
        pool.append((c, -9.0))
        pool.append(("▁" + c, -9.5))

    # dedupe, then fill free slots in order
    seen = {p for p in pieces if p is not None}
    free = [i for i, p in enumerate(pieces) if p is None]
    fi = 0
    for piece, score in pool:
        if piece in seen:
            continue
        seen.add(piece)
        put(free[fi], piece, score)
        fi += 1
    # pad the remainder with unreachable filler pieces
    for i in free[fi:]:
        put(i, f"<filler_{i}>", -100.0)
    return [(p, scores[p]) for p in pieces]


def build_fixture_tokenizer(out_dir: str) -> str:
    """Build and save the fixture tokenizer; returns ``out_dir``."""
    from tokenizers import AddedToken, Tokenizer, decoders, pre_tokenizers, processors
    from tokenizers.models import Unigram

    table = _build_piece_table()
    tok = Tokenizer(Unigram(table, unk_id=2, byte_fallback=False))
    tok.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁")
    tok.decoder = decoders.Metaspace(replacement="▁")
    tok.post_processor = processors.TemplateProcessing(
        single="$A </s>",
        pair="$A </s> $B </s>",
        special_tokens=[("</s>", 1)],
    )

    from transformers import T5TokenizerFast

    extra = [
        AddedToken(f"<extra_id_{k}>", special=True, normalized=False)
        for k in range(100)
    ]
    hf_tok = T5TokenizerFast(
        tokenizer_object=tok,
        unk_token="<unk>", eos_token="</s>", pad_token="<pad>",
        extra_ids=0, additional_special_tokens=extra,
    )
    os.makedirs(out_dir, exist_ok=True)
    hf_tok.save_pretrained(out_dir)
    return out_dir
