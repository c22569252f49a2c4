"""Differential beam-search test vs HF transformers ``generate``.

The reference decodes spans with HF beam search (blip2_mr.py:883-899:
num_beams=5, length_penalty=1.0, min_length=1, early_stopping default
False). My ``beam_search`` follows the same rules by construction; this test
pins the corner semantics (length penalty normalization, EOS handling,
min-length suppression, beam refill) by requiring the *exact same token
sequences* from a ported tiny T5 on random inputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import functools

import jax
import jax.numpy as jnp

from mr_blip_tpu.models.blip2_mr import _merge_cache, _split_cache, _zero_self_cache
from mr_blip_tpu.models.generation import beam_search
from mr_blip_tpu.models.port import merge_subtree, port_t5_hf
from mr_blip_tpu.models.t5 import T5Config, T5ForConditionalGeneration

VOCAB = 64
D = 32
MAXLEN = 12


@pytest.fixture(scope="module")
def pair():
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration as HFT5

    hf_cfg = HFT5Config(
        vocab_size=VOCAB, d_model=D, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1,
    )
    torch.manual_seed(42)
    hf_model = HFT5(hf_cfg).eval()

    cfg = T5Config(
        vocab_size=VOCAB, d_model=D, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0,
        dense_act_fn="gelu_new", is_gated_act=True, tie_word_embeddings=False,
    )
    model = T5ForConditionalGeneration(
        cfg, compute_dtype=jnp.float32, decode_cache_len=MAXLEN + 1
    )
    enc_embeds = jnp.zeros((1, 3, D), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), enc_embeds, jnp.array([[0, 1]]))[
        "params"
    ]
    params = merge_subtree({"t5": params}, port_t5_hf(hf_model.state_dict()), "t5")[
        "t5"
    ]
    return hf_model, model, params


def my_beam_generate(model, params, embeds, mask, num_beams, max_length,
                     min_new_tokens=0, length_penalty=1.0):
    b = embeds.shape[0]

    @functools.partial(jax.jit, static_argnames=("batch_size",))
    def fn(params, embeds, mask, batch_size):
        enc = model.apply({"params": params}, embeds, mask, method="encode")
        enc_b = jnp.repeat(enc, num_beams, axis=0)
        mask_b = jnp.repeat(mask, num_beams, axis=0)
        dummy = jnp.zeros((batch_size * num_beams, 1), jnp.int32)
        _, vars0 = model.apply(
            {"params": params}, dummy, enc_b, encoder_mask=mask_b,
            decode=True, decode_position=jnp.int32(0),
            method="decode", mutable=["cache"],
        )
        self_cache, cross_cache = _split_cache(_zero_self_cache(vars0["cache"]))

        def decode_step(self_cache, tokens, position):
            logits, updated = model.apply(
                {"params": params, "cache": _merge_cache(self_cache, cross_cache)},
                tokens, enc_b, encoder_mask=mask_b,
                decode=True, decode_position=position,
                method="decode", mutable=["cache"],
            )
            new_self, _ = _split_cache(updated["cache"])
            return logits[:, 0], new_self

        return beam_search(
            decode_step, self_cache, batch_size=batch_size, num_beams=num_beams,
            max_length=max_length, min_new_tokens=min_new_tokens, eos_token_id=1,
            pad_token_id=0, decoder_start_token_id=0,
            length_penalty=length_penalty,
        )

    return fn(params, embeds, mask, b)


def hf_beam_generate(hf_model, embeds, mask, num_beams, max_length,
                     min_new_tokens=None, length_penalty=1.0):
    with torch.no_grad():
        out = hf_model.generate(
            inputs_embeds=torch.tensor(np.asarray(embeds)),
            attention_mask=torch.tensor(np.asarray(mask)),
            num_beams=num_beams,
            max_new_tokens=max_length,
            min_new_tokens=min_new_tokens,
            length_penalty=length_penalty,
            do_sample=False,
            return_dict_in_generate=True,
            output_scores=True,
        )
    return out.sequences.numpy(), out.sequences_scores.numpy()


def _compare(pair, num_beams, max_length, min_length=0, length_penalty=1.0,
             seed=0, batch=4, enc_len=5):
    hf_model, model, params = pair
    rng = np.random.default_rng(seed)
    embeds = rng.standard_normal((batch, enc_len, D)).astype(np.float32) * 0.7
    mask = np.ones((batch, enc_len), np.int64)
    mask[0, 3:] = 0

    hf_seqs, hf_scores = hf_beam_generate(
        hf_model, embeds, mask, num_beams, max_length,
        min_new_tokens=min_length, length_penalty=length_penalty,
    )
    seqs, scores = my_beam_generate(
        model, params, jnp.asarray(embeds), jnp.asarray(mask),
        num_beams, max_length, min_new_tokens=min_length,
        length_penalty=length_penalty,
    )
    seqs = np.asarray(seqs)

    def upto_eos(row):
        """Tokens through the first EOS (HF pads trailing positions with EOS
        when pad_token_id is 0, and 0 is a legal mid-sequence token)."""
        row = list(row)
        if 1 in row:
            row = row[: row.index(1) + 1]
        return [int(t) for t in row]

    for i in range(batch):
        hf_toks = upto_eos(hf_seqs[i, 1:])  # strip decoder start
        my_toks = upto_eos(seqs[i])
        assert hf_toks == my_toks, (
            f"row {i}: hf={hf_toks} mine={my_toks} "
            f"(beams={num_beams}, lp={length_penalty}, minlen={min_length})"
        )
    np.testing.assert_allclose(np.asarray(scores), hf_scores, rtol=1e-3, atol=1e-3)


class TestBeamSearchVsHF:
    def test_beam5_default(self, pair):
        """The production configuration: beam 5, length_penalty 1.0."""
        _compare(pair, num_beams=5, max_length=MAXLEN)

    def test_beam3_more_batches(self, pair):
        _compare(pair, num_beams=3, max_length=MAXLEN, seed=7, batch=6)

    def test_min_length_edge(self, pair):
        """EOS suppression: min_new_tokens forces longer sequences."""
        _compare(pair, num_beams=5, max_length=MAXLEN, min_length=4, seed=3)

    def test_length_penalty_short_bias(self, pair):
        _compare(pair, num_beams=5, max_length=MAXLEN, length_penalty=0.5, seed=5)

    def test_length_penalty_long_bias(self, pair):
        _compare(pair, num_beams=5, max_length=MAXLEN, length_penalty=2.0, seed=6)

    def test_max_length_cutoff(self, pair):
        """Sequences that hit max_length without EOS fall back to alive beams."""
        _compare(pair, num_beams=4, max_length=3, seed=9)
