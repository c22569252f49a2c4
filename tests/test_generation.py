"""Beam search / greedy decoding tests against brute-force enumeration."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from mr_blip_tpu.models.generation import (
    beam_search,
    expand_to_beams,
    greedy_decode_with_scores,
)
from mr_blip_tpu.models.t5 import T5ForConditionalGeneration, t5_tiny_config


def _build(decode_cache_len, vocab_size=12, batch=2, enc_len=4):
    cfg = t5_tiny_config(vocab_size=vocab_size)
    model = T5ForConditionalGeneration(
        cfg, compute_dtype=jnp.float32, decode_cache_len=decode_cache_len
    )
    rng = np.random.default_rng(0)
    inputs_embeds = jnp.array(
        rng.standard_normal((batch, enc_len, cfg.d_model), np.float32)
    )
    dec_ids = jnp.array(rng.integers(0, vocab_size, (batch, 2)))
    params = model.init(jax.random.PRNGKey(0), inputs_embeds, dec_ids)
    return cfg, model, params, inputs_embeds


def _make_decode_step(model, params, enc_states):
    def decode_step(cache, tokens, position):
        logits, updated = model.apply(
            {**params, "cache": cache}, tokens, enc_states,
            method="decode", decode=True, decode_position=position,
            mutable=["cache"],
        )
        return logits[:, 0], updated["cache"]

    return decode_step


def _init_cache(model, params, enc_states, batch_rows):
    dummy = jnp.zeros((batch_rows, 1), jnp.int32)
    _, vars0 = model.apply(
        params, dummy, enc_states, method="decode",
        decode=True, decode_position=jnp.int32(0), mutable=["cache"],
    )

    def zero_self(path, leaf):
        if any("cross_attention" in str(p) for p in path):
            return leaf
        return jnp.zeros_like(leaf)

    return jax.tree_util.tree_map_with_path(zero_self, vars0["cache"])


def _sequence_log_prob(model, params, enc, seq, eos, start=0):
    """Teacher-forced log prob of token sequence `seq` ending at eos."""
    dec_in = jnp.array([[start] + seq[:-1]])
    logits = model.apply(params, dec_in, enc, method="decode")
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return float(sum(lp[0, i, tok] for i, tok in enumerate(seq)))


class TestBeamSearch:
    def test_score_is_consistent_with_teacher_forcing(self):
        """The returned score must equal the teacher-forced normalized log
        prob of the returned sequence (pins the length normalization).
        Sequence-level agreement with HF generate is covered separately in
        test_generation_hf_parity.py (HF semantics are not globally optimal,
        so a brute-force oracle is the wrong spec)."""
        max_len = 3
        vocab = 6
        cfg, model, params, inputs_embeds = _build(
            decode_cache_len=max_len, vocab_size=vocab, batch=1
        )
        eos = cfg.eos_token_id
        enc = model.apply(params, inputs_embeds, method="encode")

        num_beams = vocab
        enc_beams = expand_to_beams(enc, num_beams)
        cache = _init_cache(model, params, enc_beams, num_beams)
        seqs, scores = beam_search(
            _make_decode_step(model, params, enc_beams), cache,
            batch_size=1, num_beams=num_beams, max_length=max_len,
            min_new_tokens=0, eos_token_id=eos, pad_token_id=cfg.pad_token_id,
        )
        got = [int(t) for t in np.asarray(seqs[0])]
        got = got[: got.index(eos) + 1] if eos in got else got
        lp = _sequence_log_prob(model, params, enc, got, eos)
        assert abs(float(scores[0]) - lp / len(got)) < 1e-4

        # and the result is at least as good as the pure-greedy rollout
        greedy = []
        for _ in range(max_len):
            dec_in = jnp.array([[0] + greedy])
            logits = model.apply(params, dec_in, enc, method="decode")
            tok = int(jnp.argmax(logits[0, -1]))
            greedy.append(tok)
            if tok == eos:
                break
        greedy_score = _sequence_log_prob(model, params, enc, greedy, eos) / len(greedy)
        assert float(scores[0]) >= greedy_score - 1e-4

    def test_min_length_suppresses_eos(self):
        max_len = 4
        cfg, model, params, inputs_embeds = _build(decode_cache_len=max_len, batch=2)
        enc = model.apply(params, inputs_embeds, method="encode")
        k = 2
        enc_b = expand_to_beams(enc, k)
        cache = _init_cache(model, params, enc_b, 2 * k)
        seqs, _ = beam_search(
            _make_decode_step(model, params, enc_b), cache,
            batch_size=2, num_beams=k, max_length=max_len, min_new_tokens=3,
            eos_token_id=cfg.eos_token_id, pad_token_id=cfg.pad_token_id,
        )
        for row in np.asarray(seqs):
            eos_pos = np.where(row == cfg.eos_token_id)[0]
            if len(eos_pos):
                assert eos_pos[0] >= 2  # EOS can appear at generated idx >= 2

    def test_greedy_scores_buffer(self):
        max_len = 4
        cfg, model, params, inputs_embeds = _build(decode_cache_len=max_len, batch=2)
        enc = model.apply(params, inputs_embeds, method="encode")
        cache = _init_cache(model, params, enc, 2)
        seqs, scores = greedy_decode_with_scores(
            _make_decode_step(model, params, enc), cache,
            batch_size=2, max_length=max_len, vocab_size=cfg.vocab_size,
            eos_token_id=cfg.eos_token_id,
        )
        assert seqs.shape == (2, max_len)
        assert scores.shape == (max_len, 2, cfg.vocab_size)
        # greedy property: token t = argmax of step-t scores (until EOS)
        for b in range(2):
            for t in range(max_len):
                tok = int(np.asarray(seqs)[b, t])
                if tok == cfg.pad_token_id:
                    break
                assert tok == int(np.argmax(np.asarray(scores)[t, b]))
                if tok == cfg.eos_token_id:
                    break

    def test_beam_jits(self):
        max_len = 3
        cfg, model, params, inputs_embeds = _build(decode_cache_len=max_len, batch=2)
        enc = model.apply(params, inputs_embeds, method="encode")
        k = 3
        enc_b = expand_to_beams(enc, k)
        cache = _init_cache(model, params, enc_b, 2 * k)

        @jax.jit
        def run(cache):
            return beam_search(
                _make_decode_step(model, params, enc_b), cache,
                batch_size=2, num_beams=k, max_length=max_len,
                eos_token_id=cfg.eos_token_id, pad_token_id=cfg.pad_token_id,
            )

        seqs, scores = run(cache)
        assert seqs.shape == (2, max_len)


class TestBeamFoldedCrossCache:
    """The flagship generate builds the cross-attention K/V cache at
    ENCODER batch rows and folds beams into the query length at attention
    time (t5.py T5Attention, ``b_enc != b`` branch). That branch must be
    numerically identical to the naive beam-expanded cache — it used to
    skip the sqrt(d_kv) pre-scale that cancels dot_product_attention's
    internal 1/sqrt(d), silently running T5 cross-attention at 1/8 logit
    scale during beam decode (invisible to the HF-parity test, which
    pre-expands the encoder outputs so b_enc == b)."""

    def test_dedup_matches_expanded(self):
        beams = 3
        cfg, model, params, inputs_embeds = _build(decode_cache_len=4, batch=2)
        rng = np.random.default_rng(1)
        enc = model.apply(params, inputs_embeds, method="encode")
        enc_mask = jnp.ones(enc.shape[:2], jnp.int32)
        tokens = jnp.array(rng.integers(0, cfg.vocab_size, (2 * beams, 1)))

        def step_logits(enc_states, mask):
            dummy = jnp.zeros((2 * beams, 1), jnp.int32)
            _, vars0 = model.apply(
                params, dummy, enc_states, encoder_mask=mask, decode=True,
                decode_position=jnp.int32(0), method="decode",
                mutable=["cache"],
            )
            logits, _ = model.apply(
                {**params, "cache": vars0["cache"]}, tokens, enc_states,
                encoder_mask=mask, decode=True, decode_position=jnp.int32(0),
                method="decode", mutable=["cache"],
            )
            return np.asarray(logits)

        deduped = step_logits(enc, enc_mask)
        expanded = step_logits(
            jnp.repeat(enc, beams, axis=0), jnp.repeat(enc_mask, beams, axis=0)
        )
        np.testing.assert_allclose(deduped, expanded, atol=1e-4)
