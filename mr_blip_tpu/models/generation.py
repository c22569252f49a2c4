"""Beam search / greedy decoding for encoder-decoder models (pure JAX).

The whole decode loop is one ``lax.while_loop`` over a static-shape KV
cache, so a single jit compilation covers every step — the TPU-native
replacement for the reference's HF ``generate`` call
(``blip2_mr.py:883-899``).  Semantics follow HF beam search: per-step
log-softmax accumulation, EOS banned until ``min_new_tokens`` precede it
(HF MinNewTokensLengthLogitsProcessor semantics), 2K candidate
expansion so finished beams can be refilled, and final score
``sum_logprobs / len**length_penalty``.

The model plugs in as a ``decode_step`` callback:
    decode_step(cache, token_ids (B*K, 1), position) -> (logits (B*K, V), cache)

``greedy_decode_with_scores`` additionally returns the full per-step logits
buffer, needed for the A-E answer scoring trick (reference
``videoQA_answer`` reads ``scores[1]``, blip2_mr.py:1299-1306).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

NEG_INF = -1.0e7


def _gather_beams(tree, beam_indices, batch_size, num_beams,
                  layer_major=False):
    """Select beams: leaves have shape (B*K, ...) flattened; indices (B, K).

    ``layer_major=True`` handles scan-over-layers caches
    (T5Config.scan_layers), where cache leaves carry a leading LAYER axis:
    cached_key/value are (L, B*K, max_len, inner) — the beam axis is axis 1
    and selection is vmapped over layers. Shape-based dispatch alone would
    be ambiguous there (L can equal B*K), hence the explicit flag.
    """

    def gather(x):
        if x.ndim == 0:  # scalars (e.g. cache_index) are beam-invariant
            return x
        if x.shape[0] != batch_size * num_beams:
            # beam-deduplicated leaves (cross-attention K/V) need no gather
            return x
        x = x.reshape((batch_size, num_beams) + x.shape[1:])
        out = jnp.take_along_axis(
            x,
            beam_indices.reshape(
                (batch_size, num_beams) + (1,) * (x.ndim - 2)
            ),
            axis=1,
        )
        return out.reshape((batch_size * num_beams,) + x.shape[2:])

    def gather_layer_major(x):
        # Stacked self-attn cache leaves: (L, B*K, ...) -> gather on the
        # beam axis per layer. (L,)-shaped leaves (stacked cache_index)
        # are beam-invariant.
        if x.ndim <= 1 or x.shape[1] != batch_size * num_beams:
            return x
        return jax.vmap(gather)(x)

    return jax.tree.map(gather_layer_major if layer_major else gather, tree)


@dataclasses.dataclass
class BeamState:
    cur_len: jnp.ndarray            # scalar int32
    alive_seqs: jnp.ndarray         # (B, K, L)
    alive_log_probs: jnp.ndarray    # (B, K)
    finished_seqs: jnp.ndarray      # (B, K, L)
    finished_scores: jnp.ndarray    # (B, K)
    finished_flags: jnp.ndarray     # (B, K)
    done: jnp.ndarray               # (B,) frozen batches (HF _done)
    cache: Any


jax.tree_util.register_dataclass(
    BeamState,
    data_fields=[
        "cur_len", "alive_seqs", "alive_log_probs", "finished_seqs",
        "finished_scores", "finished_flags", "done", "cache",
    ],
    meta_fields=[],
)


def beam_search(
    decode_step: Callable,
    init_cache,
    batch_size: int,
    num_beams: int = 5,
    max_length: int = 50,
    min_new_tokens: int = 0,
    eos_token_id: int = 1,
    pad_token_id: int = 0,
    decoder_start_token_id: int = 0,
    length_penalty: float = 1.0,
    cache_layer_major: bool = False,
):
    """Returns (sequences (B, L), scores (B,)) for the best beam.

    ``init_cache`` must already be expanded to batch*num_beams rows (use
    ``expand_to_beams`` on the encoder outputs before building it).
    ``cache_layer_major``: the cache leaves carry a leading layer axis
    (scan-over-layers decoders) — beams are gathered on axis 1.
    """
    kept_beams = num_beams

    alive_seqs = jnp.full(
        (batch_size, num_beams, max_length + 1), pad_token_id, jnp.int32
    )
    # decoder_start_token_id may be a scalar or a per-sample (B,) array
    # (causal-LM generation seeds each row with its last prompt token).
    start = jnp.asarray(decoder_start_token_id, jnp.int32)
    start = jnp.broadcast_to(start.reshape(-1, 1), (batch_size, num_beams))
    alive_seqs = alive_seqs.at[:, :, 0].set(start)
    # Only beam 0 is live initially (all beams start identical).
    alive_log_probs = jnp.tile(
        jnp.array([0.0] + [NEG_INF] * (num_beams - 1)), (batch_size, 1)
    )
    state = BeamState(
        cur_len=jnp.zeros((), jnp.int32),
        alive_seqs=alive_seqs,
        alive_log_probs=alive_log_probs,
        finished_seqs=jnp.full_like(alive_seqs, pad_token_id),
        finished_scores=jnp.full((batch_size, num_beams), NEG_INF),
        finished_flags=jnp.zeros((batch_size, num_beams), bool),
        done=jnp.zeros((batch_size,), bool),
        cache=init_cache,
    )

    def batch_done(state: BeamState):
        """HF early-stop heuristic (early_stopping=False): a batch freezes
        once K hyps exist and the worst kept beats the best alive candidate
        normalized at the current generated length."""
        all_full = jnp.all(state.finished_flags, axis=1)
        cur = jnp.maximum(state.cur_len, 1).astype(jnp.float32)
        best_alive = state.alive_log_probs[:, 0] / (cur ** length_penalty)
        worst_finished = jnp.min(state.finished_scores, axis=1)
        return all_full & (worst_finished >= best_alive)

    def not_done(state: BeamState):
        not_max = state.cur_len < max_length
        return jnp.logical_and(not_max, ~jnp.all(state.done))

    def step(state: BeamState):
        # 1) one decoder step for every alive beam
        cur_tokens = jax.lax.dynamic_slice_in_dim(
            state.alive_seqs, state.cur_len, 1, axis=2
        ).reshape(batch_size * num_beams, 1)
        logits, new_cache = decode_step(state.cache, cur_tokens, state.cur_len)
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        vocab = log_probs.shape[-1]
        log_probs = log_probs.reshape(batch_size, num_beams, vocab)

        # ban EOS until min_new_tokens have been generated before it
        # (HF MinNewTokensLengthLogitsProcessor: new_tokens < min_new_tokens)
        log_probs = jnp.where(
            (state.cur_len < min_new_tokens)
            & (jnp.arange(vocab)[None, None] == eos_token_id),
            NEG_INF,
            log_probs,
        )

        cand_log_probs = state.alive_log_probs[:, :, None] + log_probs
        flat = cand_log_probs.reshape(batch_size, num_beams * vocab)
        topk_log_probs, topk_idx = jax.lax.top_k(flat, 2 * kept_beams)
        topk_beam = topk_idx // vocab            # (B, 2K)
        topk_token = topk_idx % vocab            # (B, 2K)

        # new sequences for the 2K candidates
        cand_seqs = jnp.take_along_axis(
            state.alive_seqs, topk_beam[:, :, None], axis=1
        )  # (B, 2K, L)
        cand_seqs = jax.lax.dynamic_update_slice_in_dim(
            cand_seqs, topk_token[:, :, None], state.cur_len + 1, axis=2
        )
        is_eos = topk_token == eos_token_id
        # HF only accepts EOS hypotheses ranked within the top K of the 2K
        # candidates (BeamSearchScorer.process: beam_token_rank >= group_size
        # -> skip), and frozen (done) batches stop collecting hypotheses.
        eos_counts = (
            is_eos
            & (jnp.arange(2 * kept_beams)[None, :] < kept_beams)
            & ~state.done[:, None]
        )

        # 2) alive set: best K non-EOS candidates
        alive_scores = jnp.where(is_eos, NEG_INF, topk_log_probs)
        new_alive_scores, alive_idx = jax.lax.top_k(alive_scores, kept_beams)
        new_alive_seqs = jnp.take_along_axis(
            cand_seqs, alive_idx[:, :, None], axis=1
        )
        source_beams = jnp.take_along_axis(topk_beam, alive_idx, axis=1)  # (B, K)
        new_cache = _gather_beams(new_cache, source_beams, batch_size,
                                  num_beams, layer_major=cache_layer_major)

        # 3) finished set: accepted EOS candidates merged into the pool.
        # Normalization counts start + pre-EOS tokens = cur_len + 1, matching
        # HF BeamHypotheses.add (sum includes the EOS logprob, the stored hyp
        # does not include the EOS token).
        new_len = state.cur_len.astype(jnp.float32) + 1.0
        fin_scores_cand = jnp.where(
            eos_counts, topk_log_probs / (new_len ** length_penalty), NEG_INF
        )
        all_fin_seqs = jnp.concatenate([state.finished_seqs, cand_seqs], axis=1)
        all_fin_scores = jnp.concatenate(
            [state.finished_scores, fin_scores_cand], axis=1
        )
        all_fin_flags = jnp.concatenate([state.finished_flags, eos_counts], axis=1)
        new_fin_scores, fin_idx = jax.lax.top_k(all_fin_scores, kept_beams)
        new_fin_seqs = jnp.take_along_axis(all_fin_seqs, fin_idx[:, :, None], axis=1)
        new_fin_flags = jnp.take_along_axis(all_fin_flags, fin_idx, axis=1)

        new_state = BeamState(
            cur_len=state.cur_len + 1,
            alive_seqs=new_alive_seqs,
            alive_log_probs=new_alive_scores,
            finished_seqs=new_fin_seqs,
            finished_scores=new_fin_scores,
            finished_flags=new_fin_flags,
            done=state.done,
            cache=new_cache,
        )
        return dataclasses.replace(
            new_state, done=state.done | batch_done(new_state)
        )

    state = jax.lax.while_loop(not_done, step, state)

    # Finalize: at a max-length exit HF's MaxLengthCriteria marks every
    # running candidate finished, so the top beams join the pool normalized
    # by the generated length (= cur_len here); batches already done stopped
    # collecting hypotheses.
    alive_final_scores = jnp.where(
        state.done[:, None],
        NEG_INF,
        state.alive_log_probs
        / (jnp.maximum(state.cur_len, 1).astype(jnp.float32) ** length_penalty),
    )
    pool_seqs = jnp.concatenate([state.finished_seqs, state.alive_seqs], axis=1)
    pool_scores = jnp.concatenate([state.finished_scores, alive_final_scores], axis=1)
    best = jnp.argmax(pool_scores, axis=1)
    final_seqs = jnp.take_along_axis(pool_seqs, best[:, None, None], axis=1)
    final_scores = jnp.take_along_axis(pool_scores, best[:, None], axis=1)
    # Drop the start token from the output.
    return final_seqs[:, 0, 1:], final_scores[:, 0]


def expand_to_beams(x, num_beams: int):
    """(B, ...) -> (B*K, ...) by repeating each row K times."""
    return jnp.repeat(x, num_beams, axis=0)


def greedy_decode_with_scores(
    decode_step: Callable,
    init_cache,
    batch_size: int,
    max_length: int,
    min_new_tokens: int = 0,
    eos_token_id: int = 1,
    pad_token_id: int = 0,
    decoder_start_token_id: int = 0,
    vocab_size: int = 32128,
):
    """Greedy decoding that also returns per-step logits (max_length, B, V)."""

    seqs = jnp.full((batch_size, max_length + 1), pad_token_id, jnp.int32)
    seqs = seqs.at[:, 0].set(decoder_start_token_id)
    scores = jnp.zeros((max_length, batch_size, vocab_size), jnp.float32)
    done = jnp.zeros((batch_size,), bool)

    def body(carry, t):
        seqs, cache, done, scores = carry
        cur = jax.lax.dynamic_slice_in_dim(seqs, t, 1, axis=1)
        logits, cache = decode_step(cache, cur, t)
        logits = logits.astype(jnp.float32)
        logits = jnp.where(
            (t < min_new_tokens)
            & (jnp.arange(logits.shape[-1])[None] == eos_token_id),
            NEG_INF,
            logits,
        )
        scores = jax.lax.dynamic_update_slice_in_dim(
            scores, logits[None], t, axis=0
        )
        next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        next_tok = jnp.where(done, pad_token_id, next_tok)
        done = done | (next_tok == eos_token_id)
        seqs = jax.lax.dynamic_update_slice_in_dim(
            seqs, next_tok[:, None], t + 1, axis=1
        )
        return (seqs, cache, done, scores), None

    (seqs, _, _, scores), _ = jax.lax.scan(
        body, (seqs, init_cache, done, scores), jnp.arange(max_length)
    )
    return seqs[:, 1:], scores
