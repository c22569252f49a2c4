"""Pipeline-parallel forward for the FULL T5 encoder-decoder stack.

Extends :mod:`mr_blip_tpu.parallel.pipeline` (GPipe microbatch schedule over
a ``pp`` mesh axis) from the bare encoder-block demo to the production
stack: shared rel-pos bias (owned by layer 0, broadcast to every stage as a
pipeline *extra*), decoder cross-attention (encoder states ride the
microbatched activation tree so every stage sees its own microbatch's
memory), final RMSNorms and the LoRA-aware LM head.

Covers the reference's scaling gap: ``lavis`` is DDP-only (SURVEY §2.4),
so Flan-T5-XXL training is capped by one GPU's memory. Here the layer
stacks shard over ``pp`` and ``jax.grad`` differentiates straight through
the ppermute schedule — a pipelined training step needs no extra machinery.

Dropout note: the pipelined path always runs ``deterministic=True`` (rng
plumbing per microbatch-stage pair is not wired); train with
``dropout_rate=0`` under pp, or use dp/tp for dropout-exact parity runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mr_blip_tpu.models.layers import Dense, RMSNormFP32
from mr_blip_tpu.models.t5 import T5Block, T5Config
from mr_blip_tpu.ops.relpos import materialize_relpos_bias
from mr_blip_tpu.parallel.pipeline import pipeline_apply


def stack_block_params(section, num_layers: int, n_stages: int):
    """params['encoder'|'decoder'] -> stage-stacked block tree.

    Leaves get shape (n_stages, layers_per_stage, ...); the stage axis is
    what pipeline_apply shards over ``pp``, the inner axis is scanned
    within a stage.
    """
    assert num_layers % n_stages == 0, (
        f"{num_layers} layers do not split into {n_stages} stages")
    if "block" in section:
        # scan layout: already stacked on a leading layer axis
        stacked = section["block"]
    else:
        blocks = [section[f"block_{i}"] for i in range(num_layers)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    per = num_layers // n_stages
    return jax.tree.map(
        lambda a: a.reshape((n_stages, per) + a.shape[1:]), stacked
    )


def t5_pipeline_forward(
    cfg: T5Config,
    params,
    inputs_embeds,
    decoder_input_ids,
    mesh,
    encoder_mask=None,
    decoder_mask=None,
    axis: str = "pp",
    num_microbatches: int | None = None,
    compute_dtype=jnp.bfloat16,
):
    """Teacher-forced logits with both layer stacks pipelined over ``axis``.

    Args:
        params: the plain T5ForConditionalGeneration param tree (replicated
            is fine — stage slices get a sharding constraint onto ``axis``;
            pre-sharding them is the production memory win).
        inputs_embeds: (B, N, d_model) encoder input (the interleaved
            frame/timestamp prompt enters as embeddings).
        decoder_input_ids: (B, T) shifted labels.
        encoder_mask / decoder_mask: (B, N) / (B, T) int validity.
    Returns:
        (B, T, vocab) fp32 logits — same function as
        T5ForConditionalGeneration.__call__ with deterministic=True.
    """
    n_stages = mesh.shape[axis]
    b, n, _ = inputs_embeds.shape
    t = decoder_input_ids.shape[1]
    if encoder_mask is None:
        encoder_mask = jnp.ones((b, n), jnp.int32)
    if decoder_mask is None:
        decoder_mask = jnp.ones((b, t), jnp.int32)

    stage_sharding = NamedSharding(mesh, P(axis))
    enc_stages = jax.lax.with_sharding_constraint(
        stack_block_params(params["encoder"], cfg.num_layers, n_stages),
        stage_sharding,
    )
    dec_stages = jax.lax.with_sharding_constraint(
        stack_block_params(params["decoder"], cfg.num_decoder_layers, n_stages),
        stage_sharding,
    )

    enc_bias = materialize_relpos_bias(
        params["encoder"]["rel_bias"]["rel_embedding"],
        jnp.arange(n), jnp.arange(n), bidirectional=True,
        num_buckets=cfg.relative_attention_num_buckets,
        max_distance=cfg.relative_attention_max_distance,
    ).astype(compute_dtype)
    dec_bias = materialize_relpos_bias(
        params["decoder"]["rel_bias"]["rel_embedding"],
        jnp.arange(t), jnp.arange(t), bidirectional=False,
        num_buckets=cfg.relative_attention_num_buckets,
        max_distance=cfg.relative_attention_max_distance,
    ).astype(compute_dtype)

    enc_block = T5Block(cfg, causal=False, has_cross_attention=False,
                        compute_dtype=compute_dtype)
    dec_block = T5Block(cfg, causal=True, has_cross_attention=True,
                        compute_dtype=compute_dtype)

    def enc_stage(stage_params, tree, bias):
        attn_mask = tree["mask"][:, None, None, :].astype(bool)

        def body(h, block_params):
            h = enc_block.apply(
                {"params": block_params}, h, None, attn_mask, None, bias,
                False, True,
            )
            return h, None

        h, _ = jax.lax.scan(body, tree["h"], stage_params)
        return {"h": h, "mask": tree["mask"]}

    enc_out = pipeline_apply(
        enc_stage, enc_stages,
        {"h": inputs_embeds.astype(compute_dtype),
         "mask": encoder_mask.astype(jnp.int32)},
        mesh, axis=axis, num_microbatches=num_microbatches,
        extras=(enc_bias,),
    )
    enc_states = RMSNormFP32(epsilon=cfg.layer_norm_epsilon).apply(
        {"params": params["encoder"]["final_norm"]}, enc_out["h"]
    )

    dec_in = jnp.take(params["shared"]["embedding"], decoder_input_ids,
                      axis=0)

    def dec_stage(stage_params, tree, bias):
        self_mask = tree["dec_mask"][:, None, None, :].astype(bool)
        cross_mask = tree["enc_mask"][:, None, None, :].astype(bool)

        def body(h, block_params):
            h = dec_block.apply(
                {"params": block_params}, h, tree["enc"], self_mask,
                cross_mask, bias, False, True,
            )
            return h, None

        h, _ = jax.lax.scan(body, tree["h"], stage_params)
        return dict(tree, h=h)

    dec_out = pipeline_apply(
        dec_stage, dec_stages,
        {"h": dec_in.astype(compute_dtype),
         "enc": enc_states.astype(compute_dtype),
         "enc_mask": encoder_mask.astype(jnp.int32),
         "dec_mask": decoder_mask.astype(jnp.int32)},
        mesh, axis=axis, num_microbatches=num_microbatches,
        extras=(dec_bias,),
    )
    h = RMSNormFP32(epsilon=cfg.layer_norm_epsilon).apply(
        {"params": params["decoder"]["final_norm"]}, dec_out["h"]
    )
    if cfg.tie_word_embeddings:
        h = h * (cfg.d_model ** -0.5)
        logits = h.astype(jnp.float32) @ params["shared"]["embedding"].T
    else:
        logits = Dense(
            cfg.vocab_size, use_bias=False, compute_dtype=compute_dtype,
            lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
            lora_dropout=cfg.lora_dropout,
        ).apply({"params": params["lm_head"]}, h)
    return logits.astype(jnp.float32)
