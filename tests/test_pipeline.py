"""Pipeline parallelism: GPipe schedule equivalence + differentiability.

Runs on the 8-device virtual CPU mesh (conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mr_blip_tpu.parallel.pipeline import (
    pipeline_apply,
    sequential_reference,
    stack_stage_params,
)


def _mesh(pp):
    devs = np.array(jax.devices()[:pp])
    return Mesh(devs, ("pp",))


def _mlp_stage(params, x):
    h = jnp.tanh(x @ params["w1"] + params["b1"])
    return h @ params["w2"] + params["b2"]


def _stage_params(s, d=16, hidden=32, seed=0):
    rng = np.random.default_rng(seed + s)
    return {
        "w1": jnp.asarray(rng.standard_normal((d, hidden)) * 0.3, jnp.float32),
        "b1": jnp.zeros((hidden,), jnp.float32),
        "w2": jnp.asarray(rng.standard_normal((hidden, d)) * 0.3, jnp.float32),
        "b2": jnp.zeros((d,), jnp.float32),
    }


@pytest.mark.parametrize("pp,m", [(4, 4), (4, 8), (8, 8)])
def test_matches_sequential(pp, m):
    if len(jax.devices()) < pp:
        pytest.skip("not enough devices")
    mesh = _mesh(pp)
    per_stage = [_stage_params(s) for s in range(pp)]
    stacked = jax.device_put(
        stack_stage_params(per_stage), NamedSharding(mesh, P("pp"))
    )
    x = jnp.asarray(np.random.default_rng(9).standard_normal((m * 2, 16)),
                    jnp.float32)
    got = jax.jit(
        lambda s, x: pipeline_apply(_mlp_stage, s, x, mesh, num_microbatches=m)
    )(stacked, x)
    want = sequential_reference(_mlp_stage, per_stage, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gradients_flow_through_schedule():
    pp, m = 4, 4
    if len(jax.devices()) < pp:
        pytest.skip("not enough devices")
    mesh = _mesh(pp)
    per_stage = [_stage_params(s, seed=3) for s in range(pp)]
    stacked = jax.device_put(
        stack_stage_params(per_stage), NamedSharding(mesh, P("pp"))
    )
    x = jnp.asarray(np.random.default_rng(4).standard_normal((m, 16)),
                    jnp.float32)

    def loss_pp(s):
        return pipeline_apply(_mlp_stage, s, x, mesh,
                              num_microbatches=m).sum()

    def loss_seq(stages):
        return sequential_reference(_mlp_stage, stages, x).sum()

    g_pp = jax.jit(jax.grad(loss_pp))(stacked)
    g_seq = jax.grad(loss_seq)(per_stage)
    g_seq_stacked = stack_stage_params(g_seq)
    for k in ("w1", "b1", "w2", "b2"):
        np.testing.assert_allclose(
            np.asarray(g_pp[k]), np.asarray(g_seq_stacked[k]),
            rtol=3e-5, atol=3e-5, err_msg=k,
        )


def test_t5_block_pipeline():
    """Pipeline real T5 encoder blocks across 4 stages: equals the stacked
    sequential encoder (shared rel-pos bias handled outside the stage fn)."""
    pp = 4
    if len(jax.devices()) < pp:
        pytest.skip("not enough devices")
    from mr_blip_tpu.models.t5 import T5Block, t5_tiny_config

    cfg = t5_tiny_config()
    block = T5Block(cfg, causal=False, has_cross_attention=False,
                    compute_dtype=jnp.float32)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((8, 6, cfg.d_model)), jnp.float32)
    per_stage = [
        block.init(jax.random.PRNGKey(s), x)["params"] for s in range(pp)
    ]

    def stage_fn(params, h):
        return block.apply({"params": params}, h)

    mesh = _mesh(pp)
    stacked = jax.device_put(
        stack_stage_params(per_stage), NamedSharding(mesh, P("pp"))
    )
    got = jax.jit(
        lambda s, x: pipeline_apply(stage_fn, s, x, mesh, num_microbatches=4)
    )(stacked, x)
    want = sequential_reference(stage_fn, per_stage, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


class TestFullT5Pipeline:
    """Full encoder-decoder stack pipelined (rel-pos bias as a stage extra,
    cross-attention memory riding the microbatch tree, final norms + LoRA
    LM head) must equal the plain module forward."""

    def _setup(self, pp, layers, lora_rank=0):
        import jax.numpy as jnp
        from mr_blip_tpu.models.t5 import (
            T5ForConditionalGeneration, t5_tiny_config,
        )

        cfg = t5_tiny_config(num_layers=layers, num_decoder_layers=layers,
                             lora_rank=lora_rank)
        model = T5ForConditionalGeneration(cfg, compute_dtype=jnp.float32)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((4, 12, cfg.d_model)), jnp.float32)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 6)), jnp.int32)
        enc_mask = jnp.asarray([[1] * 12, [1] * 9 + [0] * 3] * 2, jnp.int32)
        dec_mask = jnp.asarray([[1] * 6, [1] * 4 + [0] * 2] * 2, jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x, ids,
                            encoder_mask=enc_mask, decoder_mask=dec_mask)
        return cfg, model, params, x, ids, enc_mask, dec_mask

    @pytest.mark.parametrize("pp,layers,lora", [(2, 2, 0), (2, 4, 2), (4, 4, 0)])
    def test_matches_plain_forward(self, pp, layers, lora):
        if len(jax.devices()) < pp:
            pytest.skip("not enough devices")
        import jax.numpy as jnp
        from mr_blip_tpu.models.t5_pipeline import t5_pipeline_forward

        cfg, model, params, x, ids, enc_mask, dec_mask = self._setup(
            pp, layers, lora)
        mesh = _mesh(pp)
        got = jax.jit(
            lambda p: t5_pipeline_forward(
                cfg, p["params"], x, ids, mesh, encoder_mask=enc_mask,
                decoder_mask=dec_mask, num_microbatches=pp,
                compute_dtype=jnp.float32,
            )
        )(params)
        want = model.apply(params, x, ids, encoder_mask=enc_mask,
                           decoder_mask=dec_mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_gradients_through_full_stack(self):
        pp = 2
        if len(jax.devices()) < pp:
            pytest.skip("not enough devices")
        import jax.numpy as jnp
        from mr_blip_tpu.models.t5_pipeline import t5_pipeline_forward

        cfg, model, params, x, ids, enc_mask, dec_mask = self._setup(pp, 2)
        mesh = _mesh(pp)

        def loss_pp(p):
            logits = t5_pipeline_forward(
                cfg, p["params"], x, ids, mesh, encoder_mask=enc_mask,
                decoder_mask=dec_mask, compute_dtype=jnp.float32,
            )
            return jnp.mean(logits ** 2)

        def loss_plain(p):
            logits = model.apply(p, x, ids, encoder_mask=enc_mask,
                                 decoder_mask=dec_mask)
            return jnp.mean(logits ** 2)

        g_pp = jax.jit(jax.grad(loss_pp))(params)
        g_plain = jax.grad(loss_plain)(params)
        flat_pp = jax.tree.leaves(g_pp)
        flat_plain = jax.tree.leaves(g_plain)
        assert len(flat_pp) == len(flat_plain)
        for a, b in zip(flat_pp, flat_plain):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4)
