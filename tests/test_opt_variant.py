"""OPT decoder-only variant: cache consistency, loss, generate contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_blip_tpu.models.opt import OPTForCausalLM, opt_tiny_config


def _mr_samples(b=2, t=2, img=28):
    rng = np.random.default_rng(0)
    duration = [20.0, 30.0]
    return {
        "video": rng.standard_normal((b, t, img, img, 3), np.float32),
        "timestamps": np.stack(
            [np.linspace(0, d, t, endpoint=False) for d in duration[:b]]
        ),
        "duration": np.array(duration[:b]),
        "query_id": ["q0", "q1"][:b],
        "video_prompt_end": ["<extra_id_0>"] * b,
        "query_prompt": ["Query: a cat jumps\n", "Query: something else entirely\n"][:b],
        "task_prompt": ["Relevant windows: "] * b,
        "relevant_windows": ["[[0, 10]]", "[[5, 25]]"][:b],
    }


class TestOPTCore:
    def test_prefill_then_step_matches_full_forward(self):
        cfg = opt_tiny_config()
        n, extra = 6, 3
        cache_len = n + extra
        model = OPTForCausalLM(cfg, compute_dtype=jnp.float32,
                               decode_cache_len=cache_len)
        rng = np.random.default_rng(0)
        ids = jnp.array(rng.integers(3, 200, (2, n + extra)))
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((2, 1, cfg.hidden_size)), decode=False,
        )["params"]

        def embed(tok_ids):
            return OPTForCausalLM(cfg, compute_dtype=jnp.float32).apply(
                {"params": params}, tok_ids, method="embed_tokens"
            )

        full_logits = model.apply({"params": params}, embed(ids))

        # prefill first n tokens in one block write, then step the rest
        mask = jnp.ones((2, cache_len), jnp.int32)[:, None, None, :].astype(bool)
        _, vars0 = model.apply(
            {"params": params}, embed(ids[:, :n]), attention_mask=mask,
            decode=True, decode_position=jnp.int32(0), mutable=["cache"],
        )
        cache = jax.tree.map(jnp.zeros_like, vars0["cache"])
        _, vars1 = model.apply(
            {"params": params, "cache": cache}, embed(ids[:, :n]),
            attention_mask=mask, decode=True, decode_position=jnp.int32(0),
            mutable=["cache"],
        )
        cache = vars1["cache"]
        step_logits = []
        for t in range(n, n + extra):
            lg, upd = model.apply(
                {"params": params, "cache": cache}, embed(ids[:, t : t + 1]),
                attention_mask=mask, decode=True, decode_position=jnp.int32(t),
                mutable=["cache"],
            )
            cache = upd["cache"]
            step_logits.append(lg[:, 0])
        got = jnp.stack(step_logits, axis=1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(full_logits[:, n:]), rtol=1e-4, atol=1e-4
        )


class TestBlip2OPT:
    @pytest.fixture(scope="class")
    def model(self):
        from mr_blip_tpu.models.blip2_mr_opt import BLIP2_MR_OPT

        return BLIP2_MR_OPT(
            opt_model="tiny", img_size=28, vit_model="tiny", task="lora",
            num_beams=2, max_new_tokens=6, compute_dtype="float32",
        )

    def test_loss_finite(self, model):
        out = model.forward(_mr_samples())
        assert np.isfinite(float(out["loss"]))

    def test_generate_contract(self, model):
        out = model.generate(_mr_samples())
        assert len(out["prediction"]) == 2
        from mr_blip_tpu.text.span_grammar import moment_str_to_list

        for p in out["prediction"]:
            parsed = moment_str_to_list(p)
            assert isinstance(parsed, list)

    def test_trainable_mask(self, model):
        mask = model.trainable_mask()
        flat = jax.tree_util.tree_leaves_with_path(mask)
        vit = [v for p, v in flat if "visual_encoder" in str(p)]
        assert vit and not any(vit)
        opt_lora = [
            v for p, v in flat
            if getattr(p[0], "key", None) == "opt" and "lora_" in str(p)
        ]
        assert opt_lora and all(opt_lora)
