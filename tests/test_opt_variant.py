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


REF_OPT_FILE = "lavis/models/blip2_mr_models/blip2_mr_opt.py"


class TestLogitsToMoments:
    """Parity of the teacher-forced logit readout with the reference
    (``blip2_mr_opt.py:964-978``) on random logits, and of the single-window
    ``compute_IoU`` against the reference's OWN method body (``:1094-1131``,
    extracted live via ast — it is torch-free).

    The span post-processing oracle is the reference's shared
    ``utils.py:18-341`` (post_process / moment_str_to_list): the OPT file's
    class-local copies carry two live typos — ``isinstance(i, int)`` at
    :1086 zeroes every window, and the window split's ``(?=\\])`` lookahead
    at :1011 never splits — under which the literal OPT readout ALWAYS
    returns ``[[-1, -1]]``. We pin the intended (utils.py / T5-flagship)
    semantics instead; see BLIP2_MR_OPT.logits_to_moments's docstring.
    """

    @pytest.fixture(scope="class")
    def model(self):
        from mr_blip_tpu.models.blip2_mr_opt import BLIP2_MR_OPT

        return BLIP2_MR_OPT(
            opt_model="tiny", img_size=28, vit_model="tiny", task="lora",
            num_beams=2, max_new_tokens=6, compute_dtype="float32",
        )

    @pytest.fixture(scope="class")
    def ref_utils(self, reference_root):
        import importlib.util
        import sys
        import types

        for name in ("av", "wandb"):  # imported at top level, unused here
            sys.modules.setdefault(name, types.ModuleType(name))
        path = reference_root / "lavis/models/blip2_mr_models/utils.py"
        spec = importlib.util.spec_from_file_location("_ref_mr_utils", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    @pytest.fixture(scope="class")
    def ref_compute_iou(self, reference_root):
        """The reference's own compute_IoU, extracted from the class body."""
        import ast

        tree = ast.parse((reference_root / REF_OPT_FILE).read_text())
        for node in ast.walk(tree):
            if isinstance(node, ast.FunctionDef) and node.name == "compute_IoU":
                ns = {}
                exec(  # the method body is pure python (no imports)
                    compile(ast.Module(body=[node], type_ignores=[]),
                            "<ref compute_IoU>", "exec"), ns)
                fn = ns["compute_IoU"]
                return lambda p, t: fn(None, p, t)  # drop self
        raise AssertionError("compute_IoU not found in reference")

    def _logits_for(self, model, texts):
        """One-hot-ish logits whose argmax decodes back to ``texts``."""
        enc = model.tokenizer(texts, padding="longest")
        ids = np.asarray(enc["input_ids"])
        vocab = int(model.tokenizer.vocab_size)
        rng = np.random.default_rng(3)
        logits = rng.uniform(0.0, 1e-3, (ids.shape[0], ids.shape[1], vocab))
        b_idx, t_idx = np.meshgrid(
            np.arange(ids.shape[0]), np.arange(ids.shape[1]), indexing="ij")
        logits[b_idx, t_idx, ids] = 10.0
        return logits, ids

    def test_readout_matches_reference_pipeline(self, model, ref_utils):
        # a prompt echo before the first </s>, the span prediction after it
        # — every repair rule of the grammar exercised at least once
        texts = [
            "video 0 5 10 query</s>[[10, 25], [40, 51]]</s>",
            "echo</s>[[3 7]]</s>",          # missing comma
            "echo</s>[[25, 10]]</s>",        # reversed pair
            "echo</s>[[5,, 9]]</s>",         # doubled comma
            "echo</s>[[1, 2, 3]]</s>",       # 3-element window
            "echo</s>not a list</s>",        # garbage
            "echo</s>[[0, 4] [6, 9]]</s>",   # missing separator comma
        ]
        logits, ids = self._logits_for(model, texts)

        got = model.logits_to_moments(jnp.asarray(logits, jnp.float32))

        # reference flow verbatim (blip2_mr_opt.py:975-978), spec oracles
        # from the reference's shared utils module
        pred_string = model.tokenizer.batch_decode(np.argmax(logits, axis=2))
        pred_string = [p.split("</s>")[1] for p in pred_string]
        want = [ref_utils.moment_str_to_list(ref_utils.post_process(p))
                for p in pred_string]

        assert got == want
        # and the grammar really parsed the healthy rows (not all [[-1,-1]])
        assert got[0] == [[10.0, 25.0], [40.0, 51.0]] or got[0] == [[10, 25], [40, 51]]
        assert got[4] == [[-1, -1]]
        assert got[5] == [[-1, -1]]

    def test_readout_no_eos_hardening(self, model):
        """A decode with no </s> anywhere: the reference's [1] index raises
        (its own TODO at :972-973); ours maps to [[-1, -1]]."""
        vocab = int(model.tokenizer.vocab_size)
        ids = np.full((1, 4), model.tokenizer.unk_token_id, np.int64)
        logits = np.zeros((1, 4, vocab), np.float32)
        logits[0, np.arange(4), ids[0]] = 10.0
        assert "</s>" not in model.tokenizer.batch_decode(ids)[0]
        assert model.logits_to_moments(logits) == [[[-1, -1]]]

    def test_compute_iou_matches_reference(self, model, ref_compute_iou):
        rng = np.random.default_rng(11)
        cases = [([0.0, 10.0], [0.0, 10.0]),     # identical
                 ([0.0, 5.0], [5.0, 10.0]),      # touching -> 0
                 ([0.0, 5.0], [6.0, 10.0]),      # disjoint -> 0
                 ([2.0, 8.0], [0.0, 10.0]),      # nested
                 ([0.0, 10.0], [5.0, 15.0])]     # overlapping
        for _ in range(50):
            a = np.sort(rng.uniform(0, 100, 2)).tolist()
            b = np.sort(rng.uniform(0, 100, 2)).tolist()
            cases.append((a, b))
        for p, t in cases:
            assert model.compute_IoU(p, t) == pytest.approx(
                ref_compute_iou(p, t), abs=1e-12), (p, t)
