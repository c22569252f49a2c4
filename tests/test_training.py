"""Training step tests: loss decreases, masking policy, dp-mesh equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_blip_tpu.models.blip2_mr import BLIP2_MR
from mr_blip_tpu.parallel.mesh import make_mesh, pad_batch_to_multiple, replicate, shard_batch
from mr_blip_tpu.runners.train_state import (
    TrainState,
    make_optimizer,
    make_train_step,
    trainable_param_count,
)


@pytest.fixture(scope="module")
def tiny():
    model = BLIP2_MR(
        img_size=28, vit_model="tiny", t5_model="tiny", num_beams=1,
        max_new_tokens=4, task="lora", compute_dtype="float32",
    )
    rng = np.random.default_rng(0)
    b, t = 4, 2
    samples = {
        "video": rng.standard_normal((b, t, 28, 28, 3), np.float32),
        "timestamps": np.tile(np.array([0.0, 10.0]), (b, 1)),
        "duration": np.full((b,), 20.0),
        "query_id": [f"q{i}" for i in range(b)],
        "video_prompt_end": ["<extra_id_0>"] * b,
        "query_prompt": ["Query: something happens\n"] * b,
        "task_prompt": ["Relevant windows: "] * b,
        "relevant_windows": ["[[0, 10]]"] * b,
    }
    batch = model.prepare_mr_batch(samples)
    batch.pop("video_prompt")
    return model, batch


class TestTrainStep:
    def test_loss_decreases(self, tiny):
        model, batch = tiny
        tx = make_optimizer(
            weight_decay=0.05, trainable_mask=model.trainable_mask()
        )
        state = TrainState.create(model.params, tx)
        step = make_train_step(model._loss_fn, donate=False)
        rng = jax.random.PRNGKey(0)
        losses = []
        for _ in range(8):
            state, loss = step(state, batch, 5e-3, rng)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses

    def test_frozen_params_unchanged(self, tiny):
        model, batch = tiny
        mask = model.trainable_mask()
        tx = make_optimizer(trainable_mask=mask)
        state = TrainState.create(model.params, tx)
        step = make_train_step(model._loss_fn, donate=False)
        new_state, _ = step(state, batch, 1e-2, jax.random.PRNGKey(0))

        flat_old = jax.tree_util.tree_leaves_with_path(model.params)
        flat_new = dict(jax.tree_util.tree_leaves_with_path(new_state.params))
        flat_mask = dict(jax.tree_util.tree_leaves_with_path(mask))
        changed_frozen, changed_trainable = [], 0
        for path, old in flat_old:
            new = flat_new[path]
            same = np.allclose(np.asarray(old), np.asarray(new))
            if flat_mask[path]:
                changed_trainable += 0 if same else 1
            elif not same:
                changed_frozen.append(str(path))
        assert not changed_frozen, changed_frozen[:5]
        assert changed_trainable > 0

    def test_mask_stop_grad_step_matches_unmasked(self, tiny):
        """Passing trainable_mask to make_train_step (stop-grad on frozen
        leaves, so autodiff never emits the frozen dW matmuls) must produce
        the exact same post-step state as the mask-free step, where the
        computed frozen grads are discarded by the optimizer's set_to_zero
        branch instead."""
        model, batch = tiny
        mask = model.trainable_mask()
        rng = jax.random.PRNGKey(0)

        tx_a = make_optimizer(trainable_mask=mask)
        s_a = TrainState.create(model.params, tx_a)
        step_a = make_train_step(model._loss_fn, donate=False)
        s_a, loss_a = step_a(s_a, batch, 1e-2, rng)

        tx_b = make_optimizer(trainable_mask=mask)
        s_b = TrainState.create(model.params, tx_b)
        step_b = make_train_step(
            model._loss_fn, donate=False, trainable_mask=mask
        )
        s_b, loss_b = step_b(s_b, batch, 1e-2, rng)

        assert float(loss_a) == float(loss_b)
        flat_a = jax.tree_util.tree_leaves_with_path(s_a.params)
        flat_b = dict(jax.tree_util.tree_leaves_with_path(s_b.params))
        for path, leaf_a in flat_a:
            # forward graphs are identical; backward graphs differ only by
            # the removed frozen-dW subgraphs, so allow fusion-level noise
            np.testing.assert_allclose(
                np.asarray(leaf_a), np.asarray(flat_b[path]),
                rtol=1e-6, atol=1e-7, err_msg=str(path),
            )

    def test_trainable_count_small_fraction(self, tiny):
        model, _ = tiny
        trainable, total = trainable_param_count(
            model.params, model.trainable_mask()
        )
        assert 0 < trainable < total

    def test_grad_accumulation_matches_big_batch(self, tiny):
        model, batch = tiny
        mask = model.trainable_mask()

        # two half-batches accumulated == one full batch step
        half1 = jax.tree.map(lambda x: x[:2] if hasattr(x, "ndim") and x.ndim else x, batch)
        half2 = jax.tree.map(lambda x: x[2:] if hasattr(x, "ndim") and x.ndim else x, batch)

        tx_full = make_optimizer(trainable_mask=mask)
        s_full = TrainState.create(model.params, tx_full)
        step_full = make_train_step(model._loss_fn, donate=False)
        s_full, _ = step_full(s_full, batch, 1e-2, jax.random.PRNGKey(0))

        tx_acc = make_optimizer(trainable_mask=mask, accum_grad_iters=2)
        s_acc = TrainState.create(model.params, tx_acc)

        def loss_no_rng(params, batch, rng):
            return model._loss_fn(params, batch, None)

        step_acc = make_train_step(loss_no_rng, donate=False)
        s_acc, _ = step_acc(s_acc, half1, 1e-2, jax.random.PRNGKey(0))
        s_acc, _ = step_acc(s_acc, half2, 1e-2, jax.random.PRNGKey(0))

        # compare a trainable leaf (lora) — mean of halves == full-batch grad
        # only when the loss is a mean over examples with equal weights; our
        # loss is token-mean so expect close but not exact: tolerance check.
        def get_lora(p):
            flat = jax.tree_util.tree_leaves_with_path(p)
            return [np.asarray(v) for k, v in flat if "lora_a" in str(k)][0]

        full_leaf = get_lora(s_full.params)
        acc_leaf = get_lora(s_acc.params)
        init_leaf = get_lora(model.params)
        # both moved, in a similar direction
        assert not np.allclose(full_leaf, init_leaf)
        assert not np.allclose(acc_leaf, init_leaf)

    def test_dp_mesh_matches_single_device(self, tiny):
        model, batch = tiny
        mask = model.trainable_mask()
        mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])

        tx = make_optimizer(trainable_mask=mask)
        step = make_train_step(model._loss_fn, donate=False)

        # single device
        s1 = TrainState.create(model.params, tx)
        s1, loss1 = step(s1, batch, 1e-2, jax.random.PRNGKey(0))

        # dp=4 mesh
        with mesh:
            params_r = replicate(model.params, mesh)
            s4 = TrainState.create(params_r, tx)
            batch_s, _ = pad_batch_to_multiple(batch, 4)
            batch_s = shard_batch(batch_s, mesh)
            s4, loss4 = step(s4, batch_s, 1e-2, jax.random.PRNGKey(0))

        assert abs(float(loss1) - float(loss4)) < 1e-4

        def get_leaf(p, needle):
            flat = jax.tree_util.tree_leaves_with_path(p)
            return [np.asarray(v) for k, v in flat if needle in str(k)][0]

        np.testing.assert_allclose(
            get_leaf(s1.params, "lora_a"), get_leaf(s4.params, "lora_a"),
            rtol=1e-4, atol=1e-5,
        )


class TestTensorParallel:
    def test_tp_mesh_matches_single_device(self, tiny):
        """dp=2 x tp=2 sharded step must match the unsharded step."""
        import jax
        from mr_blip_tpu.parallel.sharding_rules import describe_sharding, shard_params

        model, batch = tiny
        mask = model.trainable_mask()
        mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
        tx = make_optimizer(trainable_mask=mask)
        step = make_train_step(model._loss_fn, donate=False)

        s1 = TrainState.create(model.params, tx)
        s1, loss1 = step(s1, batch, 1e-2, jax.random.PRNGKey(0))

        with mesh:
            params_s = shard_params(model.params, mesh)
            sharded = describe_sharding(model.params, mesh)
            assert sharded, "no parameters were TP-sharded"
            s2 = TrainState.create(params_s, tx)
            batch_s, _ = pad_batch_to_multiple(batch, 2)
            batch_s = shard_batch(batch_s, mesh)
            s2, loss2 = step(s2, batch_s, 1e-2, jax.random.PRNGKey(0))

        assert abs(float(loss1) - float(loss2)) < 1e-4

        def get_leaf(p, needle):
            import jax

            flat = jax.tree_util.tree_leaves_with_path(p)
            return [np.asarray(v) for k, v in flat if needle in str(k)][0]

        np.testing.assert_allclose(
            get_leaf(s1.params, "lora_a"), get_leaf(s2.params, "lora_a"),
            rtol=1e-4, atol=1e-5,
        )
