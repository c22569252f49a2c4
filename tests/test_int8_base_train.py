"""QLoRA-style int8 base training: frozen int8 T5 kernels + fp32 LoRA.

The int8_base layout (models/quantize.py::quantize_t5_params +
T5Config.int8_base) must (a) approximate the float forward, (b) train —
one optimizer step updates LoRA/Q-Former leaves, leaves int8 kernels
untouched, loss finite and decreasing over steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_blip_tpu.models.blip2_mr import BLIP2_MR
from mr_blip_tpu.runners.train_state import (
    TrainState,
    make_optimizer,
    make_train_step,
)


def _samples(b=2, t=2, img=28):
    rng = np.random.default_rng(0)
    dur = 60.0
    return {
        "video": rng.integers(0, 256, (b, t, img, img, 3), dtype=np.uint8),
        "timestamps": np.stack([np.linspace(0, dur, t, endpoint=False)] * b),
        "duration": np.full((b,), dur),
        "query_id": [f"q{i}" for i in range(b)],
        "video_prompt_end": ["<extra_id_0>"] * b,
        "query_prompt": ["Query: a thing\n"] * b,
        "task_prompt": ["Relevant windows: "] * b,
        "relevant_windows": ["[[10, 25]]"] * b,
    }


@pytest.fixture(scope="module")
def model():
    m = BLIP2_MR(
        img_size=28, vit_model="tiny", t5_model="tiny", task="lora",
        num_beams=2, max_new_tokens=8, compute_dtype="float32",
    )
    return m


def test_quantized_forward_close_to_float(model):
    batch = model.prepare_mr_batch(_samples())
    batch.pop("video_prompt", None)
    float_loss, _ = model._loss_fn(model.params, batch)

    import copy

    m2 = BLIP2_MR(
        img_size=28, vit_model="tiny", t5_model="tiny", task="lora",
        num_beams=2, max_new_tokens=8, compute_dtype="float32",
        init_params=False,
    )
    m2.params = copy.deepcopy(model.params)
    m2.quantize_base_for_train()
    q_loss, _ = m2._loss_fn(m2.params, batch)
    # int8 per-channel quantization: same scale, close loss
    assert np.isfinite(float(q_loss))
    assert abs(float(q_loss) - float(float_loss)) / float(float_loss) < 0.15


def test_int8_base_train_step(model):
    import copy

    m = BLIP2_MR(
        img_size=28, vit_model="tiny", t5_model="tiny", task="lora",
        num_beams=2, max_new_tokens=8, compute_dtype="float32",
        init_params=False,
    )
    m.params = copy.deepcopy(model.params)
    m.quantize_base_for_train()

    tx = make_optimizer(weight_decay=0.05, accum_grad_iters=1,
                        trainable_mask=m.trainable_mask())
    step = make_train_step(m._loss_fn, donate=False)
    state = TrainState.create(m.params, tx)
    batch = m.prepare_mr_batch(_samples())
    batch.pop("video_prompt", None)

    losses = []
    for i in range(3):
        state, loss = step(state, batch, 1e-2, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # LoRA is learning through the int8 base

    # int8 kernels untouched; a LoRA leaf moved
    blk = "block" if "block" in m.params["t5"]["encoder"] else "block_0"
    q0 = m.params["t5"]["encoder"][blk]["self_attention"]["q"]
    q1 = state.params["t5"]["encoder"][blk]["self_attention"]["q"]
    np.testing.assert_array_equal(np.asarray(q0["kernel_q"]),
                                  np.asarray(q1["kernel_q"]))
    assert q1["kernel_q"].dtype == jnp.int8
    assert not np.allclose(np.asarray(q0["lora_b"]), np.asarray(q1["lora_b"]))


def test_quantize_t5_params_layout(model):
    from mr_blip_tpu.models.quantize import quantize_t5_params

    t5q = quantize_t5_params(model.params["t5"])
    enc_sec = t5q["encoder"]
    enc = (enc_sec["block"] if "block" in enc_sec else enc_sec["block_0"])[
        "self_attention"]["q"]
    assert "kernel_q" in enc and "kernel_scale" in enc
    assert "lora_a" in enc and "lora_b" in enc  # deltas preserved, float
    assert "Dense_0" not in enc
    # embeddings and norms untouched
    assert "embedding" in t5q["shared"]
