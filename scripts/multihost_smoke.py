"""Two-process multi-host smoke: framework dist init + dp train step.

Each process owns one CPU device; the batch is globally sharded over dp
(per-process halves placed into a global array) and the gradient psum
crosses the process boundary — the CPU-scale rehearsal of a multi-host TPU
pod run.

Run directly (spawns both workers):
    python scripts/multihost_smoke.py
Or as one worker:
    COORDINATOR_ADDRESS=127.0.0.1:23456 NUM_PROCESSES=2 PROCESS_ID=<i> \
        python scripts/multihost_smoke.py --worker
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker():
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from mr_blip_tpu.common import dist as dist_utils

    ok = dist_utils.init_distributed_mode()
    assert ok, "framework dist init did not trigger"
    assert dist_utils.get_world_size() == 2

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mr_blip_tpu.models.blip2_mr import BLIP2_MR
    from mr_blip_tpu.runners.train_state import (
        TrainState, make_optimizer, make_train_step,
    )

    model = BLIP2_MR(
        img_size=28, vit_model="tiny", t5_model="tiny", task="lora",
        num_beams=1, max_new_tokens=4, compute_dtype="float32",
    )
    rank = dist_utils.get_rank()
    # identical global batch on both processes; each keeps its dp shard
    rng = np.random.default_rng(0)
    b_global, t = 2, 2
    samples = {
        "video": rng.standard_normal((b_global, t, 28, 28, 3), np.float32),
        "timestamps": np.tile(np.array([0.0, 10.0]), (b_global, 1)),
        "duration": np.full((b_global,), 20.0),
        "query_id": [f"q{i}" for i in range(b_global)],
        "video_prompt_end": ["<extra_id_0>"] * b_global,
        "query_prompt": ["Query: something happens\n"] * b_global,
        "task_prompt": ["Relevant windows: "] * b_global,
        "relevant_windows": ["[[0, 10]]"] * b_global,
    }
    batch = model.prepare_mr_batch(samples)
    batch.pop("video_prompt")

    mesh = Mesh(np.array(jax.devices()).reshape(2, 1), ("dp", "tp"))

    def shard_global(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            sharding = NamedSharding(mesh, P("dp"))
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x)[rank : rank + 1]
            )
        return x

    import jax.tree_util as jtu

    gbatch = jax.tree.map(shard_global, batch)
    params = jax.device_put(
        model.params, NamedSharding(mesh, P())
    )
    tx = make_optimizer(trainable_mask=model.trainable_mask())
    state = TrainState.create(params, tx)
    step = make_train_step(model._loss_fn, donate=False)
    with jax.set_mesh(mesh):
        state, loss = step(state, gbatch, 1e-3, jax.random.PRNGKey(0))
    loss = float(loss)
    assert np.isfinite(loss)
    print(f"proc {rank}: dp train step OK, loss={loss:.4f}", flush=True)


def main():
    env = dict(os.environ)
    env.update(
        COORDINATOR_ADDRESS="127.0.0.1:23456", NUM_PROCESSES="2",
        JAX_PLATFORMS="cpu", PYTHONPATH=REPO,
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
    )
    procs = []
    for pid in range(2):
        e = dict(env)
        e["PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker"], env=e,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    ok = True
    for p in procs:
        out, _ = p.communicate(timeout=600)
        print(out[-2000:])
        ok &= p.returncode == 0 and "dp train step OK" in out
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    else:
        main()
