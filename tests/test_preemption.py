"""Preemption-tolerant training (common/preempt.py).

The reference loses everything since the last end-of-epoch checkpoint on
SIGTERM (external torchrun restart only, reference runner_base.py:572-644);
here SIGTERM finishes the current step, writes full resume state
(params + Adam moments + step) with ``epoch_complete=False``, exits 143,
and a resume run re-runs the interrupted epoch.
"""

import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestPreemptionGuard:
    def test_sigterm_sets_flag_and_chains(self):
        from mr_blip_tpu.common.preempt import PreemptionGuard

        seen = []
        prev = signal.signal(signal.SIGTERM, lambda s, f: seen.append(s))
        try:
            g = PreemptionGuard().install()
            assert not g.requested_locally()
            os.kill(os.getpid(), signal.SIGTERM)
            assert g.requested_locally()
            # single-process should_stop ignores sync cadence
            assert g.should_stop(step=0) and g.should_stop(step=3)
            # previous Python-level handler still ran (chained)
            assert seen == [signal.SIGTERM]
            g.uninstall()
            # uninstall restored our lambda
            os.kill(os.getpid(), signal.SIGTERM)
            assert seen == [signal.SIGTERM, signal.SIGTERM]
        finally:
            signal.signal(signal.SIGTERM, prev)

    def test_request_programmatic(self):
        from mr_blip_tpu.common.preempt import PreemptionGuard

        g = PreemptionGuard()  # not installed: no signal handler needed
        assert not g.should_stop(step=0)
        g.request()
        assert g.should_stop(step=0)

    def test_inner_loop_raises_at_step_boundary(self):
        """A requested guard stops the real train loop mid-epoch."""
        from mr_blip_tpu.common import preempt

        preempt._guard = preempt.PreemptionGuard()  # no handler install
        try:
            from mr_blip_tpu.models.blip2_mr import BLIP2_MR
            from mr_blip_tpu.tasks.moment_retrieval import MomentRetrievalTask

            model = BLIP2_MR(
                img_size=28, vit_model="tiny", t5_model="tiny", task="lora",
                num_beams=1, max_new_tokens=4, compute_dtype="float32",
            )
            task = MomentRetrievalTask()

            import numpy as np

            def batches():
                rng = np.random.default_rng(0)
                while True:
                    t = 2
                    yield {
                        "video": rng.standard_normal((1, t, 28, 28, 3)).astype(
                            np.float32),
                        "timestamps": np.linspace(0, 10, t)[None],
                        "duration": np.asarray([10.0]),
                        "query_id": ["q0"],
                        "video_prompt_end": ["<extra_id_0>"],
                        "query_prompt": ["Query: x\n"],
                        "task_prompt": ["find it: "],
                        "relevant_windows": ["[[1, 2]]"],
                    }

            from mr_blip_tpu.common.optims import LinearWarmupCosineLRScheduler
            from mr_blip_tpu.runners.runner_base import TrainCtx
            from mr_blip_tpu.runners.train_state import (
                TrainState, make_optimizer, make_train_step,
            )

            import jax

            tx = make_optimizer(trainable_mask=model.trainable_mask())
            state = TrainState.create(model.params, tx)
            ctx = TrainCtx(
                model=model, state=state,
                step_fn=make_train_step(model._loss_fn), mesh=None,
                rng=jax.random.PRNGKey(0),
            )
            sched = LinearWarmupCosineLRScheduler(
                max_epoch=1, min_lr=1e-5, init_lr=1e-4, warmup_steps=2,
            )
            # stop after step 1: request before running
            preempt._guard.request()
            with pytest.raises(preempt.TrainingPreempted) as ei:
                task._train_inner_loop(
                    epoch=0, iters_per_epoch=100, model=model,
                    data_loader=batches(), train_ctx=ctx,
                    lr_scheduler=sched, log_freq=1000,
                )
            assert ei.value.inner_iter == 0  # first step boundary
        finally:
            preempt._guard = None


@pytest.mark.slow
def test_sigterm_checkpoint_resume_e2e(tmp_path):
    """Subprocess train run SIGTERMed mid-training must exit 143 with a
    resume_state (epoch_complete=False); a resume run completes."""
    sys.path.insert(0, REPO)
    from mr_blip_tpu.datasets.synthetic import make_mr_annotations

    synth = tmp_path / "synth"
    make_mr_annotations(str(synth), n_train=8, n_val=2, n_test=2,
                        n_video_frames=20, fps=5.0, height=48, width=64)

    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        PYTHONPATH=REPO,
    )
    out_dir = tmp_path / "out"
    base_cmd = [
        sys.executable, os.path.join(REPO, "train.py"),
        "--cfg-path",
        os.path.join(REPO, "configs/projects/train/tiny_synthetic.yaml"),
        "--options",
        f"datasets.qvh.build_info.annotations.train.storage={synth}/train.json",
        f"datasets.qvh.build_info.annotations.val.storage={synth}/val.json",
        f"datasets.qvh.build_info.annotations.test.storage={synth}/test.json",
        f"run.output_dir={out_dir}",
        "run.batch_size_train=2", "run.batch_size_eval=2",
        "run.num_workers=1", "run.max_epoch=50", "run.valid_splits=[]",
        "run.test_splits=[]",
    ]
    log = tmp_path / "child.log"
    with open(log, "w") as lf:
        proc = subprocess.Popen(base_cmd, env=env, stdout=lf, stderr=lf)
        # wait until training is past epoch 1 (compiled, mid-run), then TERM
        deadline = time.time() + 600
        while time.time() < deadline:
            if proc.poll() is not None:
                pytest.fail(
                    "train exited before signal: " + log.read_text()[-3000:])
            if "Start training epoch 2" in log.read_text():
                break
            time.sleep(0.5)
        else:
            pytest.fail("never reached epoch 2: " + log.read_text()[-3000:])
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=300)
    assert rc == 143, log.read_text()[-3000:]

    job_dirs = list(out_dir.iterdir())
    assert len(job_dirs) == 1
    resume = job_dirs[0] / "resume_state.msgpack"
    assert resume.exists(), "preemption checkpoint missing"

    from flax import serialization

    obj = serialization.msgpack_restore(resume.read_bytes())
    assert bool(obj["epoch_complete"]) is False
    preempt_epoch = int(obj["epoch"])
    assert preempt_epoch >= 2
    assert int(obj["step"]) > 0  # optimizer state advanced past step 0

    # resume: re-runs the interrupted epoch, then finishes cleanly
    resume_cmd = base_cmd + [
        f"run.resume_ckpt_path={resume}",
        f"run.max_epoch={preempt_epoch + 1}",
    ]
    proc2 = subprocess.run(
        resume_cmd, env=env, capture_output=True, text=True, timeout=900)
    assert proc2.returncode == 0, proc2.stderr[-3000:]
    merged = log.read_text() + proc2.stderr + proc2.stdout
    assert "Resume checkpoint loaded" in merged
    assert f"(epoch {preempt_epoch})" in merged  # re-runs, not skips
