"""Training entry point.

    python train.py --cfg-path configs/projects/train/qvh.yaml \
        [--options run.max_epoch=3 model.t5_model=flan-t5-xl ...]

Counterpart of the reference ``train.py:77-130`` (minus torchrun — JAX
multi-host init is driven by env vars; see
:func:`mr_blip_tpu.common.dist.init_distributed_mode`).
"""

import argparse
import logging
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np



def _honor_platform_env():
    """The axon TPU plugin overrides JAX_PLATFORMS; honor an explicit cpu
    request through jax.config before the backend initializes."""
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass


def parse_args():
    parser = argparse.ArgumentParser(description="Training")
    parser.add_argument("--cfg-path", required=True, help="path to configuration file.")
    parser.add_argument(
        "--options",
        nargs="+",
        help="override settings, key=value or key value pairs (dot-separated keys)",
    )
    return parser.parse_args()


def setup_seeds(config):
    seed = int(config.run_cfg.get("seed", 42))
    from mr_blip_tpu.common import dist as dist_utils

    seed = seed + dist_utils.get_rank()
    random.seed(seed)
    np.random.seed(seed)


def get_runner_class(cfg):
    from mr_blip_tpu.common.registry import registry

    return registry.get_runner_class(cfg.run_cfg.get("runner", "runner_base"))


def main():
    _honor_platform_env()
    from mr_blip_tpu.common.compile_cache import enable_compilation_cache
    enable_compilation_cache()  # flagship graphs compile once per machine
    import mr_blip_tpu  # registers everything
    from mr_blip_tpu.common import dist as dist_utils
    from mr_blip_tpu.common.config import Config
    from mr_blip_tpu.common.logger import setup_logger
    from mr_blip_tpu.common.utils import now
    from mr_blip_tpu import tasks

    job_id = now()
    args = parse_args()
    cfg = Config(args)

    if cfg.run_cfg.get("validate_config", False):
        # Enforce the run-config vocabulary (the reference ships the same
        # validator but never calls it, lavis/common/config.py:261-468).
        from mr_blip_tpu.common.config_validator import (
            create_runner_config_validator,
        )

        create_runner_config_validator().validate(dict(cfg.run_cfg))
    dist_utils.init_distributed_mode(cfg.run_cfg)
    setup_seeds(cfg)
    setup_logger()
    cfg.pretty_print()

    task = tasks.setup_task(cfg)
    datasets = task.build_datasets(cfg)
    model = task.build_model(cfg)

    runner = get_runner_class(cfg)(
        cfg=cfg, job_id=job_id, task=task, model=model, datasets=datasets
    )
    resume_path = cfg.run_cfg.get("resume_ckpt_path")
    if resume_path:
        runner.load_checkpoint(resume_path)

    # SIGTERM (spot-VM preemption, maintenance drain) -> finish the current
    # step, checkpoint for resume, exit 143 within the grace window
    from mr_blip_tpu.common import preempt

    preempt.install_guard(
        sync_every=int(cfg.run_cfg.get("preempt_sync_every", 8))
    )
    try:
        runner.train()
    except preempt.TrainingPreempted as e:
        logging.warning("%s — exiting for restart", e)
        sys.exit(143)
    runner.finalize_checkpoints()


if __name__ == "__main__":
    main()
