"""Multi-host process helpers (TPU-native replacement for NCCL dist utils).

The reference initializes a NCCL process group per GPU
(``lavis/common/dist_utils.py:17-137``).  On TPU, multi-host coordination is
``jax.distributed.initialize`` + XLA collectives over ICI/DCN; rank-0 gating
maps to ``jax.process_index() == 0``.  Single-process runs need no init at
all — every helper degrades gracefully.
"""

from __future__ import annotations

import functools
import logging
import os

import jax


_initialized = False


def init_distributed_mode(run_cfg=None) -> bool:
    """Initialize multi-host JAX if launch env vars are present.

    Honors the standard JAX coordination variables; mirrors the reference's
    behavior of silently falling back to non-distributed mode when none are
    set (dist_utils.py:65-68).
    """
    global _initialized
    if _initialized:
        return True
    if run_cfg is not None and not run_cfg.get("distributed", True):
        return False
    coord = os.environ.get("COORDINATOR_ADDRESS") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    nproc = os.environ.get("NUM_PROCESSES") or os.environ.get("JAX_NUM_PROCESSES")
    if coord and nproc and int(nproc) > 1:
        pid = int(os.environ.get("PROCESS_ID", os.environ.get("JAX_PROCESS_ID", 0)))
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=int(nproc), process_id=pid
        )
        _initialized = True
        logging.info(
            "Initialized multi-host JAX: process %d/%d", pid, int(nproc)
        )
        return True
    return False


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def is_dist_avail_and_initialized() -> bool:
    return jax.process_count() > 1


def main_process(func):
    """Run ``func`` only on process 0 (reference ``main_process`` decorator)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        if is_main_process():
            return func(*args, **kwargs)
        return None

    return wrapper


def barrier():
    """Cross-process barrier via a tiny psum when multi-host."""
    if is_dist_avail_and_initialized():
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mr_blip_tpu_barrier")


def all_gather_object(obj):
    """Gather a python object from every process (rank-ordered list)."""
    if not is_dist_avail_and_initialized():
        return [obj]
    from jax.experimental import multihost_utils

    return list(multihost_utils.process_allgather(obj, tiled=False))
