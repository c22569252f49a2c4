"""Test configuration: force an 8-device virtual CPU mesh for all tests.

Multi-chip sharding logic is validated on a host-platform device mesh
(``--xla_force_host_platform_device_count=8``) so tests run anywhere.
Must be set before JAX initializes, hence module scope in conftest.
"""

import os

# The axon TPU plugin overrides JAX_PLATFORMS from the env, so force the
# platform through jax.config (must happen before any backend is touched).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: repeat suite runs skip XLA recompiles.
# Keyed by a host fingerprint: XLA:CPU AOT executables encode the compile
# machine's CPU features, and loading one compiled on a different host
# warns "could lead to execution errors such as SIGILL" — and has produced
# silently wrong numerics (a convergence test failed once under a stale
# cache written by a previous session's different VM type). The keying
# function is shared with the entry points' cache setup so the two can
# never drift apart.
from mr_blip_tpu.common.compile_cache import _host_fingerprint

jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/mrblip_jax_cache_{_host_fingerprint()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pathlib

import pytest

REFERENCE_ROOT = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_root():
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference repo not mounted")
    return REFERENCE_ROOT
