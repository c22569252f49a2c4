"""Persistent XLA compilation cache setup for the entry points.

The flagship graphs are expensive to compile (beam-5 generate ~7 min, the
training step 13-26 min through this environment's remote compiler).
JAX's persistent compilation cache makes each entry point (bench.py,
train.py, evaluate.py) pay that cost once per machine instead of once per
process.

The cache directory is keyed by a host fingerprint: XLA AOT executables
encode the compile machine's CPU features, and loading an entry written
by a different host has produced silently wrong numerics in this repo's
history (a convergence test failed under a stale cache written by a
different VM type — see tests/conftest.py, which applies the same keying
for the CPU test suite).
"""

import hashlib
import os
import platform


def _host_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        flags = ""
    raw = platform.machine() + platform.processor() + flags
    return hashlib.sha1(raw.encode()).hexdigest()[:12]


def enable_compilation_cache(min_compile_time_secs: float = 1.0) -> str:
    """Point JAX's persistent compilation cache at a host-keyed directory.

    Call once, before the first jit compilation. ``MRBLIP_XLA_CACHE_DIR``
    overrides the location; ``MRBLIP_XLA_CACHE=0`` disables. Returns the
    directory in use ("" when disabled).
    """
    import jax

    if os.environ.get("MRBLIP_XLA_CACHE", "1") == "0":
        return ""
    cache_dir = os.environ.get(
        "MRBLIP_XLA_CACHE_DIR",
        os.path.expanduser(f"~/.cache/mr_blip_tpu/xla_{_host_fingerprint()}"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
    )
    return cache_dir
