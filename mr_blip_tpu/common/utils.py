"""Misc host-side utilities (job ids, path helpers, cached file resolution)."""

from __future__ import annotations

import os
from datetime import datetime

from mr_blip_tpu.common.registry import registry


def now() -> str:
    return datetime.now().strftime("%Y%m%d%H%M")[:-1]


def get_abs_path(rel_path: str) -> str:
    # library_root is the REPO root (configs/ lives beside the package)
    root = registry.get_path("library_root") or os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    return os.path.join(root, rel_path)


def get_cache_path(rel_path: str) -> str:
    cache_root = registry.get_path("cache_root") or os.path.expanduser(
        "~/.cache/mr_blip_tpu"
    )
    return os.path.expanduser(os.path.join(cache_root, rel_path))


def makedir(path: str):
    os.makedirs(path, exist_ok=True)


def cleanup_dir(path: str):
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path)


def setup_library_paths():
    """Register library_root / cache_root once at import (reference lavis/__init__.py:21-31)."""
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    if registry.get_path("library_root") is None:
        registry.register_path("library_root", repo_root)
    if registry.get_path("cache_root") is None:
        registry.register_path("cache_root", os.path.expanduser("~/.cache/mr_blip_tpu"))
    registry.register("MAX_INT", 2**31 - 1)
