"""BaseModel: config-driven construction and checkpoint I/O for flax models.

TPU-native counterpart of the reference ``lavis/models/base_model.py:19-247``:
``from_config`` builds from a ConfigDict, ``default_config_path`` resolves
per-model YAML defaults, and checkpoints are orbax/msgpack param trees with
non-strict loading (missing/extra keys logged, not fatal).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from mr_blip_tpu.common.utils import get_abs_path


class BaseModel:
    """Mixin for registered model wrappers (not a flax Module itself).

    Concrete models hold flax Modules plus their param trees and expose
    ``forward(params, samples)`` / ``generate(params, samples)``.
    """

    PRETRAINED_MODEL_CONFIG_DICT: Dict[str, str] = {}

    @classmethod
    def default_config_path(cls, model_type: str | None = None):
        if not cls.PRETRAINED_MODEL_CONFIG_DICT:
            return None
        if model_type is None:
            model_type = next(iter(cls.PRETRAINED_MODEL_CONFIG_DICT))
        rel = cls.PRETRAINED_MODEL_CONFIG_DICT.get(model_type)
        return get_abs_path(rel) if rel else None

    @classmethod
    def from_config(cls, cfg):
        raise NotImplementedError

    # -- checkpoint I/O ------------------------------------------------------

    @staticmethod
    def save_params(params, path: str):
        """Serialize a param pytree to msgpack."""
        from flax import serialization

        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(params))

    @staticmethod
    def load_params_nonstrict(params, path: str):
        """Load a msgpack param tree over ``params``, non-strict.

        Keys present in the file and the tree are replaced; missing keys keep
        their initialized values; extra file keys are logged and dropped —
        the analog of the reference's ``load_state_dict(strict=False)``
        (base_model.py:40-57).
        """
        from flax import serialization, traverse_util

        from mr_blip_tpu.models.scan_utils import match_scan_layout

        target_state = serialization.to_state_dict(params)
        with open(path, "rb") as f:
            loaded = serialization.msgpack_restore(f.read())
        # A flat-layout file loads over a scan-layout model and vice versa
        # (per-layer subtrees are stacked/unstacked to match the target).
        loaded_flat = traverse_util.flatten_dict(
            match_scan_layout(loaded, target_state)
        )
        params_flat = traverse_util.flatten_dict(target_state)
        missing = [k for k in params_flat if k not in loaded_flat]
        unexpected = [k for k in loaded_flat if k not in params_flat]
        if missing:
            logging.info("load_params: %d missing keys (kept init)", len(missing))
        if unexpected:
            logging.info("load_params: %d unexpected keys (dropped)", len(unexpected))
        for k in params_flat:
            if k in loaded_flat:
                loaded = loaded_flat[k]
                if np.shape(loaded) != np.shape(params_flat[k]):
                    logging.warning(
                        "load_params: shape mismatch at %s: %s vs %s (kept init)",
                        k, np.shape(loaded), np.shape(params_flat[k]),
                    )
                    continue
                params_flat[k] = jnp.asarray(loaded, dtype=params_flat[k].dtype)
        restored = traverse_util.unflatten_dict(params_flat)
        return serialization.from_state_dict(params, restored)


def count_params(params) -> int:
    import jax

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
