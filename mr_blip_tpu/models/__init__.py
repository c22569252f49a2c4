"""Model zoo. Importing this package registers all model classes."""

from mr_blip_tpu.models.base import BaseModel
from mr_blip_tpu.models.eva_vit import EvaViT, eva_vit_g_config
from mr_blip_tpu.models.qformer import QFormer, qformer_base_config


def load_model(name, model_type=None, is_eval=False, checkpoint=None, **kwargs):
    """Build a registered model from its default config (reference
    ``lavis.models.load_model``).

    >>> model = load_model("blip2_mr", "pretrain_flant5xl")
    """
    from mr_blip_tpu.common.config import load_yaml
    from mr_blip_tpu.common.registry import registry

    model_cls = registry.get_model_class(name)
    assert model_cls is not None, f"unknown model {name!r}"
    cfg_path = model_cls.default_config_path(model_type)
    cfg = load_yaml(cfg_path)["model"] if cfg_path else {}
    cfg.update(kwargs)
    model = model_cls.from_config(cfg)
    if checkpoint:
        model.params = model.load_params_nonstrict(model.params, checkpoint)
    return model


def load_model_and_preprocess(name, model_type=None, is_eval=False, **kwargs):
    """Model + its train/eval processors (reference
    ``lavis.models.load_model_and_preprocess`` — same 3-tuple return:
    (model, vis_processors, txt_processors))."""
    from mr_blip_tpu.processors.text_processors import (
        BlipCaptionProcessor,
        BlipQuestionProcessor,
    )
    from mr_blip_tpu.processors.video_processors import (
        Blip2VideoTrainProcessor,
        BlipVideoEvalProcessor,
    )

    model = load_model(name, model_type=model_type, is_eval=is_eval, **kwargs)
    img = getattr(model, "img_size", 224)
    if img == 224 and hasattr(model, "config"):
        resnet_cfg = getattr(model.config, "resnet", None)
        if resnet_cfg is not None:
            img = resnet_cfg.image_size
        else:
            vision_cfg = getattr(model.config, "vision", None)
            img = getattr(vision_cfg, "img_size", img)

    # Per-family processors, as the reference's per-model preprocess_cfg
    # resolves them: video models get the video pipeline, image models the
    # still-image pipeline (lavis.models.load_model_and_preprocess builds
    # from the model yaml's preprocess block).
    video_families = ("blip2_mr", "blip2_opt_mr", "blip2_fmr", "alpro",
                      "gpt_dialogue", "timesformer")
    if any(name.startswith(f) for f in video_families):
        # The MR family normalizes uint8 frames on device (fused into the
        # patch conv), so its processors emit raw bytes — the fast path and
        # the shipped-config default. Other video zoo families expect
        # pre-normalized fp32.
        uint8_ok = name.startswith(("blip2_mr", "blip2_opt_mr", "blip2_fmr"))
        vis_processors = {
            "train": Blip2VideoTrainProcessor(
                image_size=img, normalize=not uint8_ok),
            "eval": BlipVideoEvalProcessor(
                image_size=img, normalize=not uint8_ok),
        }
    else:
        from mr_blip_tpu.processors.image_processors import (
            BlipImageEvalProcessor,
            BlipImageTrainProcessor,
        )

        vis_processors = {
            "train": BlipImageTrainProcessor(image_size=img),
            "eval": BlipImageEvalProcessor(image_size=img),
        }
    txt_processors = {
        "train": BlipCaptionProcessor(),
        "eval": BlipQuestionProcessor(),
    }
    return model, vis_processors, txt_processors


class ModelZoo:
    """String listing of registered architectures and their model types
    (reference ``lavis/models/__init__.py:228-266``)::

        >>> from mr_blip_tpu.models import model_zoo
        >>> print(model_zoo)      # table of architectures and types
        >>> len(model_zoo)        # total (arch, type) count

    Computed lazily so every registry side-effect import is included.
    """

    def _table(self):
        import mr_blip_tpu  # noqa: F401  (registry side effects)
        from mr_blip_tpu.common.registry import registry

        return {
            name: list(getattr(m, "PRETRAINED_MODEL_CONFIG_DICT", {"default": None}))
            for name, m in sorted(registry.mapping["model_name_mapping"].items())
        }

    def __str__(self) -> str:
        rows = self._table()
        return (
            "=" * 50 + "\n"
            + f"{'Architectures':<32} {'Types'}\n"
            + "=" * 50 + "\n"
            + "\n".join(f"{n:<32} {', '.join(t)}" for n, t in rows.items())
        )

    def __iter__(self):
        return iter(self._table().items())

    def __len__(self):
        return sum(len(t) for t in self._table().values())


model_zoo = ModelZoo()


__all__ = [
    "BaseModel",
    "EvaViT",
    "eva_vit_g_config",
    "QFormer",
    "qformer_base_config",
    "load_model",
    "load_model_and_preprocess",
    "model_zoo",
]
