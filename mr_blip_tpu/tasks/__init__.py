"""Tasks. Importing registers all task classes; setup_task resolves by name."""

from mr_blip_tpu.common.registry import registry

from mr_blip_tpu.tasks.base_task import BaseTask
from mr_blip_tpu.tasks.moment_retrieval import MomentRetrievalTask
from mr_blip_tpu.tasks.vqa import VideoQA, VideoGQA
from mr_blip_tpu.tasks.temporal_action_localization import TALTask
from mr_blip_tpu.tasks.captioning import CaptionTask, MultimodalClassificationTask
from mr_blip_tpu.tasks.retrieval import RetrievalTask
from mr_blip_tpu.tasks.dialogue import DialogueTask


def setup_task(cfg):
    assert "task" in cfg.run_cfg, "Task name must be provided."
    task_name = cfg.run_cfg.task
    task_cls = registry.get_task_class(task_name)
    assert task_cls is not None, f"unknown task {task_name!r}"
    return task_cls.setup_task(cfg=cfg)


__all__ = ["BaseTask", "MomentRetrievalTask", "VideoQA", "VideoGQA", "TALTask",
           "setup_task"]
