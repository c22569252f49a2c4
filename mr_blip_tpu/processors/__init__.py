from mr_blip_tpu.processors.video_processors import (
    Blip2VideoTrainProcessor,
    BlipVideoEvalProcessor,
    load_video,
)
from mr_blip_tpu.processors.text_processors import (
    BlipCaptionProcessor,
    BlipQuestionProcessor,
)
from mr_blip_tpu.processors import image_processors  # noqa: F401  (registry)

__all__ = [
    "Blip2VideoTrainProcessor",
    "BlipVideoEvalProcessor",
    "BlipCaptionProcessor",
    "BlipQuestionProcessor",
    "load_video",
]
