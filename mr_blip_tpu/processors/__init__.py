from mr_blip_tpu.processors.video_processors import (
    Blip2VideoTrainProcessor,
    BlipVideoEvalProcessor,
    load_video,
)
from mr_blip_tpu.processors.text_processors import (
    BlipCaptionProcessor,
    BlipQuestionProcessor,
)

__all__ = [
    "Blip2VideoTrainProcessor",
    "BlipVideoEvalProcessor",
    "BlipCaptionProcessor",
    "BlipQuestionProcessor",
    "load_video",
]
