from mr_blip_tpu.text.span_grammar import (
    post_process,
    moment_str_to_list,
    tal_str_to_list,
    convert_to_absolute_time,
)
from mr_blip_tpu.text.timestamps import (
    format_timestamps,
    TIME_FORMATS,
)

__all__ = [
    "post_process",
    "moment_str_to_list",
    "tal_str_to_list",
    "convert_to_absolute_time",
    "format_timestamps",
    "TIME_FORMATS",
]
