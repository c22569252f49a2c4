"""mr_blip_tpu — a TPU-native (JAX/XLA/Pallas) video moment-retrieval and
grounded VideoQA framework with the capabilities of Mr. BLIP / Chrono.

Layer map (bottom-up):
  common/    registry, config, logging, schedulers, distributed helpers
  text/      tokenization, span grammar, timestamp formatting
  metrics/   moment-retrieval / highlight / grounded-QA metrics (pure CPU)
  ops/       Pallas TPU kernels (flash attention, fused preprocessing)
  models/    EVA ViT-g, Q-Former, T5, LoRA, BLIP2-MR composition
  datasets/  annotation loading, video decode, frame sampling, loaders
  processors/ video train/eval processors
  tasks/     moment_retrieval, videoqa, videogqa, tal
  runners/   epoch/iteration training loops, checkpointing
  parallel/  mesh construction and sharding rules
"""

__version__ = "0.1.0"

MAX_INT = 2**31 - 1

# Importing registering modules populates the registry (models, tasks,
# builders, processors, schedulers, runners) so name->class lookup works
# from a bare `import mr_blip_tpu`.
from mr_blip_tpu.common.utils import setup_library_paths as _setup_library_paths

_setup_library_paths()

from mr_blip_tpu.common import optims as _optims  # registers lr schedulers
from mr_blip_tpu import processors as _processors  # registers processors
from mr_blip_tpu.models import blip2_mr as _blip2_mr  # registers models
from mr_blip_tpu.models import blip2_mr_opt as _blip2_mr_opt
from mr_blip_tpu.models import blip2_fmr as _blip2_fmr
from mr_blip_tpu.datasets import builders as _builders  # registers builders
from mr_blip_tpu.datasets import image_datasets as _image_datasets
from mr_blip_tpu.datasets import video_zoo_datasets as _video_zoo_datasets
from mr_blip_tpu.models import gpt_dialogue as _gpt_dialogue
from mr_blip_tpu.models import pnp_vqa as _pnp_vqa
from mr_blip_tpu.models import clip as _clip
from mr_blip_tpu.models import timesformer as _timesformer
from mr_blip_tpu.models import albef as _albef
from mr_blip_tpu.models import blip_v1 as _blip_v1
from mr_blip_tpu.models import alpro as _alpro
from mr_blip_tpu.models import zoo_wrappers as _zoo_wrappers
from mr_blip_tpu import tasks as _tasks  # registers tasks
from mr_blip_tpu.runners import runner_base as _runner_base  # registers runners
from mr_blip_tpu.runners import runner_iter as _runner_iter
