"""Pipelined two-stage QA evaluation == serial valid_step, row for row.

The videogqa/videoqa tasks overlap batch i's window re-decode + answerer
with batch i+1's localizer via BLIP2_MR's videoQA dispatch/redecode/
collect split. The overlap must be semantically invisible: this test runs
the same tiny dataset through both schedules and requires identical rows.
"""

import numpy as np
import pytest

from mr_blip_tpu.common.registry import registry
from mr_blip_tpu.datasets.loader import DataLoader
from mr_blip_tpu.datasets.mr_datasets import MCVideoQADataset
from mr_blip_tpu.datasets.synthetic import make_qa_annotations
from mr_blip_tpu.models.blip2_mr import BLIP2_MR
from mr_blip_tpu.processors.text_processors import BlipQuestionProcessor
from mr_blip_tpu.processors.video_processors import BlipVideoEvalProcessor


@pytest.fixture(scope="module")
def qa_setup(tmp_path_factory):
    out = tmp_path_factory.mktemp("qa_pipe")
    paths = make_qa_annotations(
        str(out), n_train=0, n_val=6, n_test=0, n_video_frames=8,
        fps=4.0, height=32, width=32, with_grounding=True,
    )
    ds = MCVideoQADataset(
        vis_processor=BlipVideoEvalProcessor(
            image_size=28, n_frms=4, normalize=False),
        text_processor=BlipQuestionProcessor(),
        vis_root="", ann_paths=[paths["val"]],
    )
    # resample_frames exercises the async submit/collect window re-decode
    # (synthetic:// readers serve immediate tickets through the same API).
    model = BLIP2_MR(
        img_size=28, vit_model="tiny", t5_model="tiny",
        task="lora_QA_with_localizer", num_beams=2, max_new_tokens=6,
        compute_dtype="float32", num_frames_for_answer=2,
        resample_frames=True,
    )
    return ds, model


def _loader(ds):
    return DataLoader(ds, batch_size=2, num_workers=1)


def test_pipelined_evaluation_matches_serial(qa_setup):
    ds, model = qa_setup
    task = registry.get_task_class("videogqa")()

    rows_pipe = task.evaluation(model, _loader(ds))

    rows_serial = []
    for i, samples in enumerate(_loader(ds)):
        samples = dict(samples)
        samples.update({"iters": i})
        rows_serial.extend(task.valid_step(model, samples))

    assert len(rows_pipe) == len(rows_serial) == len(ds)
    for a, b in zip(rows_pipe, rows_serial):
        assert a == b


def test_videoqa_task_pipelined_smoke(qa_setup):
    ds, model = qa_setup
    task = registry.get_task_class("videoqa")()
    rows = task.evaluation(model, _loader(ds))
    assert len(rows) == len(ds)
    assert all(r["prediction"] in range(5) for r in rows)
