"""Image caption/retrieval/QA datasets over the native single-frame decode."""

import json

import numpy as np
import pytest

from mr_blip_tpu.datasets.image_datasets import (
    CaptionDataset,
    ImageQADataset,
    RetrievalDataset,
)


@pytest.fixture(scope="module")
def ann_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    anns = [
        {"image": "synthetic://1x48x64#1", "caption": "a test pattern",
         "image_id": 0},
        {"image": "synthetic://1x48x64#2", "caption": "another pattern",
         "image_id": 1},
        {"image": "synthetic://1x48x64#1", "caption": "same image again",
         "image_id": 0},
    ]
    p = d / "ann.json"
    p.write_text(json.dumps(anns))
    qa = [
        {"image": "synthetic://1x48x64#1", "question": "what is it?",
         "question_id": 5, "answers": ["pattern"] * 10},
    ]
    q = d / "qa.json"
    q.write_text(json.dumps(qa))
    return d


class TestImageDatasets:
    def test_caption_dataset(self, ann_dir):
        ds = CaptionDataset(ann_paths=[str(ann_dir / "ann.json")], vis_root="")
        ds.image_size = 28
        s = ds[0]
        assert s["image"].shape == (28, 28, 3)
        assert s["text_input"] == "a test pattern"
        assert s["gt_captions"] == ["a test pattern"]

    def test_retrieval_gt_map(self, ann_dir):
        ds = RetrievalDataset(ann_paths=[str(ann_dir / "ann.json")], vis_root="")
        gt = ds.i2t_gt
        assert gt[0] == [0, 2]  # image 1 appears in records 0 and 2
        assert gt[1] == [1]

    def test_qa_dataset(self, ann_dir):
        ds = ImageQADataset(ann_paths=[str(ann_dir / "qa.json")], vis_root="")
        ds.image_size = 28
        s = ds[0]
        assert s["question_id"] == 5
        assert len(s["answers"]) == 10
