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


class TestClassificationAndFolderDatasets:
    def test_nlvr_pair_records(self, tmp_path):
        import json

        import numpy as np

        from mr_blip_tpu.datasets.image_datasets import ClassificationDataset
        from mr_blip_tpu.datasets.video_reader import write_test_video

        imgdir = tmp_path / "imgs"
        imgdir.mkdir()
        write_test_video(str(imgdir / "a.avi"), w=32, h=32, n_frames=1)
        write_test_video(str(imgdir / "b.avi"), w=32, h=32, n_frames=1)
        ann = [{"image": "a.avi", "image2": "b.avi",
                "sentence": "left image has a ball", "label": 1}]
        ann_path = tmp_path / "ann.json"
        ann_path.write_text(json.dumps(ann))
        ds = ClassificationDataset(vis_root=str(imgdir),
                                   ann_paths=[str(ann_path)])
        rec = ds[0]
        assert rec["label"] == 1 and "image2" in rec
        assert np.asarray(rec["image"]).shape[-1] == 3

    def test_imagefolder_scan(self, tmp_path):
        from mr_blip_tpu.datasets.image_datasets import ImageFolderDataset
        from mr_blip_tpu.datasets.video_reader import write_test_video

        root = tmp_path / "imagenet"
        for cls in ("cat", "dog"):
            (root / cls).mkdir(parents=True)
            write_test_video(str(root / cls / "x.avi"), w=32, h=32, n_frames=1)
        ds = ImageFolderDataset(vis_root=str(root), ann_paths=[])
        assert len(ds.annotation) == 2
        assert ds.classnames == ["cat", "dog"]
        labels = sorted(ds[i]["label"] for i in range(2))
        assert labels == [0, 1]

    def test_new_builders_registered(self):
        import mr_blip_tpu  # noqa: F401

        from mr_blip_tpu.common.registry import registry

        for name in ("nlvr", "snli_ve", "conceptual_caption_3m",
                     "conceptual_caption_12m", "sbu_caption", "vg_caption",
                     "laion2B_multi", "imagenet"):
            assert registry.get_builder_class(name) is not None, name


class TestNLVRTaskE2E:
    def test_classification_task_reports_accuracy(self, tmp_path):
        import numpy as np

        import mr_blip_tpu  # noqa: F401
        from mr_blip_tpu.common.registry import registry

        model = registry.get_model_class("albef_nlvr_model")(model_size="tiny")
        rng = np.random.default_rng(0)
        batch = {
            "image": rng.standard_normal((2, 28, 28, 3)).astype(np.float32),
            "image2": rng.standard_normal((2, 28, 28, 3)).astype(np.float32),
            "text_input": ["the left image shows a dot",
                           "both images are bright"],
            "label": np.array([0, 1]),
        }
        loss = float(model(batch)["loss"])
        assert np.isfinite(loss)

        task = registry.get_task_class("multimodal_classification")()
        registry.register_path("result_dir", str(tmp_path))
        results = task.valid_step(model, batch)
        assert len(results) == 2
        metrics = task.after_evaluation(results, "val", 0)
        assert "acc" in metrics and 0.0 <= metrics["acc"] <= 100.0


class TestVideoZooDatasets:
    def test_video_caption_and_retrieval(self, tmp_path):
        import json

        import numpy as np

        from mr_blip_tpu.datasets.video_zoo_datasets import (
            VideoCaptionDataset, VideoRetrievalDataset,
        )

        ann = [
            {"video": "synthetic://8x32x32@4.0#1", "caption": "a thing moves",
             "image_id": "v1"},
            {"video": "synthetic://8x32x32@4.0#1", "caption": "movement",
             "image_id": "v1"},
            {"video": "synthetic://8x32x32@4.0#2", "caption": "another clip",
             "image_id": "v2"},
        ]
        p = tmp_path / "ann.json"
        p.write_text(json.dumps(ann))
        ds = VideoCaptionDataset(vis_root="", ann_paths=[str(p)])
        rec = ds[0]
        assert rec["image"].shape[0] == ds.n_frms
        assert rec["text_input"] == "a thing moves"

        rds = VideoRetrievalDataset(vis_root="", ann_paths=[str(p)])
        gt = rds.i2t_gt
        assert gt[0] == [0, 1] and gt[1] == [2]

    def test_open_ended_video_qa(self, tmp_path):
        import json

        from mr_blip_tpu.datasets.video_zoo_datasets import OpenEndedVideoQADataset

        ann = [{"video": "synthetic://6x32x32@3.0", "question": "what moves",
                "answer": "a square", "question_id": 9}]
        p = tmp_path / "ann.json"
        p.write_text(json.dumps(ann))
        ds = OpenEndedVideoQADataset(vis_root="", ann_paths=[str(p)])
        rec = ds[0]
        assert rec["answers"] == ["a square"]
        assert rec["question_id"] == 9

    def test_avsd_dialogue_feeds_gpt_wrapper(self, tmp_path):
        import json

        import numpy as np

        import mr_blip_tpu  # noqa: F401
        from mr_blip_tpu.common.registry import registry
        from mr_blip_tpu.datasets.video_zoo_datasets import AVSDDialogueDataset

        ann = [{
            "video_feats": np.ones((3, 32)).tolist(),
            "dialog": [{"question": "who", "answer": "a cat"}],
            "question": "what happened",
            "answer": "it jumped",
        }]
        p = tmp_path / "ann.json"
        p.write_text(json.dumps(ann))
        ds = AVSDDialogueDataset(ann_paths=[str(p)])
        rec = ds[0]
        assert rec["response"] == "it jumped"
        assert "who" in rec["text_input"]

        model = registry.get_model_class("gpt_dialogue_model")(
            model_size="tiny", video_feature_dim=32)
        batch = {
            "video_feats": np.stack([rec["video_feats"]]),
            "text_input": [rec["text_input"]],
            "response": [rec["response"]],
        }
        loss = float(model(batch)["loss"])
        assert np.isfinite(loss)

    def test_all_reference_builders_registered(self):
        import mr_blip_tpu  # noqa: F401
        from mr_blip_tpu.common.registry import registry

        for name in ("msrvtt_caption", "msvd_caption", "vatex_caption",
                     "moment_retrieval", "msrvtt_retrieval",
                     "didemo_retrieval", "vg_vqa", "msrvtt_qa", "msvd_qa",
                     "avsd_dialogue", "qvh_sevilla"):
            assert registry.get_builder_class(name) is not None, name
