"""Video caption / retrieval / open-ended-QA / dialogue datasets + builders.

Compact counterparts of the reference's remaining dataset families
(``lavis/datasets/datasets/{video_caption_datasets,retrieval_datasets,
video_vqa_datasets,avsd_dialogue_datasets}.py`` and their builders):
annotation schema ``{video, caption | question+answer | dialog, ...}``,
decode through the registered video processors (uniform eval sampling by
default), emitting the sample keys the caption/retrieval/vqa/dialogue
tasks consume.

Registered names complete the reference builder table: msrvtt_caption,
msvd_caption, vatex_caption, moment_retrieval (caption-style view of MR
data, reference caption_builder.py:72), msrvtt_retrieval, didemo_retrieval,
vg_vqa, msrvtt_qa, msvd_qa, avsd_dialogue, qvh_sevilla (in builders.py).
"""

from __future__ import annotations

import os

import numpy as np

from mr_blip_tpu.common.registry import registry
from mr_blip_tpu.datasets.base_dataset import BaseDataset
from mr_blip_tpu.datasets.builders import BaseDatasetBuilder
from mr_blip_tpu.processors.video_processors import load_video, normalize_clip


class _VideoBase(BaseDataset):
    image_size = 224
    n_frms = 8

    def _frames(self, ann):
        vpath = ann.get("video", ann.get("video_path", ann.get("image")))
        if not str(vpath).startswith("synthetic://"):
            vpath = os.path.join(self.vis_root or "", vpath)
        if self.vis_processor is not None:
            frames, _, _ = self.vis_processor(vpath)
            return np.asarray(frames, np.float32)
        frames, _, _ = load_video(
            video_path=vpath, n_frms=self.n_frms, height=self.image_size,
            width=self.image_size, sampling="uniform",
        )
        return normalize_clip(frames.astype(np.float32))


class VideoCaptionDataset(_VideoBase):
    """{video, caption} -> caption-task samples (video_caption_datasets.py)."""

    def __getitem__(self, index):
        ann = self.annotation[index]
        caption = ann["caption"]
        if self.text_processor is not None:
            caption = self.text_processor(caption)
        return {
            "image": self._frames(ann),
            "text_input": caption,
            "image_id": ann.get("image_id", ann.get("video", index)),
            "gt_captions": ann.get("gt_captions", [ann["caption"]]),
        }


class VideoRetrievalDataset(VideoCaptionDataset):
    @property
    def i2t_gt(self):
        mapping = {}
        vid_index = {}
        for t_idx, ann in enumerate(self.annotation):
            key = ann.get("video", ann.get("image"))
            i_idx = vid_index.setdefault(key, len(vid_index))
            mapping.setdefault(i_idx, []).append(t_idx)
        return mapping


class OpenEndedVideoQADataset(_VideoBase):
    """{video, question, answer} (msrvtt_qa / msvd_qa)."""

    def __getitem__(self, index):
        ann = self.annotation[index]
        question = ann["question"]
        if self.text_processor is not None:
            question = self.text_processor(question)
        return {
            "image": self._frames(ann),
            "text_input": question,
            "question_id": ann.get("question_id", ann.get("instance_id", index)),
            "answers": ann.get("answers", [ann.get("answer", "")]),
        }


class AVSDDialogueDataset(BaseDataset):
    """AVSD video-grounded dialogue over pre-extracted features
    (avsd_dialogue_datasets.py): {video_feats, text_input (history),
    response} for the gpt_dialogue_model wrapper / dialogue task."""

    visual_ft_dim = 32

    def __getitem__(self, index):
        ann = self.annotation[index]
        feats = ann.get("video_feats")
        feats = (np.asarray(feats, np.float32) if feats is not None
                 else np.zeros((4, self.visual_ft_dim), np.float32))
        if self.vis_processor is not None:
            feats = self.vis_processor(feats)
        sample = {"dialog": ann.get("dialog", []),
                  "question": ann.get("question", ""),
                  "answer": ann.get("answer", "")}
        if self.text_processor is not None:
            turn = self.text_processor(sample)
        else:
            history = " ".join(
                f"{t.get('question', '')} {t.get('answer', '')}".strip()
                for t in sample["dialog"]
            )
            turn = {
                "text_input": f"{history} {sample['question']}".strip(),
                "response": sample["answer"],
            }
        return {
            "video_feats": feats,
            "text_input": turn["text_input"],
            "response": turn["response"],
            "image_id": ann.get("image_id", index),
        }


class VideoCaptionBuilder(BaseDatasetBuilder):
    data_type = "videos"
    train_dataset_cls = VideoCaptionDataset
    eval_dataset_cls = VideoCaptionDataset


class VideoRetrievalBuilder(BaseDatasetBuilder):
    data_type = "videos"
    train_dataset_cls = VideoRetrievalDataset
    eval_dataset_cls = VideoRetrievalDataset


class OpenEndedVideoQABuilder(BaseDatasetBuilder):
    data_type = "videos"
    train_dataset_cls = OpenEndedVideoQADataset
    eval_dataset_cls = OpenEndedVideoQADataset


class AVSDDialogueBuilder(BaseDatasetBuilder):
    data_type = "features"
    train_dataset_cls = AVSDDialogueDataset
    eval_dataset_cls = AVSDDialogueDataset


def _make(name, base):
    @registry.register_builder(name)
    class _B(base):
        DATASET_CONFIG_DICT = {"default": f"configs/datasets/{name}/defaults.yaml"}

    _B.__name__ = f"{name}_builder"
    return _B


MSRVTTCaptionBuilder = _make("msrvtt_caption", VideoCaptionBuilder)
MSVDCaptionBuilder = _make("msvd_caption", VideoCaptionBuilder)
VATEXCaptionBuilder = _make("vatex_caption", VideoCaptionBuilder)
# caption-style view over moment-retrieval data (caption_builder.py:72)
MomentRetrievalCaptionBuilder = _make("moment_retrieval", VideoCaptionBuilder)
MSRVTTRetrievalBuilder = _make("msrvtt_retrieval", VideoRetrievalBuilder)
DiDeMoRetrievalBuilder = _make("didemo_retrieval", VideoRetrievalBuilder)
MSRVTTQABuilder = _make("msrvtt_qa", OpenEndedVideoQABuilder)
MSVDQABuilder = _make("msvd_qa", OpenEndedVideoQABuilder)
AVSDBuilder = _make("avsd_dialogue", AVSDDialogueBuilder)
