"""VideoQA / grounded VideoGQA tasks.

Matches the reference ``lavis/tasks/vqa.py:436-860``: multiple-choice
accuracy with per-question-type breakdown (qid prefixes; STAR group
average), and for NExT-GQA the grounding metrics (Acc@GQA, mIoP/TIoP,
mIoU/TIoU) via :func:`mr_blip_tpu.metrics.grounded_qa.eval_ground`.
"""

from __future__ import annotations

import json
import logging
import os

import numpy as np

from mr_blip_tpu.common import dist as dist_utils
from mr_blip_tpu.common.registry import registry
from mr_blip_tpu.metrics.grounded_qa import eval_ground
from mr_blip_tpu.tasks.base_task import BaseTask

ANS_MAPPING = {"A": 0, "B": 1, "C": 2, "D": 3, "E": 4}


@registry.register_task("videoqa")
class VideoQA(BaseTask):
    def __init__(self):
        super().__init__()
        self.ANS_MAPPING = ANS_MAPPING

    def valid_step(self, model, samples):
        return self._rows_from_outputs(model.videoQA_generate(samples), samples)

    def _rows_from_outputs(self, outputs, samples):
        results = []
        answer = outputs["answer"]
        qid = outputs["qid"]
        output_text = outputs["output_text"]
        frame_idx = outputs.get("frame_idx", [0] * len(qid))
        assert len(qid) == len(output_text) == len(answer)

        for a, q, o, f in zip(answer, qid, output_text, frame_idx):
            results.append(
                {
                    "qid": q,
                    "prediction": o,
                    "target": self.ANS_MAPPING[a[-1]],
                    "frame_idx": f,
                }
            )
        return results

    def evaluation(self, model, data_loader, **kwargs):
        """One-deep pipelined two-stage eval: batch i's host window
        re-decode (native pool) and answerer overlap batch i+1's device
        localizer via the model's videoQA dispatch/redecode/collect split
        (the reference serializes the mid-model re-decode against the GPU,
        blip2_mr.py:1167-1230)."""
        if not hasattr(model, "videoQA_dispatch"):
            return super().evaluation(model, data_loader, **kwargs)
        from mr_blip_tpu.common.logger import MetricLogger

        metric_logger = MetricLogger(delimiter="  ")
        results, pending = [], None
        for i, samples in enumerate(
            metric_logger.log_every(data_loader, 10, "Evaluation")
        ):
            samples = dict(samples)
            samples.update({"iters": i})
            handle = model.videoQA_dispatch(samples)
            if pending is not None:
                h = model.videoQA_redecode(pending)
                results.extend(self._rows_from_outputs(
                    model.videoQA_collect(h), h["samples"]))
            pending = handle
        if pending is not None:
            h = model.videoQA_redecode(pending)
            results.extend(self._rows_from_outputs(
                model.videoQA_collect(h), h["samples"]))
        dist_utils.barrier()
        return results

    def after_evaluation(self, val_result, split_name, epoch, **kwargs):
        eval_result_file = self.save_result(
            result=val_result,
            result_dir=registry.get_path("result_dir"),
            filename="{}_epoch{}".format(split_name, epoch),
        )
        return self._report_metrics(
            eval_result_file=eval_result_file, split_name=split_name
        )

    @staticmethod
    def _accuracy_breakdown(results):
        total_num = len(results)
        acc = 0
        qtype_correct, qtype_total = {}, {}
        for r in results:
            qtype = str(r["qid"]).split("_")[0]
            qtype_total[qtype] = qtype_total.get(qtype, 0) + 1
            if r["prediction"] == r["target"]:
                acc += 1
                qtype_correct[qtype] = qtype_correct.get(qtype, 0) + 1
        metrics = {}
        for qtype in qtype_total:
            metrics[qtype] = qtype_correct.get(qtype, 0) / qtype_total[qtype] * 100
        metrics["agg_metrics"] = acc / total_num
        metrics["total"] = total_num
        # STAR reports the mean over its four question groups.
        star_groups = ("Interaction", "Sequence", "Prediction", "Feasibility")
        if all(g in metrics for g in star_groups):
            metrics["agg_metrics"] = sum(metrics[g] for g in star_groups) / 4
        return metrics

    @dist_utils.main_process
    def _report_metrics(self, eval_result_file, split_name):
        results = json.load(open(eval_result_file))
        metrics = self._accuracy_breakdown(results)
        log_stats = {split_name: dict(metrics)}
        out_dir = registry.get_path("output_dir")
        if out_dir:
            with open(os.path.join(out_dir, "evaluate.txt"), "a") as f:
                f.write(json.dumps(log_stats) + "\n")
        logging.info(metrics)
        return metrics


@registry.register_task("videogqa")
class VideoGQA(VideoQA):
    def valid_step(self, model, samples):
        return self._rows_from_outputs(model.videoQA_generate(samples), samples)

    def _rows_from_outputs(self, outputs, samples):
        results = []
        answer = outputs["answer"]
        qid = outputs["qid"]
        output_text = outputs["output_text"]
        relevant_moments = outputs["relevant_moments"]
        relevant_moments_gt = np.asarray(outputs["relevant_moments_gt"]).tolist()
        duration = samples["duration"]
        frame_idx = outputs.get("frame_idx", [0] * len(qid))
        assert len(qid) == len(output_text) == len(answer)

        # relevant_moments comes batched in a single-element list
        moments = relevant_moments[0] if len(relevant_moments) == 1 else relevant_moments

        for a, q, o, f, d, m, mgt in zip(
            answer, qid, output_text, frame_idx, duration, moments,
            relevant_moments_gt,
        ):
            results.append(
                {
                    "qid": q,
                    "prediction": o,
                    "target": self.ANS_MAPPING[a[-1]],
                    "frame_idx": f,
                    "relevant_moments": [m],
                    "relevant_moments_gt": mgt,
                    "duration": float(d),
                }
            )
        return results

    @dist_utils.main_process
    def _report_metrics(self, eval_result_file, split_name):
        results = json.load(open(eval_result_file))
        metrics = self._accuracy_breakdown(results)
        agg, total = metrics.pop("agg_metrics"), metrics.pop("total")
        metrics.update(eval_ground(results))
        metrics.update({"agg_metrics": agg, "total": total})
        log_stats = {split_name: dict(metrics)}
        out_dir = registry.get_path("output_dir")
        if out_dir:
            with open(os.path.join(out_dir, "evaluate.txt"), "a") as f:
                f.write(json.dumps(log_stats) + "\n")
        logging.info(metrics)
        return metrics


@registry.register_task("frameqa")
class FrameQA(VideoQA):
    """Single-frame QA ablation (reference vqa.py:333-433): same contract as
    videoqa; the model's localizer variant decides frame selection."""


@registry.register_task("image_text_pretrain")
class ImageTextPretrainTask(BaseTask):
    """Pretraining-only task (reference ``lavis/tasks/image_text_pretrain.py``
    — its evaluation is a no-op; training runs the model's pretraining
    objectives through the standard inner loop)."""

    def evaluation(self, model, data_loader, **kwargs):
        return None

    def after_evaluation(self, val_result, split_name, epoch, **kwargs):
        return {"agg_metrics": 0.0}


@registry.register_task("vqa_reading_comprehension")
class VQARCTask(BaseTask):
    """Zero-shot PNP-VQA reading comprehension
    (reference ``lavis/tasks/vqa_reading_comprehension.py:22-153``): the
    model's gradcam->captions->reader pipeline answers open questions; the
    per-question captions ride along in the saved results."""

    def __init__(self, num_beams=1, max_len=10, min_len=1):
        super().__init__()
        self.num_beams = num_beams
        self.max_len = max_len
        self.min_len = min_len

    @classmethod
    def setup_task(cls, cfg=None, **kwargs):
        run_cfg = cfg.run_cfg if cfg is not None else {}
        return cls(
            num_beams=run_cfg.get("num_beams", 1),
            max_len=run_cfg.get("max_len", 10),
            min_len=run_cfg.get("min_len", 1),
        )

    def valid_step(self, model, samples):
        answers = model.predict_answers(
            samples["image"], samples["text_input"],
            question_ids=samples.get("question_ids"),
        )
        rows = []
        for i, (ans, qid) in enumerate(zip(answers, samples["question_id"])):
            rows.append({"question_id": qid, "answer": ans})
        return rows

    def after_evaluation(self, val_result, split_name, epoch, **kwargs):
        result_file = self.save_result(
            val_result,
            result_dir=registry.get_path("result_dir"),
            filename=f"{split_name}_vqa_result",
            remove_duplicate="question_id",
        )
        return self._report_metrics(result_file, split_name)

    @dist_utils.main_process
    def _report_metrics(self, result_file, split_name):
        import json as _json

        results = _json.load(open(result_file))
        metrics = {"agg_metrics": 0.0, "total": len(results)}
        logging.info(metrics)
        return metrics


@registry.register_task("gqa_reading_comprehension")
class GQARCTask(VQARCTask):
    """GQA variant: exact-match accuracy against the single gold answer
    (reference ``vqa_reading_comprehension.py:156-``)."""

    def valid_step(self, model, samples):
        answers = model.predict_answers(
            samples["image"], samples["text_input"],
            question_ids=samples.get("question_ids"),
        )
        gts = samples.get("answers") or [None] * len(answers)
        rows = []
        for ans, qid, gt in zip(answers, samples["question_id"], gts):
            gold = gt[0] if isinstance(gt, (list, tuple)) and gt else gt
            rows.append({"question_id": qid, "answer": ans, "gt_ans": gold})
        return rows

    @dist_utils.main_process
    def _report_metrics(self, result_file, split_name):
        import json as _json

        results = _json.load(open(result_file))
        acc = [
            1.0 if r.get("gt_ans") and r["answer"] == r["gt_ans"] else 0.0
            for r in results
        ]
        metrics = {
            "agg_metrics": 100.0 * float(np.mean(acc)) if acc else 0.0,
            "total": len(results),
        }
        logging.info(metrics)
        return metrics


def _model_answers(model, samples):
    """Duck-typed answer extraction shared by the open-ended VQA tasks:
    prefer ``predict_answers`` (reference VQATask protocol), fall back to
    ``generate`` returning {"answer"|"captions": [...]} or a plain list."""
    if hasattr(model, "predict_answers"):
        out = model.predict_answers(samples)
    else:
        out = model.generate(samples)
    if isinstance(out, dict):
        out = out.get("answer", out.get("answers", out.get("captions", out)))
    return list(out)


@registry.register_task("vqa")
class VQATask(BaseTask):
    """Classic open-ended VQA (reference ``lavis/tasks/vqa.py:32-180``):
    per-question predicted answer strings scored with the VQA devkit
    consensus rule (min(matches/3, 1) over 10 annotator answers) via
    :mod:`mr_blip_tpu.common.vqa_tools`."""

    def valid_step(self, model, samples):
        answers = _model_answers(model, samples)
        return [
            {"question_id": qid, "answer": ans, "gt_answers": list(gt)}
            for qid, ans, gt in zip(
                samples["question_id"], answers,
                samples.get("answers", [[]] * len(answers)),
            )
        ]

    def after_evaluation(self, val_result, split_name, epoch, **kwargs):
        result_file = self.save_result(
            val_result, result_dir=registry.get_path("result_dir"),
            filename=f"{split_name}_vqa_epoch{epoch}",
            remove_duplicate="question_id",
        )
        return self._report_metrics(result_file, split_name)

    @dist_utils.main_process
    def _report_metrics(self, result_file, split_name):
        import json as _json

        from mr_blip_tpu.common.vqa_tools import VQAEval

        results = _json.load(open(result_file))
        anns = [{"question_id": r["question_id"],
                 "answers": r.get("gt_answers") or []} for r in results]
        preds = [{"question_id": r["question_id"], "answer": r["answer"]}
                 for r in results]
        acc = VQAEval().evaluate(preds, anns)
        metrics = {"agg_metrics": acc, "acc": acc, "total": len(results)}
        logging.info(metrics)
        return metrics


@registry.register_task("gqa")
class GQATask(VQATask):
    """GQA: exact match after devkit normalization (reference vqa.py:183-247)."""

    @dist_utils.main_process
    def _report_metrics(self, result_file, split_name):
        import json as _json

        from mr_blip_tpu.common.vqa_tools import process_answer

        results = _json.load(open(result_file))
        acc = [
            1.0 if r.get("gt_answers")
            and process_answer(r["answer"]) == process_answer(r["gt_answers"][0])
            else 0.0
            for r in results
        ]
        accuracy = 100.0 * float(np.mean(acc)) if acc else 0.0
        metrics = {"agg_metrics": accuracy, "acc": accuracy,
                   "total": len(results)}
        logging.info(metrics)
        return metrics


@registry.register_task("aok_vqa")
class AOKVQATask(VQATask):
    """A-OKVQA direct-answer accuracy: min(matches/3, 1) over the gt list
    (reference vqa.py:276-301, per the official aokvqa evaluator)."""

    @dist_utils.main_process
    def _report_metrics(self, result_file, split_name):
        import json as _json

        results = _json.load(open(result_file))
        acc = []
        for r in results:
            gt = r.get("gt_answers") or []
            num_match = sum(r["answer"] == g for g in gt)
            acc.append(min(1.0, num_match / 3.0))
        accuracy = 100.0 * float(np.mean(acc)) if acc else 0.0
        metrics = {"agg_metrics": accuracy, "acc": accuracy,
                   "total": len(results)}
        logging.info(metrics)
        return metrics
