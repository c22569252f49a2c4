"""Convert raw benchmark annotations to the unified MR/QA JSON schema.

CLI counterpart of the reference's ``mr_BLIP_data/data_preprocess.ipynb``:
each converter emits a JSON list of records

    {qid, video, duration, query | question + a0..aN + num_option + answer,
     relevant_windows: [[start, end], ...]}

Usage:
    python scripts/data_preprocess.py qvh --input highlight_train_release.jsonl --output train.json
    python scripts/data_preprocess.py charades --input charades_sta_train.txt \
        --durations charades_durations.json --output train.json
    python scripts/data_preprocess.py anet --input train.json --output train_mr.json
    python scripts/data_preprocess.py nextqa --input train.csv \
        --vid-map map_vid_vidorID.json --output train.json
    python scripts/data_preprocess.py nextgqa --input test.csv \
        --gsub gsub_test.json --vid-map map_vid_vidorID.json --output test.json
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys


def load_jsonl(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def convert_qvh(args):
    """QVHighlights release jsonl -> unified schema (fields map 1:1)."""
    records = []
    for d in load_jsonl(args.input):
        rec = {
            "qid": d["qid"],
            "video": d["vid"],
            "duration": d["duration"],
            "query": d["query"],
            "relevant_windows": d.get("relevant_windows", []),
        }
        # keep saliency fields for the highlight-detection scorer
        for k in ("relevant_clip_ids", "saliency_scores"):
            if k in d:
                rec[k] = d[k]
        records.append(rec)
    return records


def convert_charades(args):
    """charades_sta txt ("vid start end##query") + per-video durations."""
    durations = json.load(open(args.durations)) if args.durations else {}
    records = []
    with open(args.input) as f:
        for i, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            meta, query = line.split("##", 1)
            vid, start, end = meta.split(" ")
            dur = float(durations.get(vid, 0.0))
            records.append(
                {
                    "qid": f"{vid}_{i}",
                    "video": vid,
                    "duration": dur,
                    "query": query,
                    "relevant_windows": [[float(start), float(end)]],
                }
            )
    return records


def convert_anet(args):
    """ActivityNet Captions {vid: {duration, timestamps, sentences}}."""
    raw = json.load(open(args.input))
    records = []
    i = 0
    for vid, d in raw.items():
        for ts, sent in zip(d["timestamps"], d["sentences"]):
            records.append(
                {
                    "qid": f"{vid}_{i}",
                    "video": vid.lstrip("v_") if args.strip_v_prefix else vid,
                    "duration": d["duration"],
                    "query": sent.strip(),
                    "relevant_windows": [[round(ts[0], 2), round(ts[1], 2)]],
                }
            )
            i += 1
    return records


def _read_nextqa_rows(path):
    with open(path) as f:
        return list(csv.DictReader(f))


def convert_nextqa(args):
    """NextQA CSV (+ video-id map) -> MC-QA records."""
    vid_map = json.load(open(args.vid_map)) if args.vid_map else {}
    records = []
    for row in _read_nextqa_rows(args.input):
        video = vid_map.get(str(row["video"]), str(row["video"]))
        n_opt = 5
        rec = {
            "qid": f"{row['type']}_{row['video']}_{row['qid']}",
            "video": video,
            "duration": float(row.get("duration", 0) or 0),
            "question": row["question"] + "?",
            "num_option": n_opt,
            "answer": int(row["answer"]),
        }
        for j in range(n_opt):
            rec[f"a{j}"] = row[f"a{j}"] + "."
        records.append(rec)
    return records


def convert_nextgqa(args):
    """NExT-GQA: NextQA CSV + gsub grounding segments json."""
    records = convert_nextqa(args)
    gsub = json.load(open(args.gsub))
    out = []
    for rec in records:
        vid_key = rec["qid"].split("_")[1]
        q_key = rec["qid"].split("_")[-1]
        seg = gsub.get(str(vid_key), {})
        loc = seg.get("location", {}).get(str(q_key))
        if loc is None:
            continue  # NExT-GQA keeps only grounded questions
        rec["relevant_windows"] = [[float(s), float(e)] for s, e in loc]
        if "duration" in seg:
            rec["duration"] = float(seg["duration"])
        out.append(rec)
    return out


CONVERTERS = {
    "qvh": convert_qvh,
    "charades": convert_charades,
    "anet": convert_anet,
    "nextqa": convert_nextqa,
    "nextgqa": convert_nextgqa,
}


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dataset", choices=sorted(CONVERTERS))
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--durations", help="charades: vid->duration json")
    parser.add_argument("--vid-map", help="nextqa: video-id map json")
    parser.add_argument("--gsub", help="nextgqa: grounding segments json")
    parser.add_argument("--strip-v-prefix", action="store_true")
    args = parser.parse_args()

    records = CONVERTERS[args.dataset](args)
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(records, f)
    print(f"wrote {len(records)} records to {args.output}", file=sys.stderr)


if __name__ == "__main__":
    main()
