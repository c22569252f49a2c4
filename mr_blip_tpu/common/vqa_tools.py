"""Open-ended VQA accuracy (VQA devkit protocol).

Counterpart of the reference ``lavis/common/vqa_tools`` (649 LoC): answer
normalization (contractions, number words, articles, punctuation) and the
consensus accuracy ``min(#annotators_matching / 3, 1)`` averaged over all
10-choose-9 annotator subsets, per the VQAv2 evaluation spec.
"""

from __future__ import annotations

import re
from typing import Dict, List

# Standard VQA-devkit normalization data (public evaluation protocol).
CONTRACTIONS = {
    "aint": "ain't", "arent": "aren't", "cant": "can't", "couldve": "could've",
    "couldnt": "couldn't", "didnt": "didn't", "doesnt": "doesn't",
    "dont": "don't", "hadnt": "hadn't", "hasnt": "hasn't", "havent": "haven't",
    "hed": "he'd", "hes": "he's", "howd": "how'd", "howll": "how'll",
    "hows": "how's", "im": "i'm", "ive": "i've", "isnt": "isn't",
    "itd": "it'd", "itll": "it'll", "lets": "let's", "maam": "ma'am",
    "mightve": "might've", "mustve": "must've", "shed": "she'd",
    "shes": "she's", "shouldve": "should've", "shouldnt": "shouldn't",
    "thats": "that's", "theres": "there's", "theyd": "they'd",
    "theyll": "they'll", "theyre": "they're", "theyve": "they've",
    "wasnt": "wasn't", "wed": "we'd", "weve": "we've", "werent": "weren't",
    "whatll": "what'll", "whatre": "what're", "whats": "what's",
    "whatve": "what've", "whens": "when's", "whered": "where'd",
    "wheres": "where's", "whereve": "where've", "whod": "who'd",
    "wholl": "who'll", "whos": "who's", "whove": "who've", "whyll": "why'll",
    "whyre": "why're", "whys": "why's", "wont": "won't", "wouldve": "would've",
    "wouldnt": "wouldn't", "yall": "y'all", "youd": "you'd", "youll": "you'll",
    "youre": "you're", "youve": "you've",
}
NUMBER_MAP = {
    "none": "0", "zero": "0", "one": "1", "two": "2", "three": "3",
    "four": "4", "five": "5", "six": "6", "seven": "7", "eight": "8",
    "nine": "9", "ten": "10",
}
ARTICLES = {"a", "an", "the"}
_PUNCT = re.compile(r"[;/\[\]\"{}()=+\\_\-<>@`?,!.]")
_COMMA_IN_NUMBER = re.compile(r"(\d),(\d)")
_PERIOD = re.compile(r"(?<!\d)\.(?!\d)")


def process_answer(answer: str) -> str:
    """Normalize one answer string per the VQA devkit rules."""
    answer = answer.replace("\n", " ").replace("\t", " ").strip().lower()
    answer = _COMMA_IN_NUMBER.sub(r"\1\2", answer)
    answer = _PERIOD.sub("", answer)
    answer = _PUNCT.sub(" ", answer)
    words = []
    for w in answer.split():
        w = NUMBER_MAP.get(w, w)
        if w in ARTICLES:
            continue
        w = CONTRACTIONS.get(w, w)
        words.append(w)
    return " ".join(words)


class VQAEval:
    """Consensus accuracy over 10 annotator answers."""

    def __init__(self, n: int = 2):
        self.n = n
        self.accuracy: Dict[str, float] = {}
        self.eval_qa: Dict = {}

    def evaluate(self, predictions: List[dict], annotations: List[dict]) -> float:
        """predictions: [{question_id, answer}]; annotations:
        [{question_id, answers: [str x10]}]. Returns overall accuracy."""
        gt = {a["question_id"]: [process_answer(x) for x in a["answers"]]
              for a in annotations}
        accs = []
        for p in predictions:
            qid = p["question_id"]
            if qid not in gt:
                continue
            pred = process_answer(p["answer"])
            answers = gt[qid]
            # average over the 10 leave-one-out annotator subsets
            subset_accs = []
            for i in range(len(answers)):
                others = answers[:i] + answers[i + 1:]
                matches = sum(1 for a in others if a == pred)
                subset_accs.append(min(matches / 3.0, 1.0))
            acc = sum(subset_accs) / len(subset_accs)
            self.eval_qa[qid] = round(100 * acc, self.n)
            accs.append(acc)
        overall = round(100 * sum(accs) / max(len(accs), 1), self.n)
        self.accuracy["overall"] = overall
        return overall
