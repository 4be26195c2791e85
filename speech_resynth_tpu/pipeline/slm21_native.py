"""Native sLM21 pair scoring (sWUGGY / sBLIMP).

The reference shells out to the ``zrc`` CLI (zerospeech-benchmarks) to turn
pseudo-log-prob score files into sWUGGY/sBLIMP accuracies
(/root/reference/src/speechlm/eval.py:38-51).  This module computes the same
metric natively when the dataset's gold CSVs are available:

* each gold row names an audio file, its pair ``id``, whether it is the
  ``correct`` member (real word / grammatical sentence), and its category
  (``frequency`` bucket for lexical, ``type`` for syntactic);
* a pair is scored correct when the mean model score of its correct members
  exceeds that of its incorrect members (the zerospeech 2021 criterion);
* outputs the ``score_lexical_*_by_frequency.csv`` /
  ``score_syntactic_*_by_type.csv`` tables the aggregation step
  (pipeline/speechlm.py:aggregate_slm21_scores) consumes — drop-in for zrc.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import pandas as pd


def read_score_file(path: str | Path) -> Dict[str, float]:
    """'name score' lines (eval.py:92-93 format) -> dict."""
    scores: Dict[str, float] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                scores[parts[0]] = float(parts[1])
    return scores


def score_pairs(gold: pd.DataFrame, scores: Dict[str, float], by: str) -> pd.DataFrame:
    """Pairwise accuracy grouped by ``by`` (frequency/type).

    ``gold`` columns required: ``filename`` (stem matches score-file names),
    ``id`` (pair grouping), ``correct`` (1/0 or True/False), and ``by``.
    """
    df = gold.copy()
    df["stem"] = df["filename"].astype(str).map(lambda s: Path(s).stem)
    df["score"] = df["stem"].map(scores)
    missing = df["score"].isna().sum()
    if missing:
        df = df.dropna(subset=["score"])

    def pair_correct(g: pd.DataFrame) -> Optional[bool]:
        corr = g[g["correct"].astype(bool)]["score"]
        incorr = g[~g["correct"].astype(bool)]["score"]
        if len(corr) == 0 or len(incorr) == 0:
            return None
        return corr.mean() > incorr.mean()

    rows = []
    for (pid), g in df.groupby("id"):
        res = pair_correct(g)
        if res is None:
            continue
        rows.append({"id": pid, by: g[by].iloc[0], "correct": bool(res)})
    pairs = pd.DataFrame(rows)
    if pairs.empty:
        return pd.DataFrame(columns=["n", "score"]).rename_axis(by)

    out = pairs.groupby(by)["correct"].agg(n="count", score="mean")
    return out


def run_native_slm21(
    result_dir: str | Path,
    dataset_dir_lexical: Optional[str | Path] = None,
    dataset_dir_syntactic: Optional[str | Path] = None,
    split: str = "test",
) -> bool:
    """Produce zrc-format score CSVs from gold files; returns False if the
    gold CSVs are absent (caller can fall back to the external zrc)."""
    result_dir = Path(result_dir)

    jobs = []
    if dataset_dir_lexical is not None:
        gold = Path(dataset_dir_lexical) / "gold.csv"
        jobs.append(("lexical", gold, "frequency", f"score_lexical_{split}_by_frequency.csv"))
    if dataset_dir_syntactic is not None:
        gold = Path(dataset_dir_syntactic) / "gold.csv"
        jobs.append(("syntactic", gold, "type", f"score_syntactic_{split}_by_type.csv"))

    wrote = False
    for task, gold_path, by, out_name in jobs:
        score_path = result_dir / task / f"{split}.txt"
        if not gold_path.is_file() or not score_path.is_file():
            continue
        gold = pd.read_csv(gold_path)
        # tolerate schema variants: keep rows for this split when marked
        if "subset" in gold.columns:
            gold = gold[gold["subset"] == split]
        scores = read_score_file(score_path)
        table = score_pairs(gold, scores, by)
        out_dir = result_dir / "scores"
        out_dir.mkdir(parents=True, exist_ok=True)
        table.to_csv(out_dir / out_name)
        wrote = True
    return wrote
