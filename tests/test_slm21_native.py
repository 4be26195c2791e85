"""Native sLM21 pair scorer tests (synthetic gold + score files)."""

import pandas as pd
import pytest

from speech_resynth_tpu.pipeline.slm21_native import read_score_file, run_native_slm21, score_pairs
from speech_resynth_tpu.pipeline.speechlm import aggregate_slm21_scores


def test_score_pairs_accuracy():
    gold = pd.DataFrame(
        {
            "id": [1, 1, 2, 2, 3, 3, 4, 4],
            "filename": [f"f{i}.wav" for i in range(8)],
            "correct": [1, 0, 1, 0, 1, 0, 1, 0],
            "frequency": ["high", "high", "high", "high", "oov", "oov", "oov", "oov"],
        }
    )
    # pairs 1 and 3 scored right, 2 and 4 wrong
    scores = {"f0": -1.0, "f1": -2.0, "f2": -3.0, "f3": -1.0, "f4": -0.5, "f5": -4.0, "f6": -9.0, "f7": -1.0}
    table = score_pairs(gold, scores, "frequency")
    assert table.loc["high", "n"] == 2
    assert table.loc["high", "score"] == pytest.approx(0.5)
    assert table.loc["oov", "score"] == pytest.approx(0.5)


def test_end_to_end_native_scoring(tmp_path):
    # dataset gold files
    lex_dir = tmp_path / "lexical"
    syn_dir = tmp_path / "syntactic"
    lex_dir.mkdir()
    syn_dir.mkdir()
    pd.DataFrame(
        {
            "id": [1, 1, 2, 2],
            "filename": ["a.wav", "b.wav", "c.wav", "d.wav"],
            "correct": [1, 0, 1, 0],
            "frequency": ["high", "high", "oov", "oov"],
        }
    ).to_csv(lex_dir / "gold.csv", index=False)
    pd.DataFrame(
        {
            "id": [1, 1],
            "filename": ["s1.wav", "s2.wav"],
            "correct": [1, 0],
            "type": ["anaphor"] * 2,
        }
    ).to_csv(syn_dir / "gold.csv", index=False)

    # model score files (eval.py format)
    result_dir = tmp_path / "results"
    (result_dir / "lexical").mkdir(parents=True)
    (result_dir / "syntactic").mkdir(parents=True)
    (result_dir / "lexical/test.txt").write_text("a -1.0\nb -2.0\nc -5.0\nd -1.0\n")
    (result_dir / "syntactic/test.txt").write_text("s1 -0.2\ns2 -0.9\n")

    assert run_native_slm21(result_dir, lex_dir, syn_dir, "test")
    df = aggregate_slm21_scores(result_dir, "test")
    # lexical: pair1 right, pair2 wrong -> all 0.5, iv (high) 1.0, oov 0.0
    assert df.loc["sWUGGY all"].iloc[0] == pytest.approx(0.5)
    assert df.loc["sWUGGY in-vocab"].iloc[0] == pytest.approx(1.0)
    assert df.loc["sWUGGY out-of-vocab"].iloc[0] == pytest.approx(0.0)
    assert df.loc["sBLIMP"].iloc[0] == pytest.approx(1.0)


def test_missing_gold_returns_false(tmp_path):
    assert not run_native_slm21(tmp_path, tmp_path / "nope", None, "test")


def test_read_score_file(tmp_path):
    p = tmp_path / "s.txt"
    p.write_text("a -1.5\nb 0.25\n\n")
    assert read_score_file(p) == {"a": -1.5, "b": 0.25}
