"""Text normalization, unit mapping, WER/CER, and config system tests."""

import numpy as np
import pytest

from speech_resynth_tpu.core.config import config_from_dict, load_config
from speech_resynth_tpu.text.normalize import (
    cer,
    edit_distance,
    number_to_words,
    wer,
    wer_normalize,
    year_to_words,
)
from speech_resynth_tpu.text.units import shift_unit, unicode_to_units, units_to_unicode, unshift_unit


# -- units ------------------------------------------------------------------


def test_shift_unit_avoids_control_chars():
    for u in range(2000):
        cp = shift_unit(u)
        assert cp >= 33
        assert not (127 <= cp <= 160)
        assert cp != 32


def test_shift_unit_reference_values():
    assert shift_unit(0) == 33
    assert shift_unit(93) == 126
    assert shift_unit(94) == 161


def test_unit_unicode_roundtrip():
    units = list(range(0, 2000, 7))
    assert unicode_to_units(units_to_unicode(units)) == units
    for u in (0, 93, 94, 1999):
        assert unshift_unit(shift_unit(u)) == u


# -- numbers -----------------------------------------------------------------


@pytest.mark.parametrize(
    "n,expected",
    [
        (0, "zero"),
        (7, "seven"),
        (15, "fifteen"),
        (42, "forty-two"),
        (100, "one hundred"),
        (345, "three hundred forty-five"),
        (1000, "one thousand"),
        (1000000, "one million"),
    ],
)
def test_number_to_words(n, expected):
    assert number_to_words(n) == expected


def test_year_reading():
    assert year_to_words(1984) == "nineteen eighty-four"
    assert year_to_words(1905) == "nineteen oh five"


def test_reference_number_special_cases():
    # utils/text.py:33-45 semantics via the full pipeline
    assert wer_normalize("in 2000") == ["in", "two", "thousand"]
    assert wer_normalize("in 2005") == ["in", "two", "thousand", "five"]
    assert wer_normalize("in 1900") == ["in", "nineteen", "hundred"]
    assert wer_normalize("in 1984") == ["in", "nineteen", "eightyfour"]  # punct strips hyphen
    assert wer_normalize("I have 42 cats") == ["i", "have", "fortytwo", "cats"]


def test_abbreviations_and_contractions():
    # jiwer effective order (reference misc.py:42-49): RemovePunctuation strips
    # apostrophes BEFORE ExpandCommonEnglishContractions, so contractions are
    # never expanded — "won't" -> "wont", "don't" -> "dont".
    assert wer_normalize("Dr. Smith won't go") == ["doctor", "smith", "wont", "go"]
    assert wer_normalize("I don't know, it's fine") == ["i", "dont", "know", "its", "fine"]
    assert wer_normalize("Mr. Jones") == ["mister", "jones"]


def test_unicode_punctuation_and_symbols():
    # Unicode category-P chars are removed (incl. curly apostrophe U+2019);
    # category-S symbols like < > $ survive RemovePunctuation.
    assert wer_normalize("don’t “stop”") == ["dont", "stop"]
    # <...> is removed by RemoveKaldiNonWords (angle brackets are category S),
    # but [...] already lost its brackets to RemovePunctuation and survives.
    assert wer_normalize("a <noise> b [laughter] c") == ["a", "b", "laughter", "c"]
    from speech_resynth_tpu.text.normalize import cer_normalize

    # CER pipeline: no whitespace collapsing (misc.py:50-58 has no
    # RemoveWhiteSpace/RemoveMultipleSpaces), strip only at the ends.
    assert cer_normalize(" a  b ") == list("a  b")
    assert cer_normalize("don't") == list("dont")


# -- wer/cer -----------------------------------------------------------------


def test_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance([], ["a"]) == 1
    assert edit_distance(["a", "b"], ["a", "b"]) == 0


def test_wer_cer_basics():
    refs = ["the cat sat", "hello world"]
    hyps = ["the cat sat", "hello word"]
    assert wer(refs, hyps) == pytest.approx(1 / 5)
    assert cer(["abc"], ["abd"]) == pytest.approx(1 / 3)
    assert wer(refs, refs) == 0.0


# -- config ------------------------------------------------------------------


def test_config_interpolation(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        """
dataset:
  wav_dir: "data/wavs"
synthesis:
  src_dir: ${dataset.wav_dir}
  tgt_dir: ${dataset.wav_dir}_resynth
flow_matching:
  batch_size: 44
  frames_per_seg: null
"""
    )
    cfg = load_config(p)
    assert cfg.synthesis.src_dir == "data/wavs"
    assert cfg.synthesis.tgt_dir == "data/wavs_resynth"
    assert cfg.flow_matching.batch_size == 44
    assert cfg.flow_matching.frames_per_seg is None
    assert cfg.get("missing", 7) == 7
    d = cfg.to_dict()
    assert d["synthesis"]["tgt_dir"] == "data/wavs_resynth"


def test_config_mutation():
    cfg = config_from_dict({"hifigan": {"num_gpus": 1, "batch_size": 64}})
    cfg.hifigan.num_gpus = 4
    assert cfg.hifigan.num_gpus == 4
