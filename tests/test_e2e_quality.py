"""End-to-end trained quality (VERDICT r1 #2): the three pipeline loops must
produce measurable quality on a controlled synthetic corpus, not just
decreasing losses.  Runs the CI-scale configuration of
pipeline/e2e_quality.py; the fuller on-chip numbers live in E2E_QUALITY.md.
"""

import json

import pytest

from speech_resynth_tpu.pipeline.e2e_quality import run_e2e_quality


@pytest.mark.slow
def test_e2e_quality_ci(tmp_path):
    r = run_e2e_quality(tmp_path, scale="ci")
    print("e2e quality:", json.dumps(r, indent=2))

    # HiFi-GAN: CI runs only ~32 GAN steps on CPU (full-width MPD/MSD are
    # ~10 s/step there) — require clear learning, not convergence; the chip
    # run (E2E_QUALITY.md) demonstrates the converged numbers.
    assert r["gan_mel_l1_trained"] < 0.85 * r["gan_mel_l1_untrained"], r
    # CFM: sampled mels for held-out unit sequences approach ground truth
    assert r["cfm_mel_l1_trained"] < 0.5 * r["cfm_mel_l1_untrained"], r
    # full resynthesis chain produces audio whose mel tracks the source
    assert r["resynth_mel_l1"] < r["gan_mel_l1_untrained"], r
    # speech LM: native minimal-pair accuracy (sWUGGY analog) > 90%
    assert r["lm_pair_accuracy"] > 0.9, r
