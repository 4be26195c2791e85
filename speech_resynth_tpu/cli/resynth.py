"""Resynthesis stage runner.

CLI parity with /root/reference/main_resynth.py:11-49 (fire-based stage
dispatch): stages resample / tokenize / extract_features / train_hifigan /
train_flow_matching / evaluate / synthesize, all driven by one YAML config.

Usage:
  python -m speech_resynth_tpu.cli.resynth <stage> [--config configs/resynth/mhubert-expresso-2000.yaml]
  python -m speech_resynth_tpu.cli.resynth            # full chain (main_resynth.py:40-45)
"""

from __future__ import annotations

import argparse

from ..core.config import load_config

DEFAULT_CONFIG = "configs/resynth/mhubert-expresso-2000.yaml"
STAGES = (
    "resample",
    "tokenize",
    "extract_features",
    "train_hifigan",
    "train_flow_matching",
    "evaluate",
    "synthesize",
    "all",
)


def run_stage(stage: str, config) -> None:
    if stage == "resample":
        from ..pipeline.preprocess import resample

        resample(config)
    elif stage == "tokenize":
        from ..pipeline.preprocess import tokenize

        tokenize(config)
    elif stage == "extract_features":
        from ..pipeline.preprocess import extract_features

        extract_features(config)
    elif stage == "train_hifigan":
        from ..pipeline.train_loops import train_hifigan

        train_hifigan(config)
    elif stage == "train_flow_matching":
        from ..pipeline.train_loops import train_flow_matching

        train_flow_matching(config)
    elif stage == "evaluate":
        from ..pipeline.evaluate import evaluate

        evaluate(config)
    elif stage == "synthesize":
        from ..pipeline.synthesize import synthesize

        synthesize(config)
    elif stage == "all":
        from ..pipeline.evaluate import evaluate
        from ..pipeline.preprocess import preprocess
        from ..pipeline.train_loops import train_flow_matching, train_hifigan

        preprocess(config)
        train_hifigan(config)
        train_flow_matching(config)
        evaluate(config)
    else:
        raise SystemExit(f"unknown stage {stage!r}; choose from {STAGES}")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("stage", nargs="?", default="all", choices=STAGES)
    parser.add_argument("--config", default=DEFAULT_CONFIG)
    args = parser.parse_args(argv)
    config = load_config(args.config)
    run_stage(args.stage, config)


if __name__ == "__main__":
    main()
