"""Speech-LM stage runner.

CLI parity with /root/reference/main_speechlm.py:9-39: stages encode /
tokenize / tokenize_slm21 / train / eval, one YAML config.

Usage:
  python -m speech_resynth_tpu.cli.speechlm encode --config configs/speechlm/hubert.yaml --spk-ids 1-9
  python -m speech_resynth_tpu.cli.speechlm train
"""

from __future__ import annotations

import argparse

from ..core.config import load_config

DEFAULT_CONFIG = "configs/speechlm/hubert.yaml"
STAGES = ("encode", "tokenize", "tokenize_slm21", "train", "eval")


def run_stage(stage: str, config, spk_ids: str = "1-9") -> None:
    if stage == "encode":
        from ..pipeline.speechlm import encode

        encode(config, spk_ids)
    elif stage == "tokenize":
        from ..pipeline.speechlm import tokenize

        tokenize(config)
    elif stage == "tokenize_slm21":
        from ..pipeline.speechlm import tokenize_slm21

        tokenize_slm21(config)
    elif stage == "train":
        from ..pipeline.train_loops import train_speechlm

        train_speechlm(config)
    elif stage == "eval":
        from ..pipeline.train_loops import eval_speechlm

        eval_speechlm(config)
    else:
        raise SystemExit(f"unknown stage {stage!r}; choose from {STAGES}")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("stage", choices=STAGES)
    parser.add_argument("--config", default=DEFAULT_CONFIG)
    parser.add_argument("--spk-ids", default="1-9", help="speaker-id glob class for encode (tokenize.py:93)")
    args = parser.parse_args(argv)
    config = load_config(args.config)
    run_stage(args.stage, config, args.spk_ids)


if __name__ == "__main__":
    main()
