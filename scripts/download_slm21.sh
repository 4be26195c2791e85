#!/usr/bin/env bash
# Fetch the ZeroSpeech sLM21 dataset via the zerospeech-benchmarks CLI when
# installed, else the public zip (C24 parity).
set -euo pipefail

if command -v zrc >/dev/null 2>&1; then
  zrc datasets:pull sLM21-dataset
else
  DATA_DIR="${1:-data}"
  mkdir -p "${DATA_DIR}"
  wget -c -O "${DATA_DIR}/sLM21-dataset.zip" "https://download.zerospeech.com/sLM21-dataset.zip"
  unzip -o "${DATA_DIR}/sLM21-dataset.zip" -d "${DATA_DIR}"
fi
