#!/usr/bin/env bash
# Fetch LibriSpeech (OpenSLR 12) into data/LibriSpeech (C24 parity).
set -euo pipefail

DATA_DIR="${1:-data}"
BASE_URL="https://us.openslr.org/resources/12"
SUBSETS=(train-clean-100 train-clean-360 train-other-500 dev-clean dev-other test-clean test-other)

mkdir -p "${DATA_DIR}"
for subset in "${SUBSETS[@]}"; do
  archive="${DATA_DIR}/${subset}.tar.gz"
  if [ ! -f "${archive}" ]; then
    wget -c -O "${archive}" "${BASE_URL}/${subset}.tar.gz"
  fi
  tar -xzf "${archive}" -C "${DATA_DIR}"
done
echo "LibriSpeech ready under ${DATA_DIR}/LibriSpeech"
