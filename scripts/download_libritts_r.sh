#!/usr/bin/env bash
# Fetch LibriTTS-R (OpenSLR 141) into data/LibriTTS_R.
# Capability parity with the reference's dataset downloaders (C24); run on a
# host with egress, then point configs/resynth/*.yaml dataset.wav_dir_orig here.
set -euo pipefail

DATA_DIR="${1:-data}"
BASE_URL="https://us.openslr.org/resources/141"
SUBSETS=(train_clean_100 train_clean_360 train_other_500 dev_clean dev_other test_clean test_other)

mkdir -p "${DATA_DIR}"
for subset in "${SUBSETS[@]}"; do
  archive="${DATA_DIR}/${subset}.tar.gz"
  if [ ! -f "${archive}" ]; then
    wget -c -O "${archive}" "${BASE_URL}/${subset}.tar.gz"
  fi
  tar -xzf "${archive}" -C "${DATA_DIR}"
done
echo "LibriTTS-R ready under ${DATA_DIR}/LibriTTS_R"
