#!/usr/bin/env bash
# Fetch Hi-Fi-Captain en-US (NICT AST-ASTREC), both speakers — C24 parity
# with the reference's scripts/download_hi-fi-captain.sh.  Run from an
# egress-capable host; the training pipeline consumes the unzipped wav tree
# via configs/resynth YAML dataset.wav_dir.
set -euo pipefail

DATA_DIR="${1:-data}"
mkdir -p "${DATA_DIR}"

for spk in F M; do
  wget -t 0 -c -P "${DATA_DIR}" "https://ast-astrec.nict.go.jp/release/hi-fi-captain/hfc_en-US_${spk}.zip"
  unzip -o "${DATA_DIR}/hfc_en-US_${spk}.zip" -d "${DATA_DIR}"
done
