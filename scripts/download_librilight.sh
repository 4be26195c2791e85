#!/usr/bin/env bash
# Fetch Libri-Light (small/medium/large) and segment long recordings into
# <=25 s voice-activity chunks (C24 parity with the reference's
# download_librilight.sh --target_len_sec 25 step; the segmentation here uses
# our own VAD, speech_resynth_tpu.dsp.vad, instead of the libri-light repo).
set -euo pipefail

DATA_DIR="${1:-data}"
SUBSET="${2:-small}"  # small | medium | large
BASE_URL="https://dl.fbaipublicfiles.com/librilight/data"

mkdir -p "${DATA_DIR}/librilight_raw"
archive="${DATA_DIR}/${SUBSET}.tar"
if [ ! -f "${archive}" ]; then
  wget -c -O "${archive}" "${BASE_URL}/${SUBSET}.tar"
fi
tar -xf "${archive}" -C "${DATA_DIR}/librilight_raw"

python - "$DATA_DIR" <<'EOF'
import sys
from pathlib import Path

import numpy as np

from speech_resynth_tpu.dsp import audio_io
from speech_resynth_tpu.dsp.vad import trim

data_dir = Path(sys.argv[1])
src = data_dir / "librilight_raw"
dst = data_dir / "librilight"
TARGET_SEC, SR = 25, 16000

for wav_path in sorted(src.glob("**/*.wav")):
    wav, sr = audio_io.read(wav_path)
    if wav.ndim > 1:
        wav = wav[:, 0]
    wav, _ = trim(wav, top_db=20)
    chunk = TARGET_SEC * sr
    rel = wav_path.relative_to(src)
    for i in range(0, len(wav), chunk):
        seg = wav[i : i + chunk]
        if len(seg) < sr:  # drop sub-second tails
            continue
        out = dst / rel.parent / f"{rel.stem}_{i // chunk:04d}.wav"
        audio_io.write(out, seg, sr)
print("segmented Libri-Light under", dst)
EOF
