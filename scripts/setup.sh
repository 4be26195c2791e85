#!/usr/bin/env bash
# One-time environment setup (C24 parity with the reference's scripts/setup.sh,
# which clones libri-light/textlesslib/UTMOS).  This framework owns those
# capabilities natively, so setup reduces to: build the C++ extensions,
# verify the package imports, and create the data layout.
set -euo pipefail

REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
DATA_DIR="${1:-${REPO_ROOT}/data}"

echo "== building C++ extensions (wavio/flac, BPE) =="
python - <<EOF
import sys
sys.path.insert(0, "${REPO_ROOT}")
from speech_resynth_tpu.dsp import audio_io  # compiles libwavio.so on import
from speech_resynth_tpu.tokenizers.bpe import BpeTokenizer  # compiles libbpe.so
print("native extensions OK")
EOF

echo "== verifying JAX backend =="
python - <<EOF
import sys
sys.path.insert(0, "${REPO_ROOT}")
import jax
print("backend:", jax.default_backend(), "devices:", len(jax.devices()))
EOF

mkdir -p "${DATA_DIR}"
echo "== data dir: ${DATA_DIR} =="
echo "Fetch corpora with scripts/download_{libritts_r,librispeech,librilight,slm21,hificaptain}.sh"
echo "Import published checkpoints (egress host) with scripts/convert_checkpoints.py"
