"""On-chip end-to-end trained-quality run (fuller than the CI test).

Usage: python scripts/e2e_quality_run.py [workdir] [scale]
Writes <workdir>/E2E_QUALITY.json; summarize into E2E_QUALITY.md.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from speech_resynth_tpu.pipeline.e2e_quality import run_e2e_quality  # noqa: E402


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/e2e_quality"
    scale = sys.argv[2] if len(sys.argv) > 2 else "chip"
    results = run_e2e_quality(workdir, scale=scale)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
