"""Load the reference implementation (/root/reference) as a parity oracle.

The published checkpoints are unreachable in this environment (zero egress,
no cached weights anywhere on the host), so golden parity is evidenced the
fallback way prescribed in VERDICT r1 #1: run the reference's own torch code
at FULL published config size with shared-seed random weights and require our
TPU-native implementation to reproduce its outputs (identical converted
weights, identical inputs, identical noise).

The reference modules import a few packages that are not in this image but
are never exercised by the model forward paths; they are stubbed here:
  * torchaudio / librosa — only used by data loaders we don't call
  * einx — used once, for an outer product (fourier_embed.py:38)
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE_ROOT / "src" / "flow_matching" / "models.py").is_file()


def load_reference_flow_matching():
    """Import and return the reference's src.flow_matching.{models,configs}."""
    import transformers  # noqa: F401  (real import before stubbing find_spec probes)

    sys.modules.setdefault("torchaudio", types.ModuleType("torchaudio"))
    if "librosa" not in sys.modules:
        lib = types.ModuleType("librosa")
        lf = types.ModuleType("librosa.filters")
        lf.mel = None
        lib.filters = lf
        sys.modules["librosa"] = lib
        sys.modules["librosa.filters"] = lf
    if "einx" not in sys.modules:
        ex = types.ModuleType("einx")

        def _multiply(pattern, a, b):
            assert pattern == "i, j -> i j", pattern
            return a[:, None] * b[None, :]

        ex.multiply = _multiply
        sys.modules["einx"] = ex

    root = str(REFERENCE_ROOT)
    if root not in sys.path:
        sys.path.insert(0, root)
    from src.flow_matching import configs as ref_configs  # noqa: E402
    from src.flow_matching import models as ref_models  # noqa: E402

    return ref_models, ref_configs
