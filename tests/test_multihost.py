"""2-process multi-host smoke test (VERDICT r1 #9).

Spawns two real processes that rendezvous through jax.distributed over a CPU
backend (4 virtual devices each -> 8-device global mesh) and exercise the
process-sharded iterators, global-array assembly, a pjit'ed reduction, and
Orbax multi-process checkpointing.  This is the CPU-backed analog of a 2-host
TPU pod slice (scripts/run_speechlm_pod.sh).
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    # corpus: 40 sentences -> 5 global batches of 8
    with open(tmp_path / "corpus.txt", "w") as f:
        for i in range(40):
            f.write(" ".join(str((i + j) % 9) for j in range(6)) + "\n")

    worker = Path(__file__).parent / "multihost_worker.py"
    coordinator = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coordinator, str(pid), "2", str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    r0 = json.loads((tmp_path / "ok_0.json").read_text())
    r1 = json.loads((tmp_path / "ok_1.json").read_text())
    assert r0["n_batches"] == r1["n_batches"] == 5  # 40 // 8, same on both hosts
    # the global mean over the assembled global array agrees across hosts
    np.testing.assert_allclose(r0["means"], r1["means"], rtol=1e-6)
    assert (tmp_path / "ckpt").is_dir()
    # host_local_copy reconstructed the full cross-host-sharded array on BOTH
    # hosts (sum of arange(16) = 120)
    assert r0["shard_sum"] == r1["shard_sum"] == 120.0
