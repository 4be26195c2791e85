"""Accelerator backend reachability probe.

The tunneled TPU backend ('axon') blocks forever inside jax.devices() when
the tunnel is down (observed 2026-08-17: a multi-hour outage mid-round) — a
hung benchmark or job is strictly worse than a failed one.  ``require_backend``
probes device init on a daemon thread with a bound and hard-exits with a
one-line JSON diagnostic on stdout when unreachable, so drivers capturing
output record the outage instead of timing out opaquely.
"""

from __future__ import annotations

import json
import os
import threading

import jax


def require_backend(timeout_s: float = 240.0, metric: str = "benchmark", unit: str = "error") -> None:
    """Exit(1) with a diagnostic JSON line if device init hangs past the bound.

    On success this returns normally (and jax.devices() is warm).  The probe
    thread cannot be joined once init hangs — os._exit is the only way out.
    """
    ok = threading.Event()

    def _probe():
        jax.devices()
        ok.set()

    threading.Thread(target=_probe, daemon=True).start()
    if not ok.wait(timeout=timeout_s):
        print(
            json.dumps(
                {
                    "metric": metric,
                    "value": 0.0,
                    "unit": unit,
                    "vs_baseline": 0.0,
                    "error": f"accelerator backend unreachable (jax.devices() hung >{timeout_s:.0f}s; "
                    "TPU tunnel down?)",
                }
            ),
            flush=True,
        )
        os._exit(1)
