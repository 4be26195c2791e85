"""Keep the measurement harnesses runnable: CPU --tiny smoke of the roofline
benches.  These scripts produce the evidence PARITY.md's perf claims rest on;
a bench that stops importing/running is a silent hole in the methodology.
Timings on CPU are meaningless — only exit status and JSON shape are checked.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _run_bench(rel: str, *extra: str, env_extra: dict | None = None) -> list:
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    env.update(env_extra or {})
    out = subprocess.run(
        [sys.executable, str(REPO / rel), "--cpu", "--tiny", "--batch", "2", "--units", "8",
         "--iters", "1", "--trials", "1", *extra],
        capture_output=True,
        text=True,
        timeout=540,
        env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(line) for line in out.stdout.splitlines() if line.startswith("{")]
    assert rows, out.stdout[-2000:]
    return rows


@pytest.mark.slow
def test_bench_roofline_smoke():
    rows = _run_bench("benchmarks/bench_roofline.py")
    programs = {r["program"] for r in rows if "program" in r}
    assert programs == {"synthesize", "ode", "vocoder"}
    for r in rows:
        if "program" in r:
            assert r["ms"] > 0 and r["gbytes"] >= 0


@pytest.mark.slow
def test_bench_vocoder_stages_smoke():
    rows = _run_bench("benchmarks/bench_vocoder_stages.py")
    stages = [r["stage"] for r in rows if "stage" in r]
    # tiny config has 2 upsample stages: measured dispatch/sync floor, pre,
    # (up, mrf) x 2, post tail, full
    assert stages == ["null_floor", "pre0", "up0", "mrf0", "up1", "mrf1", "post", "full"]


@pytest.mark.slow
def test_bench_streaming_smoke():
    # --frames 40 > window so the real windowed path runs, not just the
    # short-stream fallback
    rows = _run_bench("benchmarks/bench_streaming.py", "--frames", "40", "--chunk", "8")
    (meta,) = [r for r in rows if "window" in r]
    (res,) = [r for r in rows if r.get("metric") == "streaming_ttfa"]
    assert meta["frames"] == 40 and meta["chunk"] == 8
    assert res["value"] > 0 and res["total_stream_ms"] > 0 and res["ttfa_batch_ms"] > 0


@pytest.mark.slow
def test_headline_bench_smoke():
    """bench.py (the driver-run headline) must emit a provisional JSON line
    after EVERY completed phase and a final non-provisional line — the r03
    driver run timed out with parsed=null because nothing was printed until
    the very end (BENCH_r03.json: rc=124)."""
    # internal budget UNDER the 540 s subprocess timeout: on a contended host
    # the watchdog (not TimeoutExpired) must be what ends a slow run — the
    # exact rc=124/no-output mode this test exists to prevent
    rows = _run_bench("bench.py", env_extra={"BENCH_BUDGET_S": "450"})
    final = rows[-1]
    if final.get("budget_exceeded"):
        # degraded-but-recorded path: the watchdog fired with a best snapshot
        assert final["provisional"] is True and "phase" in final, final
    else:
        assert len(rows) >= 3, rows  # after_trial_0, after_compute/d2h, final
        assert "provisional" not in final and final["value"] > 0
        assert final["bench_wall_s"] > 0 and final["trials"] >= 1
    for row in rows[:-1]:
        assert row["provisional"] is True and row["value"] > 0
        assert row["metric"] == final["metric"]


@pytest.mark.slow
def test_headline_bench_budget_watchdog():
    """With an impossibly small budget, the watchdog must still exit 0 with a
    parseable JSON line naming the in-flight phase (never rc=124/no output)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    env["BENCH_BUDGET_S"] = "6"
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--cpu", "--tiny", "--batch", "2", "--units", "8",
         "--iters", "1", "--trials", "1"],
        capture_output=True,
        text=True,
        timeout=540,
        env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(line) for line in out.stdout.splitlines() if line.startswith("{")]
    assert rows, out.stdout[-2000:]
    last = rows[-1]
    # either the watchdog fired (budget_exceeded + phase) or the run was so
    # fast it legitimately finished under budget — both leave a JSON record
    assert last.get("budget_exceeded") or "bench_wall_s" in last, last
    assert "[bench] t=+" in out.stderr  # heartbeats present for diagnosis


@pytest.mark.slow
def test_bench_demo_path_smoke():
    # the composed wav->units->wav flagship flow (reference README.md:26-55)
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    out = subprocess.run(
        [sys.executable, str(REPO / "benchmarks/bench_demo_path.py"), "--cpu", "--tiny",
         "--batch", "2", "--seconds", "1", "--iters", "1", "--trials", "1"],
        capture_output=True,
        text=True,
        timeout=540,
        env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(line) for line in out.stdout.splitlines() if line.startswith("{")]
    (res,) = [r for r in rows if r.get("metric", "").startswith("demo_path")]
    assert res["value"] > 0 and res["trials"] == 1


@pytest.mark.slow
def test_bench_lm_smoke():
    """bench_lm --tiny exercises scoring, all six decode variants across the
    three prompt regimes, AND the trained-grammar acceptance section."""
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    out = subprocess.run(
        [sys.executable, str(REPO / "benchmarks/bench_lm.py"), "--cpu", "--tiny"],
        capture_output=True,
        text=True,
        timeout=540,
        env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(line) for line in out.stdout.splitlines() if line.startswith("{")]
    (res,) = rows
    for tag in ("random", "cyclic", "grammar"):
        assert res[f"lookup_decode_{tag}_tok_per_iter"] >= 1.0, res
        assert res[f"lookup_sample_{tag}_tokens_per_sec"] > 0, res
    # a trained LM on the repeating unit grammar must beat the acceptance
    # floor that untrained/random weights show on random prompts
    assert res["lookup_decode_grammar_tok_per_iter"] > res["lookup_decode_random_tok_per_iter"], res
    assert res["grammar_final_loss"] < 10.0, res


@pytest.mark.slow
def test_bench_fold_ab_smoke():
    # fold_ab takes --frames (not --units) and prints a text table + "best:"
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    out = subprocess.run(
        [sys.executable, str(REPO / "benchmarks/bench_fold_ab.py"), "--cpu", "--tiny",
         "--batch", "1", "--frames", "16", "--iters", "1", "--trials", "1"],
        capture_output=True,
        text=True,
        timeout=540,
        env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "best:" in out.stdout, out.stdout[-2000:]


@pytest.mark.slow
def test_bench_fold_ab_serving_smoke():
    # --serving A/Bs im2col vs grouped inside the full synthesize program
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    out = subprocess.run(
        [sys.executable, str(REPO / "benchmarks/bench_fold_ab.py"), "--cpu", "--tiny", "--serving",
         "--batch", "1", "--frames", "8", "--iters", "1", "--trials", "1"],
        capture_output=True,
        text=True,
        timeout=540,
        env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "best:" in out.stdout, out.stdout[-2000:]
