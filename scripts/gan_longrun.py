#!/usr/bin/env python
"""Long-horizon HiFi-GAN stability run (VERDICT r2 next-round #4).

The reference's production schedule is ~1M steps / 181 epochs
(/root/reference/src/hifigan/train.py:264-281, yaml:68-73); the longest run
demonstrated on-chip before round 3 was 1,800 steps.  This harness drives
the REAL training loop (pipeline.train_loops.train_hifigan — bf16 LSGAN,
in-step spectral-norm power iteration, per-epoch LR decay, Orbax
checkpoints) for tens of thousands of steps at FULL-width discriminators
(MPD {2,3,5,7,11} + MSD) on the synthetic formant corpus, then extracts the
committed evidence:

  run          50k-step (default) training run; re-running the same command
               resumes from the last checkpoint, so driver restarts are free
  report       parse the TensorBoard event files -> GAN_LONGRUN.md curve
               table (loss_gen/loss_disc/mel L1/LR/steps-sec + drift notes)
  resume-check kill -9 the trainer mid-epoch at a checkpoint boundary, then
               resume and verify the final generator/discriminator params
               are BYTE-IDENTICAL to an uninterrupted control run (the
               loop's deterministic (seed, epoch) batch order + mid-epoch
               resume_skip make this exact; train_loops.py:296-318)

Usage: python scripts/gan_longrun.py run /tmp/gan50k --steps 50000
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _build_corpus(workdir: Path, n_utts: int):
    """Formant corpus with utterances long enough for production crops
    (segment_size 16080 = 50 frames at hop 320): 40-80 units x 4 frames
    -> 160-320 mel frames (3.2-6.4 s) per utterance.

    Built in a CPU-platform subprocess: the mel cache computes one jitted
    program per distinct utterance length, and on the tunneled axon backend
    each of those ~160 shapes is a multi-second REMOTE compile (measured:
    ~7 utts/min) — on host CPU the whole corpus takes under two minutes."""
    corpus_dir = workdir / "corpus"
    if not (corpus_dir / "train.json").is_file():
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "import sys; sys.path.insert(0, %r)\n"
            "from speech_resynth_tpu.pipeline.synthetic import make_formant_corpus\n"
            "make_formant_corpus(%r, n_utts=%d, units_per_utt=(40, 80), frames_per_unit=4, seed=0)\n"
        ) % (str(Path(__file__).resolve().parent.parent), str(corpus_dir), n_utts)
        subprocess.run([sys.executable, "-c", code], check=True)
    return {
        "wav_dir": corpus_dir / "wavs",
        "spec_dir": corpus_dir / "spec",
        "train_file": corpus_dir / "train.json",
    }


def _gan_config(run_dir: Path, corpus, args):
    """Production-shape config: full-width G (512 initial channels, kernels
    {3,7,11}, dilations {1,3,5}) + full MPD/MSD, reference hyperparameters
    (configs/resynth/mhubert-expresso-2000.yaml:69-79)."""
    from speech_resynth_tpu.core.config import config_from_dict

    return config_from_dict(
        {
            "dataset": {
                "wav_dir": str(corpus["wav_dir"]),
                "spectrogram_dir": str(corpus["spec_dir"]),
                "train_file": str(corpus["train_file"]),
                "dev_file": str(corpus["train_file"]),
                "ext_audio": ".wav",
            },
            "hifigan": {
                "path": str(run_dir),
                "batch_size": args.batch,
                "segment_size": 16080,
                "training_epochs": args.epochs,
                "learning_rate": 2e-4,
                "adam_b1": 0.8,
                "adam_b2": 0.99,
                "lr_decay": 0.999,
                "seed": 1234,
                "n_fft": 400,
                "hop_size": 320,
                "upsample_rates": [5, 4, 4, 2, 2],
                "upsample_kernel_sizes": [10, 9, 8, 4, 4],
                "stdout_interval": 500,
                "summary_interval": args.summary_interval,
                "checkpoint_interval": args.ckpt_interval,
                "validation_interval": args.val_interval,
            },
        }
    )


def _steps_per_epoch(n_utts: int, batch: int) -> int:
    return max(n_utts // batch, 1)


def cmd_run(args):
    from speech_resynth_tpu.pipeline.train_loops import train_hifigan

    workdir = Path(args.workdir)
    corpus = _build_corpus(workdir, args.n_utts)
    spe = _steps_per_epoch(args.n_utts, args.batch)
    if args.epochs is None:
        args.epochs = -(-args.steps // spe)
    print(f"[gan_longrun] {args.epochs} epochs x {spe} steps/epoch -> {args.epochs * spe} steps", flush=True)
    t0 = time.time()
    train_hifigan(_gan_config(workdir / args.run_name, corpus, args))
    print(f"[gan_longrun] done in {time.time() - t0:.0f}s", flush=True)


def _scalars(log_dir: Path):
    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator

    acc = EventAccumulator(str(log_dir), size_guidance={"scalars": 0})
    acc.Reload()
    return {tag: [(e.step, e.value, e.wall_time) for e in acc.Scalars(tag)] for tag in acc.Tags()["scalars"]}


def cmd_report(args):
    import math

    workdir = Path(args.workdir)
    log_dir = workdir / args.run_name / "logs"
    if not log_dir.is_dir():
        raise SystemExit(f"no event logs at {log_dir} (wrong --run-name?)")
    scal = _scalars(log_dir)
    keys = [k for k in ("training/loss_gen", "training/loss_disc", "training/mel_error", "training/lr", "validation/mel_spec_error") if k in scal]
    # Honest steps/s: wall-clock time between summary events (each summary
    # materializes metrics = a true device sync; the LOGGED steps_per_sec /
    # MFU of runs started before the synced_step_time fix measure dispatch
    # rate, ~5x the device's real throughput on the tunneled backend).
    anchor = scal.get("training/loss_gen", [])
    rate_at = {}
    for (s0, _, t0), (s1, _, t1) in zip(anchor, anchor[1:]):
        if t1 > t0 and s1 > s0:
            rate_at[s1] = (s1 - s0) / (t1 - t0)

    # downsample each curve to ~20 evenly spaced rows keyed by step
    steps = sorted({s for k in keys for s, _, _ in scal[k]})
    picks = steps[:: max(1, len(steps) // 20)]
    by_step = {k: {s: v for s, v, _ in scal[k]} for k in keys}

    lines = ["| step | " + " | ".join(k.split("/")[-1] for k in keys) + " | wall steps/s |",
             "|---" * (len(keys) + 2) + "|"]
    for s in picks:
        row = [f"{by_step[k].get(s, float('nan')):.4g}" if isinstance(by_step[k].get(s), float) else "" for k in keys]
        rate = rate_at.get(s)
        lines.append(f"| {s} | " + " | ".join(row) + f" | {rate:.2f} |" if rate else f"| {s} | " + " | ".join(row) + " |  |")

    # drift / stability summary
    bad = {k: sum(1 for _, v, _ in scal[k] if not math.isfinite(v)) for k in scal}
    nonfinite = {k: n for k, n in bad.items() if n}
    if anchor:
        total_steps = anchor[-1][0] - anchor[0][0]
        total_wall = anchor[-1][2] - anchor[0][2]
        lines.append("")
        lines.append(f"- steps {anchor[0][0]}..{anchor[-1][0]}; mean wall rate "
                     f"{total_steps / total_wall:.2f} steps/s ({total_wall / 3600:.2f} h)")
    lines.append(f"- non-finite scalar events: {nonfinite if nonfinite else 'none (no bf16/spectral-norm divergence)'}")
    print("\n".join(lines))
    out = workdir / "report.md"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")


def _hash_tree(path: Path) -> str:
    """Order-stable hash of every array in an Orbax checkpoint dir's final
    exported safetensors (model.safetensors under the run dir)."""
    import hashlib

    from safetensors.numpy import load_file

    sd = load_file(str(path))
    h = hashlib.sha256()
    for k in sorted(sd):
        h.update(k.encode())
        h.update(sd[k].tobytes())
    return h.hexdigest()


def cmd_resume_check(args):
    """Control run (2 epochs uninterrupted) vs kill-at-mid-epoch + resume;
    final exported generator params must hash identically."""
    workdir = Path(args.workdir)
    corpus = _build_corpus(workdir, args.n_utts)
    spe = _steps_per_epoch(args.n_utts, args.batch)
    # 4 epochs with the kill mid-epoch-2: the ~(2.5 epochs x step-time)
    # remaining after the checkpoint lands gives the poll-and-SIGKILL window
    # room (steps are ~0.3 s at full width)
    total_epochs = 4
    kill_step = spe + spe // 2  # mid-epoch of epoch 2 -> exercises resume_skip
    base = [sys.executable, __file__, "run", str(workdir), "--batch", str(args.batch),
            "--n-utts", str(args.n_utts), "--epochs", str(total_epochs),
            "--summary-interval", "1000000", "--val-interval", "1000000"]

    def child(run_name, ckpt_interval, env=None):
        cmd = base + ["--ckpt-interval", str(ckpt_interval), "--run-name", run_name]
        return subprocess.Popen(cmd, env={**os.environ, **(env or {})})

    # control: uninterrupted, same mid-run checkpoint cadence so any
    # checkpoint-save side effect is identical in both runs
    print(f"[resume-check] control: {total_epochs} epochs = {total_epochs * spe} steps", flush=True)
    p = child("control", kill_step)
    assert p.wait() == 0

    # interrupted: kill -9 as soon as the mid-epoch checkpoint lands
    p = child("interrupted", kill_step)
    ckpt_marker = workdir / "interrupted" / "ckpt" / str(kill_step)
    while p.poll() is None and not ckpt_marker.is_dir():
        time.sleep(0.5)
    if p.poll() is None:
        time.sleep(1.5)  # let the checkpoint finish committing
        os.kill(p.pid, signal.SIGKILL)
        p.wait()
        print(f"[resume-check] killed trainer at step {kill_step}", flush=True)
    else:
        raise SystemExit("trainer finished before the kill checkpoint appeared")
    p = child("interrupted", kill_step)
    assert p.wait() == 0

    h_control = _hash_tree(workdir / "control" / "model.safetensors")
    h_resumed = _hash_tree(workdir / "interrupted" / "model.safetensors")
    verdict = {"kill_step": kill_step, "total_steps": total_epochs * spe,
               "control_sha256": h_control[:16], "resumed_sha256": h_resumed[:16],
               "step_exact": h_control == h_resumed}
    print(json.dumps(verdict))
    (workdir / "resume_check.json").write_text(json.dumps(verdict))
    assert h_control == h_resumed, "resumed run diverged from uninterrupted control"


def cmd_supervise(args):
    """Auto-restarting driver for multi-hour runs on the tunneled backend.

    The axon tunnel client leaks ~1 MB of host RSS per ~1 MB device_put
    (probed round 5: 300 x 1 MB transfers -> +300 MB RSS whether or not the
    arrays are deleted; see GAN_LONGRUN.md "host-memory leak"), so a
    batch-16 GAN run leaks ~1.2 MB/step and the kernel OOM-kills the
    trainer around ~60k steps on a 128 GB host.  Until the client is
    fixed, long runs are supervised: re-launch ``run`` (which resumes from
    the last checkpoint) every time the trainer exits — OOM kill, crash,
    or clean finish — until the step target is reached.  Checkpoint
    cadence bounds the lost work per recycle to <= ckpt_interval steps."""
    workdir = Path(args.workdir)
    base = [sys.executable, __file__, "run", str(workdir), "--batch", str(args.batch),
            "--n-utts", str(args.n_utts), "--steps", str(args.steps),
            "--ckpt-interval", str(args.ckpt_interval), "--val-interval", str(args.val_interval),
            "--summary-interval", str(args.summary_interval), "--run-name", args.run_name]

    def last_step() -> int:
        ckpt_dir = workdir / args.run_name / "ckpt"
        if not ckpt_dir.is_dir():
            return 0
        steps = [int(p.name) for p in ckpt_dir.iterdir() if p.name.isdigit()]
        return max(steps, default=0)

    gen = 0
    while last_step() < args.steps:
        gen += 1
        print(f"[supervise] generation {gen}: resuming from step {last_step()}", flush=True)
        rc = subprocess.run(base).returncode
        print(f"[supervise] generation {gen} exited rc={rc} at step {last_step()}", flush=True)
        if rc == 0:
            break
        time.sleep(5.0)
    print(f"[supervise] done at step {last_step()} after {gen} generation(s)", flush=True)


def cmd_resume_check_at(args):
    """The resume-check design transplanted to the LAST checkpoint of an
    existing long run (VERDICT r4 #2's "second kill/resume check at a late
    boundary"): snapshot the run dir, then run two continuations of
    ``--extend-steps`` from that state — control (uninterrupted) and
    interrupted (SIGKILL'd at its first new checkpoint, then resumed) —
    and require byte-identical exported generators.  Run AFTER the long
    run has been stopped (the snapshot copies its checkpoint dir)."""
    import shutil

    workdir = Path(args.workdir)
    src = workdir / args.run_name
    spe = _steps_per_epoch(args.n_utts, args.batch)
    ckpts = sorted(int(p.name) for p in (src / "ckpt").iterdir() if p.name.isdigit())
    if not ckpts:
        raise SystemExit(f"no checkpoints under {src}/ckpt")
    s0 = ckpts[-1]
    target = s0 + args.extend_steps
    epochs = -(-target // spe)
    ckpt_int = 64  # first new save lands mid-continuation -> the kill marker
    for name in ("boundary_control", "boundary_interrupted"):
        dst = workdir / name
        if dst.exists():
            shutil.rmtree(dst)
        shutil.copytree(src, dst)
    base = [sys.executable, __file__, "run", str(workdir), "--batch", str(args.batch),
            "--n-utts", str(args.n_utts), "--epochs", str(epochs),
            "--summary-interval", "1000000", "--val-interval", "1000000",
            "--ckpt-interval", str(ckpt_int)]

    def child(run_name):
        return subprocess.Popen(base + ["--run-name", run_name])

    print(f"[resume-check-at] boundary step {s0}, continuing to {epochs * spe}", flush=True)
    p = child("boundary_control")
    assert p.wait() == 0

    p = child("boundary_interrupted")
    ckpt_dir = workdir / "boundary_interrupted" / "ckpt"
    kill_step = None
    while p.poll() is None and kill_step is None:
        time.sleep(0.5)
        fresh = [int(q.name) for q in ckpt_dir.iterdir() if q.name.isdigit() and int(q.name) > s0]
        if fresh:
            kill_step = min(fresh)
    if p.poll() is None:
        time.sleep(10.0)  # let the ~900 MB async save finish committing
        os.kill(p.pid, signal.SIGKILL)
        p.wait()
        print(f"[resume-check-at] killed continuation at/after step {kill_step}", flush=True)
    else:
        raise SystemExit("continuation finished before any new checkpoint appeared")
    p = child("boundary_interrupted")
    assert p.wait() == 0

    h_control = _hash_tree(workdir / "boundary_control" / "model.safetensors")
    h_resumed = _hash_tree(workdir / "boundary_interrupted" / "model.safetensors")
    verdict = {"boundary_step": s0, "kill_step": kill_step, "total_steps": epochs * spe,
               "control_sha256": h_control[:16], "resumed_sha256": h_resumed[:16],
               "step_exact": h_control == h_resumed}
    print(json.dumps(verdict))
    (workdir / "boundary_resume_check.json").write_text(json.dumps(verdict))
    assert h_control == h_resumed, "resumed continuation diverged from uninterrupted control"


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    for name in ("run", "report", "resume-check", "resume-check-at", "supervise"):
        s = sub.add_parser(name)
        s.add_argument("workdir")
        s.add_argument("--steps", type=int, default=50000)
        s.add_argument("--epochs", type=int, default=None)
        s.add_argument("--batch", type=int, default=16)
        s.add_argument("--n-utts", type=int, default=512)
        s.add_argument("--ckpt-interval", type=int, default=5000)
        s.add_argument("--val-interval", type=int, default=5000)
        s.add_argument("--summary-interval", type=int, default=100)
        s.add_argument("--run-name", default="run")
        s.add_argument("--extend-steps", type=int, default=128,
                       help="resume-check-at: continuation length past the boundary checkpoint")
    args = parser.parse_args()
    if args.cmd == "run":
        cmd_run(args)
    elif args.cmd == "report":
        cmd_report(args)
    elif args.cmd == "resume-check-at":
        cmd_resume_check_at(args)
    elif args.cmd == "supervise":
        cmd_supervise(args)
    else:
        cmd_resume_check(args)


if __name__ == "__main__":
    main()
