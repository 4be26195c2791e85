#!/usr/bin/env python
"""Fit a k-means unit codebook on HuBERT features (device Lloyd's).

Replaces textlesslib's shipped sklearn MiniBatchKMeans artifacts (SURVEY.md
§2.2) with on-TPU training: batched feature extraction through the jitted
encoder tower, then k-means++ + Lloyd iterations as MXU matmuls
(models/kmeans.py).  Output .npz drops into SpeechEncoder.by_name's
checkpoint directory.

Usage:
  python scripts/fit_kmeans.py --wav-dir data/LibriTTS_R_16k --glob 'train-*/**/*.wav' \
      --dense-model mhubert-base-vp_mls_cv_8lang --vocab 2000 --max-utts 2000 \
      --out models/encoders/mhubert-base-vp_mls_cv_8lang-kmeans-expresso-2000.npz
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wav-dir", required=True)
    p.add_argument("--glob", default="**/*.wav")
    p.add_argument("--dense-model", default="mhubert-base-vp_mls_cv_8lang")
    p.add_argument("--vocab", type=int, default=2000)
    p.add_argument("--max-utts", type=int, default=2000)
    p.add_argument("--max-seconds", type=float, default=20.0)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--max-frames", type=int, default=400_000, help="feature subsample cap for the Lloyd step")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    from speech_resynth_tpu.dsp import audio_io
    from speech_resynth_tpu.models.kmeans import KMeansQuantizer, kmeans_fit
    from speech_resynth_tpu.models.speech_encoder import DENSE_MODELS, SpeechEncoder

    enc = SpeechEncoder.by_name(args.dense_model, "kmeans", args.vocab)
    spec = DENSE_MODELS[args.dense_model]
    paths = sorted(Path(args.wav_dir).glob(args.glob))[: args.max_utts]
    if not paths:
        raise SystemExit(f"no wavs under {args.wav_dir}/{args.glob}")

    feat_fn = jax.jit(lambda w: enc.encoder.apply(enc.variables, w, output_layer=spec["output_layer"]))
    feats = []
    total = 0
    max_frames_in = int(args.max_seconds * 16000)
    for i in range(0, len(paths), args.batch_size):
        chunk = paths[i : i + args.batch_size]
        wavs, lengths, _ = audio_io.read_batch(chunk, max_frames_in)
        h = np.asarray(feat_fn(wavs))  # (B, T, D)
        for j, n in enumerate(lengths):
            if n < 0:
                continue
            nf = enc.encoder.config.num_frames(int(n))
            feats.append(h[j, :nf])
            total += nf
        if total >= args.max_frames:
            break

    data = np.concatenate(feats)[: args.max_frames]
    print(f"fitting k={args.vocab} on {data.shape[0]} frames of dim {data.shape[1]}")
    centers, inertia = kmeans_fit(jax.random.key(args.seed), data, args.vocab, iters=args.iters)
    print(f"inertia: {float(inertia):.1f}")
    KMeansQuantizer(centers).save(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
