#!/usr/bin/env python
"""Convert published torch/HF checkpoints into this framework's local layout.

Run on a host with the torch checkpoints already downloaded (zero-egress TPU
pods can't fetch); writes:
  models/encoders/<dense_model>.safetensors            (HF HubertModel weights)
  models/encoders/<dense>-<quantizer>-<vocab>.npz      (k-means centers)
  models/flow_matching_with_hifigan/                   (composite CFM+vocoder)

Usage:
  python scripts/convert_checkpoints.py hubert --src /path/to/hf_hubert_dir \
      --name mhubert-base-vp_mls_cv_8lang
  python scripts/convert_checkpoints.py kmeans --src /path/to/centers.npy \
      --name mhubert-base-vp_mls_cv_8lang --quantizer kmeans-expresso --vocab 2000
  python scripts/convert_checkpoints.py composite --src /path/to/flow_matching_with_hifigan
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def convert_hubert(src: str, name: str, out_dir: str) -> None:
    from safetensors.numpy import load_file, save_file

    src = Path(src)
    st = src / "model.safetensors"
    if st.is_file():
        sd = load_file(str(st))
    else:
        import torch

        sd = {k: v.numpy() for k, v in torch.load(src / "pytorch_model.bin", map_location="cpu").items()}
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, str(out / f"{name}.safetensors"))
    print(f"wrote {out / f'{name}.safetensors'}")


def convert_kmeans(src: str, name: str, quantizer: str, vocab: int, out_dir: str) -> None:
    src = Path(src)
    if src.suffix == ".npy":
        centers = np.load(src)
    else:  # sklearn joblib/pickle with cluster_centers_
        import joblib

        centers = joblib.load(src).cluster_centers_
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    path = out / f"{name}-{quantizer}-{vocab}.npz"
    np.savez(path, centers=np.asarray(centers, np.float32))
    print(f"wrote {path}")


def convert_composite(src: str, dst: str) -> None:
    """Re-save an HF composite checkpoint dir with weights as safetensors
    (our from_pretrained reads it directly; this just normalizes format)."""
    import json
    import shutil

    from safetensors.numpy import save_file

    src, dst = Path(src), Path(dst)
    dst.mkdir(parents=True, exist_ok=True)
    shutil.copy(src / "config.json", dst / "config.json")
    st = src / "model.safetensors"
    if st.is_file():
        shutil.copy(st, dst / "model.safetensors")
    else:
        import torch

        sd = {k: v.numpy() for k, v in torch.load(src / "pytorch_model.bin", map_location="cpu").items()}
        save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, str(dst / "model.safetensors"))
    print(f"wrote {dst}")


def convert_utmos(src: str, dst: str) -> None:
    """Extract the UTMOS lightning checkpoint's state_dict into a plain
    safetensors file.  The raw .ckpt pickles lightning/hydra objects that
    need pytorch-lightning to unpickle; the pod only needs the tensors
    (pipeline/scorers.NativeUTMOS loads either format)."""
    import torch
    from safetensors.numpy import save_file

    blob = torch.load(src, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    dst = Path(dst)
    dst.parent.mkdir(parents=True, exist_ok=True)
    def _to_numpy(v):
        # preserve original dtypes (int/bool buffers survive); only f64/bf16
        # floats downcast to f32 (bf16 has no numpy dtype, f64 is never wanted)
        arr = v.float().numpy() if v.dtype in (torch.float64, torch.bfloat16, torch.float16) else v.numpy()
        return np.ascontiguousarray(arr)

    save_file({k: _to_numpy(v) for k, v in sd.items()}, str(dst))
    print(f"wrote {dst}")


def convert_whisper(src: str, dst: str) -> None:
    """Stage an HF Whisper checkpoint dir for NativeWhisperASR: weights as
    safetensors plus the config/tokenizer/generation files it reads."""
    import shutil

    src, dst = Path(src), Path(dst)
    dst.mkdir(parents=True, exist_ok=True)
    wanted = [
        "config.json",
        "generation_config.json",
        "tokenizer.json",
        "tokenizer_config.json",
        "vocab.json",
        "merges.txt",
        "special_tokens_map.json",
        "added_tokens.json",
        "normalizer.json",
        "preprocessor_config.json",
    ]
    for name in wanted:
        if (src / name).is_file():
            shutil.copy(src / name, dst / name)
    copied = False
    for name in ("model.safetensors", "model.safetensors.index.json"):
        if (src / name).is_file():
            shutil.copy(src / name, dst / name)
            copied = True
    if (src / "model.safetensors.index.json").is_file():
        for shard in src.glob("model-*.safetensors"):
            shutil.copy(shard, dst / shard.name)
    if not copied:
        import torch
        from safetensors.numpy import save_file

        sd = {k: v.numpy() for k, v in torch.load(src / "pytorch_model.bin", map_location="cpu").items()}
        save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, str(dst / "model.safetensors"))
    print(f"wrote {dst}")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("kind", choices=("hubert", "kmeans", "composite", "utmos", "whisper"))
    p.add_argument("--src", required=True)
    p.add_argument("--name", default="mhubert-base-vp_mls_cv_8lang")
    p.add_argument("--quantizer", default="kmeans-expresso")
    p.add_argument("--vocab", type=int, default=2000)
    p.add_argument("--out", default="models/encoders")
    args = p.parse_args()
    if args.kind == "hubert":
        convert_hubert(args.src, args.name, args.out)
    elif args.kind == "kmeans":
        convert_kmeans(args.src, args.name, args.quantizer, args.vocab, args.out)
    elif args.kind == "utmos":
        convert_utmos(args.src, args.out if args.out != "models/encoders" else "models/utmos.safetensors")
    elif args.kind == "whisper":
        convert_whisper(args.src, args.out if args.out != "models/encoders" else "models/whisper-large-v3")
    else:
        convert_composite(args.src, args.out if args.out != "models/encoders" else "models/flow_matching_with_hifigan")


if __name__ == "__main__":
    main()
