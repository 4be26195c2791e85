"""ctypes bindings for the C++ BPE trainer/encoder (csrc/bpe.cpp).

Capability parity with the HF ``tokenizers`` Rust BPE as the reference uses
it (/root/reference/src/speechlm/tokenize.py:16-35): whole-line words, fixed
initial alphabet, target vocab size; encode-to-ids; JSON save/load in the HF
tokenizer.json schema so models interoperate both ways.
"""

from __future__ import annotations

import ctypes
import json
import subprocess
from pathlib import Path
from typing import Iterable, List, Sequence

_CSRC = Path(__file__).parent / "csrc"
_LIB_PATH = _CSRC / "libbpe.so"


def _build_library() -> Path:
    src = _CSRC / "bpe.cpp"
    if _LIB_PATH.exists() and _LIB_PATH.stat().st_mtime >= src.stat().st_mtime:
        return _LIB_PATH
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", str(src), "-o", str(_LIB_PATH)],
        check=True,
        capture_output=True,
    )
    return _LIB_PATH


_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(_build_library()))
        lib.bpe_train_from_lines.restype = ctypes.c_void_p
        lib.bpe_train_from_lines.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_uint64,
            ctypes.c_uint32,
        ]
        lib.bpe_free.argtypes = [ctypes.c_void_p]
        lib.bpe_vocab_size.restype = ctypes.c_uint32
        lib.bpe_vocab_size.argtypes = [ctypes.c_void_p]
        lib.bpe_token.restype = ctypes.c_uint32
        lib.bpe_token.argtypes = [ctypes.c_void_p, ctypes.c_uint32, ctypes.c_char_p, ctypes.c_uint32]
        lib.bpe_num_merges.restype = ctypes.c_uint64
        lib.bpe_num_merges.argtypes = [ctypes.c_void_p]
        lib.bpe_merge.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.bpe_encode.restype = ctypes.c_uint64
        lib.bpe_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint64]
        lib.bpe_from_vocab.restype = ctypes.c_void_p
        lib.bpe_from_vocab.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_uint64,
        ]
        _lib = lib
    return _lib


class BpeTokenizer:
    """BPE model backed by the C++ extension."""

    def __init__(self, handle: int):
        self._h = ctypes.c_void_p(handle)
        self._lib = _load()

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.bpe_free(self._h)
        except Exception:
            pass

    # -- training ------------------------------------------------------------

    @classmethod
    def train(
        cls,
        lines: Iterable[str],
        vocab_size: int,
        initial_alphabet: Sequence[str] = (),
    ) -> "BpeTokenizer":
        lib = _load()
        lines = [l.rstrip("\n") for l in lines]
        arr = (ctypes.c_char_p * len(lines))(*[l.encode("utf-8") for l in lines])
        alpha = [ord(c) for c in initial_alphabet]
        alpha_arr = (ctypes.c_uint32 * len(alpha))(*alpha)
        handle = lib.bpe_train_from_lines(arr, len(lines), alpha_arr, len(alpha), vocab_size)
        return cls(handle)

    @classmethod
    def train_files(cls, files: Sequence[str], vocab_size: int, initial_alphabet: Sequence[str] = ()):
        lines: List[str] = []
        for f in files:
            with open(f, encoding="utf-8") as fh:
                lines.extend(line.rstrip("\n") for line in fh)
        return cls.train(lines, vocab_size, initial_alphabet)

    # -- inference -----------------------------------------------------------

    def encode(self, text: str) -> List[int]:
        data = text.encode("utf-8")
        cap = max(len(text), 1)
        out = (ctypes.c_uint32 * cap)()
        n = self._lib.bpe_encode(self._h, data, out, cap)
        if n > cap:  # shouldn't happen (output <= #chars) but be safe
            out = (ctypes.c_uint32 * n)()
            n = self._lib.bpe_encode(self._h, data, out, n)
        return list(out[:n])

    @property
    def vocab_size(self) -> int:
        return self._lib.bpe_vocab_size(self._h)

    def token(self, token_id: int) -> str:
        buf = ctypes.create_string_buffer(64)
        n = self._lib.bpe_token(self._h, token_id, buf, 64)
        if n > 64:
            buf = ctypes.create_string_buffer(n)
            self._lib.bpe_token(self._h, token_id, buf, n)
        return buf.raw[:n].decode("utf-8")

    def get_vocab(self) -> dict:
        return {self.token(i): i for i in range(self.vocab_size)}

    def merges(self) -> List[tuple]:
        n = self._lib.bpe_num_merges(self._h)
        left = ctypes.c_uint32()
        right = ctypes.c_uint32()
        out = []
        for r in range(n):
            self._lib.bpe_merge(self._h, r, ctypes.byref(left), ctypes.byref(right))
            out.append((left.value, right.value))
        return out

    # -- serialization (HF tokenizer.json schema) ------------------------------

    def save(self, path: str) -> None:
        vocab = self.get_vocab()
        id_to_tok = {i: t for t, i in vocab.items()}
        merges = [[id_to_tok[a], id_to_tok[b]] for a, b in self.merges()]
        doc = {
            "version": "1.0",
            "truncation": None,
            "padding": None,
            "added_tokens": [],
            "normalizer": None,
            "pre_tokenizer": None,
            "post_processor": None,
            "decoder": None,
            "model": {
                "type": "BPE",
                "dropout": None,
                "unk_token": None,
                "continuing_subword_prefix": None,
                "end_of_word_suffix": None,
                "fuse_unk": False,
                "byte_fallback": False,
                "ignore_merges": False,
                "vocab": vocab,
                "merges": merges,
            },
        }
        with open(path, "w", encoding="utf-8") as f:
            json.dump(doc, f, ensure_ascii=False)

    @classmethod
    def from_file(cls, path: str) -> "BpeTokenizer":
        with open(path, encoding="utf-8") as f:
            doc = json.load(f)
        model = doc["model"] if "model" in doc else doc
        vocab = model["vocab"]
        merges = model["merges"]
        id_to_tok = [None] * len(vocab)
        for t, i in vocab.items():
            id_to_tok[i] = t
        lib = _load()
        toks = (ctypes.c_char_p * len(id_to_tok))(*[t.encode("utf-8") for t in id_to_tok])
        flat = []
        for m in merges:
            a, b = (m.split(" ", 1) if isinstance(m, str) else m)
            flat += [vocab[a], vocab[b]]
        pairs = (ctypes.c_uint32 * len(flat))(*flat)
        handle = lib.bpe_from_vocab(toks, len(id_to_tok), pairs, len(merges))
        if not handle:
            raise ValueError(f"inconsistent vocab/merges in {path}")
        return cls(handle)
