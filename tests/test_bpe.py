"""C++ BPE parity tests against HF tokenizers (the exact library the
reference uses, speechlm/tokenize.py:16-35)."""

import random
import string

import pytest

from speech_resynth_tpu.text.units import shift_unit
from speech_resynth_tpu.tokenizers.bpe import BpeTokenizer


def unit_corpus(n_lines=200, vocab=20, seed=0):
    rng = random.Random(seed)
    lines = []
    for _ in range(n_lines):
        units = [rng.randrange(vocab) for _ in range(rng.randrange(10, 60))]
        lines.append("".join(chr(shift_unit(u)) for u in units))
    return lines


def hf_train(lines, vocab_size, initial_alphabet):
    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from tokenizers.trainers import BpeTrainer

    trainer = BpeTrainer(vocab_size=vocab_size, initial_alphabet=initial_alphabet, show_progress=False)
    tok = Tokenizer(BPE())
    tok.train_from_iterator(lines, trainer=trainer)
    return tok


@pytest.mark.parametrize("vocab_size", [40, 64])
def test_training_matches_hf_tokenizers(vocab_size):
    lines = unit_corpus()
    alphabet = [chr(shift_unit(u)) for u in range(20)]

    ours = BpeTokenizer.train(lines, vocab_size, alphabet)
    theirs = hf_train(lines, vocab_size, alphabet)

    assert ours.get_vocab() == theirs.get_vocab()

    for line in lines[:20]:
        assert ours.encode(line) == theirs.encode(line).ids


def test_roundtrip_save_load(tmp_path):
    lines = unit_corpus(n_lines=100, vocab=10, seed=1)
    alphabet = [chr(shift_unit(u)) for u in range(10)]
    tok = BpeTokenizer.train(lines, 30, alphabet)

    path = tmp_path / "tokenizer.json"
    tok.save(str(path))
    tok2 = BpeTokenizer.from_file(str(path))
    for line in lines[:10]:
        assert tok.encode(line) == tok2.encode(line)


def test_hf_can_load_our_tokenizer_json(tmp_path):
    from tokenizers import Tokenizer

    lines = unit_corpus(n_lines=100, vocab=10, seed=2)
    alphabet = [chr(shift_unit(u)) for u in range(10)]
    tok = BpeTokenizer.train(lines, 30, alphabet)
    path = tmp_path / "tokenizer.json"
    tok.save(str(path))

    hf = Tokenizer.from_file(str(path))
    for line in lines[:10]:
        assert tok.encode(line) == hf.encode(line).ids


def test_initial_alphabet_always_included():
    lines = ["aaa", "aab"]
    alphabet = [chr(shift_unit(u)) for u in range(5)]  # includes chars not in corpus
    tok = BpeTokenizer.train(lines, 10, alphabet)
    vocab = tok.get_vocab()
    for ch in alphabet:
        assert ch in vocab
