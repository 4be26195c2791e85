"""Unit tests for ops/: attention, length regulator, dedup, codebook."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_resynth_tpu.ops import attention as A
from speech_resynth_tpu.ops import codebook as C
from speech_resynth_tpu.ops import dedup as D
from speech_resynth_tpu.ops import length_regulator as LR


# -- attention ---------------------------------------------------------------


def _torch_sdpa(q, k, v, mask=None, causal=False):
    import torch
    import torch.nn.functional as F

    tq, tk, tv = map(torch.from_numpy, (q, k, v))
    attn_mask = None
    if mask is not None:
        attn_mask = torch.from_numpy(mask)[:, None, None, :].expand(-1, q.shape[1], q.shape[2], -1)
    return F.scaled_dot_product_attention(tq, tk, tv, attn_mask=attn_mask, is_causal=causal).numpy()


@pytest.mark.parametrize("causal", [False, True])
def test_attention_reference_vs_torch(causal):
    rng = np.random.default_rng(0)
    b, h, n, d = 2, 2, 37, 16
    q, k, v = (rng.standard_normal((b, h, n, d)).astype(np.float32) for _ in range(3))
    mask = None if causal else (rng.uniform(size=(b, n)) > 0.3)
    if mask is not None:
        mask[:, 0] = True

    ours = np.asarray(A.attention_reference(q, k, v, None if mask is None else jnp.asarray(mask), causal))
    theirs = _torch_sdpa(q, k, v, mask, causal)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_pallas_interpret_matches_reference(causal):
    rng = np.random.default_rng(1)
    b, h, n, d = 1, 2, 100, 64  # non-multiple of block to exercise padding
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32) for _ in range(3))
    mask = jnp.asarray(rng.uniform(size=(b, n)) > 0.2)
    mask = mask.at[:, 0].set(True)

    ref = A.attention_reference(q, k, v, mask, causal)
    got = A._flash_forward(q, k, v, mask, causal, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_flash_custom_vjp_grads_match_reference():
    rng = np.random.default_rng(2)
    b, h, n, d = 1, 1, 32, 8
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32) for _ in range(3))

    def loss_ref(q, k, v):
        return jnp.sum(A.attention_reference(q, k, v, None, False) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    # custom_vjp backward recomputes via the lax reference, so grads must
    # match the reference's exactly; forward uses the (interpreted) kernel.
    orig_forward = A._flash_forward

    def flash_interp(q, k, v, mask, causal):
        return orig_forward(q, k, v, mask, causal, interpret=True)

    import unittest.mock as mock

    with mock.patch.object(A, "_flash_forward", flash_interp):

        def loss_flash(q, k, v):
            return jnp.sum(A._flash_attention(q, k, v, None, False) ** 2)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)

    for a, b_ in zip(g_ref, g_flash):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


# -- length regulator ---------------------------------------------------------


def test_regulate_length_matches_hf():
    import torch
    from transformers.models.fastspeech2_conformer.modeling_fastspeech2_conformer import length_regulator

    rng = np.random.default_rng(3)
    h = rng.standard_normal((2, 5, 4)).astype(np.float32)
    dur = np.array([[1, 0, 3, 2, 1], [2, 2, 0, 0, 1]], np.int64)

    theirs = length_regulator(torch.from_numpy(h), torch.from_numpy(dur)).numpy()
    out_len = theirs.shape[1]
    ours, mask = LR.regulate_length(jnp.asarray(h), jnp.asarray(dur), out_len)

    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(LR.regulated_lengths(jnp.asarray(dur))), dur.sum(-1))
    np.testing.assert_array_equal(np.asarray(mask), np.arange(out_len)[None] < dur.sum(-1, keepdims=True))


def test_regulate_length_jits_with_static_bound():
    f = jax.jit(LR.regulate_length, static_argnums=2)
    h = jnp.ones((1, 3, 2))
    dur = jnp.array([[2, 1, 1]])
    out, mask = f(h, dur, 8)
    assert out.shape == (1, 8, 2)
    assert int(mask.sum()) == 4
    np.testing.assert_allclose(np.asarray(out[0, 4:]), 0.0)


# -- dedup ---------------------------------------------------------------------


def test_deduplicate_matches_unique_consecutive():
    import torch

    rng = np.random.default_rng(4)
    units = rng.integers(0, 5, size=50).astype(np.int32)

    t_units, t_durs = torch.unique_consecutive(torch.from_numpy(units), return_counts=True)
    got_u, got_d, n = D.deduplicate(jnp.asarray(units))
    n = int(n)
    np.testing.assert_array_equal(np.asarray(got_u[:n]), t_units.numpy())
    np.testing.assert_array_equal(np.asarray(got_d[:n]), t_durs.numpy())
    assert np.all(np.asarray(got_u[n:]) == 0) and np.all(np.asarray(got_d[n:]) == 0)


def test_deduplicate_respects_length():
    units = jnp.asarray(np.array([7, 7, 3, 3, 3, 9, 9, 9], np.int32))
    got_u, got_d, n = D.deduplicate(units, jnp.asarray(5))
    assert int(n) == 2
    np.testing.assert_array_equal(np.asarray(got_u[:2]), [7, 3])
    np.testing.assert_array_equal(np.asarray(got_d[:2]), [2, 3])


def test_deduplicate_batch():
    units = jnp.asarray(np.array([[1, 1, 2, 2], [5, 5, 5, 5]], np.int32))
    lengths = jnp.asarray(np.array([4, 3], np.int32))
    u, d, n = D.deduplicate_batch(units, lengths)
    np.testing.assert_array_equal(np.asarray(n), [2, 1])
    np.testing.assert_array_equal(np.asarray(u[0, :2]), [1, 2])
    np.testing.assert_array_equal(np.asarray(d[1, :1]), [3])


# -- codebook -------------------------------------------------------------------


def test_codebook_assign_matches_bruteforce():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((33, 24)).astype(np.float32)
    centers = rng.standard_normal((17, 24)).astype(np.float32)

    brute = np.argmin(((x[:, None] - centers[None]) ** 2).sum(-1), axis=-1)
    got = np.asarray(C.assign_reference(jnp.asarray(x), jnp.asarray(centers)))
    np.testing.assert_array_equal(got, brute)


def test_codebook_pallas_interpret_matches_reference():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((40, 32)), jnp.float32)
    centers = jnp.asarray(rng.standard_normal((10, 32)), jnp.float32)

    ref = C.assign_reference(x, centers)
    got = C.assign_pallas(x, centers, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("q_len,k_len", [(100, 260), (128, 256), (60, 100)])
def test_flash_causal_cross_length_matches_reference(q_len, k_len):
    """Causal attention with k_len != q_len: query i attends keys up to
    i + (k_len - q_len) (the reference's tril offset).  The kernel's causal
    mask and block-skip must both honor the offset."""
    rng = np.random.default_rng(5)
    b, h, d = 1, 2, 64
    q = jnp.asarray(rng.standard_normal((b, h, q_len, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, k_len, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, k_len, d)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(b, k_len)) > 0.2)
    mask = mask.at[:, 0].set(True)

    ref = A.attention_reference(q, k, v, mask, causal=True)
    got = A._flash_forward(q, k, v, mask, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_flash_causal_rejects_q_longer_than_k():
    """q_len > k_len causal: fully-masked early query rows would emit zeros
    while the reference yields a uniform softmax — the kernel refuses loudly
    and auto dispatch must route the shape to XLA (ADVICE r2 #3)."""
    rng = np.random.default_rng(7)
    b, h, d = 1, 2, 64
    q = jnp.asarray(rng.standard_normal((b, h, 256, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, 128, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, 128, d)), jnp.float32)

    with pytest.raises(ValueError, match="q_len <= k_len"):
        A._flash_forward(q, k, v, None, causal=True, interpret=True)

    # auto dispatch: must not raise (falls back to XLA) and must match the ref
    got = A.dot_product_attention(q, k, v, None, causal=True, implementation="auto")
    ref = A.attention_reference(q, k, v, None, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_auto_dispatch_gate():
    """The auto gate itself, exercised with on_tpu=True on the CPU suite
    (the dot_product_attention call site always sees on_tpu=False here, so
    the shape logic would otherwise be vacuously untested)."""
    # CFM family: d%128==0 bidir, long enough -> pallas
    assert A.auto_dispatch(128, 256, 256, causal=False, on_tpu=True) == "pallas"
    assert A.auto_dispatch(128, 255, 255, causal=False, on_tpu=True) == "xla"
    # Llama family: d=64 short causal -> pallas
    assert A.auto_dispatch(64, 128, 128, causal=True, on_tpu=True) == "pallas"
    assert A.auto_dispatch(64, 513, 513, causal=True, on_tpu=True) == "xla"
    # HuBERT/Whisper family: d=64 bidir -> xla (in-context fusion verdict)
    assert A.auto_dispatch(64, 256, 256, causal=False, on_tpu=True) == "xla"
    # kernel rejects q_len > k_len causal -> must route to xla even on TPU
    assert A.auto_dispatch(64, 256, 128, causal=True, on_tpu=True) == "xla"
    assert A.auto_dispatch(128, 512, 256, causal=True, on_tpu=True) == "xla"
    # q_len < k_len causal (KV-cache decode tail) keeps the d=64 pallas win
    assert A.auto_dispatch(64, 256, 512, causal=True, on_tpu=True) == "pallas"
    # never pallas off-TPU
    assert A.auto_dispatch(128, 512, 512, causal=False, on_tpu=False) == "xla"
