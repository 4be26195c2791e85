"""Hub-id resolution (models/hub.py): from_pretrained accepts 'org/name' ids
resolved through the local HF cache, matching the reference's
README.md:43 `from_pretrained("ryota-komatsu/flow_matching_with_hifigan")`
semantics on a cached (or egress-capable) host."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_resynth_tpu.core.precision import FLOAT32
from speech_resynth_tpu.models import export as E
from speech_resynth_tpu.models.cfm import CFMConfig
from speech_resynth_tpu.models.composite import ConditionalFlowMatchingWithHifiGan
from speech_resynth_tpu.models.hifigan import HifiGanConfig
from speech_resynth_tpu.models.hub import resolve_pretrained_dir


def _fake_cache(root, repo_id, sha="abc123", with_ref=True):
    repo = root / ("models--" + repo_id.replace("/", "--"))
    snap = repo / "snapshots" / sha
    snap.mkdir(parents=True)
    if with_ref:
        (repo / "refs").mkdir()
        (repo / "refs" / "main").write_text(sha + "\n")
    return snap


def test_local_dir_passthrough(tmp_path):
    assert resolve_pretrained_dir(tmp_path) == tmp_path
    assert resolve_pretrained_dir(str(tmp_path)) == tmp_path


def test_refs_main_resolution(tmp_path, monkeypatch):
    snap = _fake_cache(tmp_path / "hub", "org/model")
    monkeypatch.setenv("HF_HUB_CACHE", str(tmp_path / "hub"))
    assert resolve_pretrained_dir("org/model") == snap


def test_newest_snapshot_fallback(tmp_path, monkeypatch):
    # Partial cache without refs/main: newest snapshot dir wins.
    import os
    import time

    hub = tmp_path / "hub"
    old = _fake_cache(hub, "org/model", sha="old000", with_ref=False)
    past = time.time() - 1000
    os.utime(old, (past, past))
    new = hub / "models--org--model" / "snapshots" / "new111"
    new.mkdir()
    monkeypatch.setenv("HF_HUB_CACHE", str(hub))
    assert resolve_pretrained_dir("org/model") == new


def test_explicit_cache_dir_wins(tmp_path, monkeypatch):
    monkeypatch.delenv("HF_HUB_CACHE", raising=False)
    snap = _fake_cache(tmp_path / "mycache", "org/model")
    assert resolve_pretrained_dir("org/model", cache_dir=str(tmp_path / "mycache")) == snap


def test_missing_id_error_names_roots(tmp_path, monkeypatch):
    monkeypatch.setenv("HF_HUB_CACHE", str(tmp_path / "hub"))
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")  # forbid network in the fallback
    with pytest.raises(FileNotFoundError, match="org/nope"):
        resolve_pretrained_dir("org/nope")


def test_non_hub_path_error(tmp_path):
    with pytest.raises(FileNotFoundError, match="not an 'org/name' hub id"):
        resolve_pretrained_dir(tmp_path / "does-not-exist")


def test_composite_from_pretrained_by_hub_id(tmp_path, monkeypatch):
    cfm_cfg = CFMConfig(
        vocab_size=9,
        dim_in=8,
        dim_cond_emb=12,
        hidden_size=16,
        depth=2,
        heads=2,
        intermediate_size=24,
        conv_pos_embed_kernel_size=7,
        conv_pos_embed_groups=16,
    )
    voc_cfg = HifiGanConfig(
        model_in_dim=8,
        upsample_initial_channel=16,
        upsample_rates=(5, 4),
        upsample_kernel_sizes=(10, 8),
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    dec = ConditionalFlowMatchingWithHifiGan.from_config(cfm_cfg, voc_cfg, policy=FLOAT32)
    snap = _fake_cache(tmp_path / "hub", "org/composite")
    E.save_composite_pretrained(snap, dec.model_variables, cfm_cfg, dec.vocoder_variables["params"], voc_cfg)
    monkeypatch.setenv("HF_HUB_CACHE", str(tmp_path / "hub"))

    dec2 = ConditionalFlowMatchingWithHifiGan.from_pretrained("org/composite", policy=FLOAT32)
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 10, (1, 6)), jnp.int32)
    w1, l1 = dec.synthesize(ids, dt=0.5, rng=jax.random.key(7))
    w2, l2 = dec2.synthesize(ids, dt=0.5, rng=jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=1e-5, atol=1e-6)
