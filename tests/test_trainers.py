"""GAN + speech-LM trainer tests on the virtual 8-device mesh, and the
checkpoint manager."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_resynth_tpu.core.mesh import make_mesh, shard_batch
from speech_resynth_tpu.core.precision import FLOAT32
from speech_resynth_tpu.models.hifigan import HifiGanConfig
from speech_resynth_tpu.models.llama import LlamaConfig
from speech_resynth_tpu.train.hifigan import HifiGanTrainerConfig, epoch_exponential_schedule, make_gan_trainer
from speech_resynth_tpu.train.speechlm import SpeechLMTrainerConfig, make_speechlm_trainer, param_shardings


def test_gan_train_step():
    mesh = make_mesh(data=8)
    cfg = HifiGanConfig(
        model_in_dim=8,
        upsample_initial_channel=8,
        upsample_rates=(5, 4),
        upsample_kernel_sizes=(10, 8),
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    # invariant from the reference configs: generator output length is
    # (L-1)*prod(rates) + extra, and mel(n_fft=extra, hop=prod) of that
    # yields exactly L frames (400/320 in the real config; 24/20 here)
    extra = int(cfg.waveform_lengths(jnp.asarray([1]))[0])
    tcfg = HifiGanTrainerConfig(n_fft=extra, hop_size=cfg.total_upsample, num_mels=8, steps_per_epoch=10)
    _, state, step_fn = make_gan_trainer(cfg, tcfg, mesh, policy=FLOAT32)

    rng = np.random.default_rng(0)
    B, T = 8, 16
    S = (T - 1) * cfg.total_upsample + extra
    batch = {
        "mel": rng.standard_normal((B, T, 8)).astype(np.float32),
        "wav": rng.standard_normal((B, S)).astype(np.float32) * 0.1,
        "mel_mask": np.ones((B, T), bool),
    }
    batch = shard_batch(batch, mesh)

    metrics_hist = []
    for _ in range(2):
        state, metrics = step_fn(state, batch)
        metrics_hist.append({k: float(v) for k, v in metrics.items()})
    for m in metrics_hist:
        assert all(np.isfinite(v) for v in m.values()), m
    assert int(state.step) == 2


def test_epoch_exponential_schedule():
    sched = epoch_exponential_schedule(0.1, 0.5, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(9)) == pytest.approx(0.1)
    assert float(sched(10)) == pytest.approx(0.05)
    assert float(sched(25)) == pytest.approx(0.025)


def test_speechlm_train_step_dp():
    mesh = make_mesh(data=8)
    cfg = LlamaConfig(vocab_size=40, hidden_size=16, intermediate_size=32, num_hidden_layers=2, num_attention_heads=2)
    _, state, step_fn, _ = make_speechlm_trainer(cfg, SpeechLMTrainerConfig(), mesh, total_steps=100, policy=FLOAT32)

    rng = np.random.default_rng(1)
    ids = rng.integers(2, 40, (16, 12)).astype(np.int32)
    ids[:, -3:] = 0
    batch = {
        "input_ids": ids,
        "attention_mask": (ids != 0).astype(np.int32),
        "labels": np.where(ids == 0, -100, ids).astype(np.int32),
    }
    batch = shard_batch(batch, mesh)

    losses = []
    for i in range(3):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    # the model should start fitting the repeated batch
    assert losses[-1] < losses[0]


def test_gradient_accumulation_semantics():
    """accum_steps=2: no param change on the odd micro-step; the emit step
    applies exactly what one update with the mean gradient would apply."""
    import optax

    from speech_resynth_tpu.train.common import make_optimizer

    params = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    g1 = {"w": jnp.asarray([0.1, -0.2, 0.3]), "b": jnp.asarray([0.5, -0.5])}
    g2 = {"w": jnp.asarray([0.3, 0.2, -0.1]), "b": jnp.asarray([-0.1, 0.1])}
    mean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g1, g2)
    kw = dict(b1=0.9, b2=0.98, eps=1e-9, max_norm=1.0, weight_decay=0.01)

    base = make_optimizer(lambda _: 1e-2, **kw)
    acc = make_optimizer(lambda _: 1e-2, accum_steps=2, **kw)

    s_acc = acc.init(params)
    u1, s_acc = acc.update(g1, s_acc, params)
    assert all(np.allclose(np.asarray(u), 0.0) for u in jax.tree_util.tree_leaves(u1))
    u2, s_acc = acc.update(g2, s_acc, params)

    s_base = base.init(params)
    u_ref, _ = base.update(mean, s_base, params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7), u2, u_ref
    )


def test_speechlm_train_step_with_accumulation():
    """accum_steps wired through the trainer: params move only every 2nd step."""
    mesh = make_mesh(data=8)
    cfg = LlamaConfig(vocab_size=40, hidden_size=16, intermediate_size=32, num_hidden_layers=2, num_attention_heads=2)
    _, state, step_fn, _ = make_speechlm_trainer(
        cfg, SpeechLMTrainerConfig(accum_steps=2), mesh, total_steps=100, policy=FLOAT32
    )
    rng = np.random.default_rng(1)
    ids = rng.integers(2, 40, (16, 12)).astype(np.int32)
    batch = shard_batch(
        {"input_ids": ids, "attention_mask": np.ones_like(ids), "labels": ids.astype(np.int32)}, mesh
    )
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    state, m1 = step_fn(state, batch)
    # micro-step 1 of 2: gradients accumulated, params unchanged
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)), p0, state.params
    )
    state, m2 = step_fn(state, batch)
    moved = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(state.params))
    )
    assert moved and np.isfinite(float(m2["loss"]))


def test_speechlm_tensor_parallel_shardings():
    mesh = make_mesh(data=2, model=4)
    cfg = LlamaConfig(vocab_size=40, hidden_size=16, intermediate_size=32, num_hidden_layers=1, num_attention_heads=2)
    model, state, step_fn, p_shard = make_speechlm_trainer(
        cfg, SpeechLMTrainerConfig(), mesh, total_steps=10, policy=FLOAT32
    )
    # column-parallel kernels sharded on output dim over 'model'
    spec = p_shard["layers_0"]["q_proj"]["kernel"].spec
    assert spec == jax.sharding.PartitionSpec(None, "model")
    spec = p_shard["layers_0"]["down_proj"]["kernel"].spec
    assert spec == jax.sharding.PartitionSpec("model", None)

    rng = np.random.default_rng(2)
    ids = rng.integers(2, 40, (4, 8)).astype(np.int32)
    batch = {
        "input_ids": ids,
        "attention_mask": np.ones_like(ids),
        "labels": ids.astype(np.int32),
    }
    batch = shard_batch(batch, mesh)
    state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_checkpoint_manager_roundtrip(tmp_path):
    from speech_resynth_tpu.core.checkpoint import CheckpointManager

    state = {"params": {"w": jnp.arange(4.0)}, "step": jnp.asarray(7)}
    with CheckpointManager(tmp_path / "ckpt", async_save=False) as mgr:
        assert not mgr.has_checkpoint()
        mgr.save(7, state)
        mgr.wait()
        assert mgr.latest_step() == 7

    with CheckpointManager(tmp_path / "ckpt", async_save=False) as mgr2:
        template = {"params": {"w": jnp.zeros(4)}, "step": jnp.asarray(0)}
        restored = mgr2.restore(template)
        np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), np.arange(4.0))
        assert int(restored["step"]) == 7


def test_checkpoint_roundtrip_with_accumulation_state(tmp_path):
    """optax.MultiSteps state (grad accumulators, mini_step counter) must
    survive an Orbax save/restore mid-accumulation-window, so a killed run
    resumes without losing or double-counting micro-batch gradients."""
    from speech_resynth_tpu.core.checkpoint import CheckpointManager

    mesh = make_mesh(data=8)
    cfg = LlamaConfig(vocab_size=40, hidden_size=16, intermediate_size=32, num_hidden_layers=2, num_attention_heads=2)
    _, state, step_fn, _ = make_speechlm_trainer(
        cfg, SpeechLMTrainerConfig(accum_steps=2), mesh, total_steps=100, policy=FLOAT32
    )
    rng = np.random.default_rng(7)
    ids = rng.integers(2, 40, (16, 12)).astype(np.int32)
    batch = shard_batch(
        {"input_ids": ids, "attention_mask": np.ones_like(ids), "labels": ids.astype(np.int32)}, mesh
    )
    state, _ = step_fn(state, batch)  # mid-window: one micro-batch accumulated

    with CheckpointManager(tmp_path / "ckpt", async_save=False) as mgr:
        mgr.save(1, state)
        mgr.wait()
    with CheckpointManager(tmp_path / "ckpt", async_save=False) as mgr2:
        template = jax.tree_util.tree_map(jnp.zeros_like, state)
        restored = mgr2.restore(template)

    # continuing the restored state emits the same update as the original
    cont_a, _ = step_fn(state, batch)
    cont_b, _ = step_fn(jax.device_put(restored, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())), batch)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        cont_a.params,
        cont_b.params,
    )


def test_fsdp_rules_shard_and_run():
    """fsdp_rules: large kernels sharded over data (and model when tp=True);
    a jitted forward executes under the sharded layout."""
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from speech_resynth_tpu.core.mesh import DATA_AXIS, MODEL_AXIS, make_mesh
    from speech_resynth_tpu.core.precision import FLOAT32
    from speech_resynth_tpu.models.llama import LlamaConfig, LlamaLM
    from speech_resynth_tpu.parallel import fsdp_rules

    mesh = make_mesh(data=4, model=2)
    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=2, num_attention_heads=2
    )
    model = LlamaLM(cfg, policy=FLOAT32, attn_implementation="xla")
    variables = model.init(jax.random.key(0), jnp.ones((1, 8), jnp.int32))

    rules = fsdp_rules(mesh, variables["params"], min_size=1024, tp=True)
    qspec = rules["layers_0"]["q_proj"]["kernel"].spec
    assert MODEL_AXIS in qspec and DATA_AXIS in qspec  # TP + FSDP composed
    assert rules["layers_0"]["input_norm"]["weight"].spec == P()  # small leaf replicated

    params = jax.tree_util.tree_map(jax.device_put, variables["params"], rules)
    ids = jnp.ones((8, 8), jnp.int32)
    logits, _ = jax.jit(lambda p, i: model.apply({"params": p}, i))(params, ids)
    assert np.isfinite(np.asarray(logits)).all()
