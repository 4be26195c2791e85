"""core/ module tests: metrics, rng streams, mesh helpers, precision."""

import numpy as np
import pytest

import jax

from speech_resynth_tpu.core.mesh import dp_mesh_for_batch, make_mesh, shard_batch
from speech_resynth_tpu.core.metrics import MetricsWriter, StepTimer, trace_span
from speech_resynth_tpu.core.precision import BF16_INFERENCE, DEFAULT, FLOAT32
from speech_resynth_tpu.core.rng import RngStream


def test_rng_stream_deterministic():
    a = RngStream(7)
    b = RngStream(7)
    ka, kb = a.next(), b.next()
    np.testing.assert_array_equal(jax.random.key_data(ka), jax.random.key_data(kb))
    # fold_in is pure w.r.t. stream state
    np.testing.assert_array_equal(
        jax.random.key_data(a.fold_in(3)), jax.random.key_data(b.fold_in(3))
    )
    # consecutive next() keys differ
    assert not np.array_equal(jax.random.key_data(a.next()), jax.random.key_data(ka))


def test_rng_stream_process_unique():
    base = RngStream(7)
    proc = RngStream(7, process_unique=True)  # process 0 folds in index 0
    # fold_in(0) of base == initial of process-unique at index 0 by construction
    assert proc is not None  # smoke: single-process env, just constructible


def test_step_timer():
    t = StepTimer(window=3)
    assert t.tick() is None
    for _ in range(4):
        dt = t.tick()
        assert dt is not None and dt >= 0
    assert t.mean_step_time > 0
    assert t.throughput(10) > 0
    assert t.rtf(2.0) == t.throughput(2.0)


def test_metrics_writer_noop_and_real(tmp_path):
    w = MetricsWriter(tmp_path / "logs", enabled=False)
    w.scalar("a", 1.0, 0)  # no-op, no crash
    w.close()

    w2 = MetricsWriter(tmp_path / "logs2", enabled=True)
    w2.scalar("loss", 0.5, 1)
    w2.scalars({"x": 1, "y": 2}, 2, prefix="train/")
    w2.audio("wav", np.zeros(100, np.float32), 1)
    w2.spectrogram_figure("spec", np.zeros((80, 50)), 1)
    w2.flush()
    w2.close()
    assert any((tmp_path / "logs2").iterdir())


def test_compiled_cost_and_peaks():
    from speech_resynth_tpu.core.metrics import (
        compiled_cost,
        compiled_flops,
        device_peak_flops,
        device_peak_hbm_bw,
    )

    f = jax.jit(lambda a, b: jax.numpy.tanh(a @ b))
    a = jax.numpy.ones((32, 32))
    f(a, a)
    compiled = f.lower(a, a).compile()
    # flops path is the same lookup; both are >=0 and never raise
    assert compiled_cost(compiled, "flops") == compiled_flops(compiled)
    assert compiled_cost(compiled, "bytes accessed") >= 0.0
    assert compiled_cost(compiled, "no such key") == 0.0
    assert compiled_cost(object(), "flops") == 0.0  # no cost_analysis attr

    class FakeDev:
        device_kind = "TPU v5 lite"

    # "TPU v5 lite" must match the lite row, not the "TPU v5" prefix row
    assert device_peak_hbm_bw(FakeDev()) == 819e9
    assert device_peak_flops(FakeDev()) == 197e12
    FakeDev.device_kind = "TPU v5p"
    assert device_peak_hbm_bw(FakeDev()) == 2765e9
    FakeDev.device_kind = "weird accelerator"
    assert device_peak_hbm_bw(FakeDev()) == 0.0


def test_trace_span_runs():
    with trace_span("test-span"):
        pass


def test_dp_mesh_for_batch():
    mesh, batch = dp_mesh_for_batch(2700)
    assert batch == 2696 and mesh.shape["data"] == 8
    mesh2, batch2 = dp_mesh_for_batch(2)
    assert batch2 == 2 and mesh2.shape["data"] == 2


def test_precision_policies():
    import jax.numpy as jnp

    assert DEFAULT.compute_dtype == jnp.bfloat16 and DEFAULT.param_dtype == jnp.float32
    assert FLOAT32.compute_dtype == jnp.float32
    assert BF16_INFERENCE.param_dtype == jnp.bfloat16
    x = jnp.ones(3, jnp.float32)
    assert DEFAULT.cast_to_compute(x).dtype == jnp.bfloat16
    assert DEFAULT.cast_to_output(DEFAULT.cast_to_compute(x)).dtype == jnp.float32


def test_shard_batch_places_on_mesh():
    mesh = make_mesh(data=8)
    batch = {"x": np.zeros((16, 4), np.float32)}
    out = shard_batch(batch, mesh)
    assert out["x"].sharding.spec == jax.sharding.PartitionSpec("data", None)
