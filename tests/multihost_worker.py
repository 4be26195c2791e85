"""Worker for the 2-process multi-host smoke test (launched by
test_multihost.py).  Each process gets 4 virtual CPU devices -> an 8-device
global mesh, and exercises the real multi-host machinery:

  * jax.distributed.initialize rendezvous (the reference's init_process_group
    equivalent, speechlm/train.py:75-78)
  * _global_batch_plan iterator sharding + shard_batch's
    make_array_from_process_local_data path
  * a pjit'ed global-mean step (gradient-all-reduce stand-in) whose result
    must be identical on both hosts
  * Orbax multi-process save + restore through core/checkpoint.py

Usage: python multihost_worker.py <coordinator> <process_id> <num_processes> <workdir>
Writes <workdir>/ok_<pid>.json on success.
"""

import json
import sys
from pathlib import Path


def main():
    coordinator, pid, nproc, workdir = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), Path(sys.argv[4])

    import os

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator, num_processes=nproc, process_id=pid)

    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc
    assert jax.local_device_count() == 4

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from speech_resynth_tpu.core.checkpoint import CheckpointManager
    from speech_resynth_tpu.core.mesh import local_batch_slice, make_mesh, replicate, shard_batch
    from speech_resynth_tpu.pipeline.data import UnitTextDataset

    mesh = make_mesh()

    # every host must see the same number of batches and the global mean of
    # each sharded batch must agree (the all-reduce path)
    ds = UnitTextDataset(workdir / "corpus.txt", units_per_sample=8)
    global_batch = 8
    sl = local_batch_slice(global_batch)
    assert sl == slice(pid * (global_batch // nproc), (pid + 1) * (global_batch // nproc))

    step = jax.jit(lambda ids: jnp.mean(ids.astype(jnp.float32)))
    means = []
    n_batches = 0
    for batch in ds.batches(global_batch, seed=1, epoch=0, process_index=pid, process_count=nproc):
        assert batch["input_ids"].shape[0] == global_batch // nproc
        sharded = shard_batch({"input_ids": batch["input_ids"]}, mesh)
        assert sharded["input_ids"].shape[0] == global_batch  # global array
        means.append(float(step(sharded["input_ids"])))
        n_batches += 1

    # multi-process Orbax save/restore: state must be globally-replicated
    # jax.Arrays (exactly how the train loops hold state) — host-local arrays
    # are not serializable in a multi-host setting
    state = replicate({"w": np.full((4,), 7.0, np.float32), "step": np.asarray(n_batches)}, mesh)
    with CheckpointManager(workdir / "ckpt", async_save=False) as ckpt:
        ckpt.save(1, state, force=True)
        restored = ckpt.restore(state)
        np.testing.assert_allclose(np.asarray(restored["w"]), 7.0)

    # host_local_copy: the rank-gated validation/export path.  The replicated
    # branch reads the local replica; the cross-host sharded branch reshards
    # to replicated via an XLA collective — every host must reconstruct the
    # FULL global value.
    from jax.sharding import NamedSharding, PartitionSpec as P

    from speech_resynth_tpu.core.mesh import DATA_AXIS, host_local_copy

    full = np.arange(16, dtype=np.float32).reshape(8, 2)
    per = 8 // nproc
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(DATA_AXIS)), full[pid * per : (pid + 1) * per]
    )
    copies = host_local_copy({"rep": state["w"], "shard": garr})
    np.testing.assert_allclose(copies["rep"], 7.0)
    np.testing.assert_allclose(copies["shard"], full)

    out = {"pid": pid, "n_batches": n_batches, "means": means, "shard_sum": float(copies["shard"].sum())}
    (workdir / f"ok_{pid}.json").write_text(json.dumps(out))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
