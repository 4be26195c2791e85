"""Unified checkpoint manager (Orbax).

One implementation replacing the reference's three torch flavors
(SURVEY.md §5): HiFi-GAN's save_pretrained + "do" dict
(hifigan/train.py:51-91,199-217), CFM's save-but-never-resume
(flow_matching/train.py:206-220, last_epoch hardcoded 0 at train.py:167 —
our CFM trainer *does* resume), and SpeechLM's full model/optim/sched/
scaler/epoch/step resume (speechlm/train.py:139-153).

Multi-host-safe: Orbax coordinates saves across processes; only one manager
instance per directory.  Async saves overlap checkpoint IO with the next
training steps.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str | Path, max_to_keep: int = 3, async_save: bool = True):
        self._dir = Path(directory).absolute()
        self._dir.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, enable_async_checkpointing=async_save)
        self._mgr = ocp.CheckpointManager(str(self._dir), options=options)

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        """Save a pytree (TrainState or dict of states) at ``step``."""
        return self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        """Restore into the shape/sharding of ``state_template``."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self._dir}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def has_checkpoint(self) -> bool:
        return self.latest_step() is not None

    def wait(self) -> None:
        """Block until async saves finish (call before exit)."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.wait()
        self.close()
