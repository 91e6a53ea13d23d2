"""Checkpoint/restore for training state (orbax-backed).

The reference has no checkpointing at all (single-shot kernel compiler,
SURVEY.md section 5 'Checkpoint / resume: Absent'); since this framework
also ships a sharded training step, a minimal save/restore rounds out the
training loop. Works with sharded arrays (orbax handles shardings)."""

from __future__ import annotations

import os
from typing import Any


def save_checkpoint(path: str, params: Any, step: int = 0) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, f"step_{step}"),
               {"params": params, "step": step}, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, like: Any, step: int = 0):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore(os.path.join(path, f"step_{step}"),
                        {"params": like, "step": step})
    return out["params"], out["step"]


def latest_step(path: str) -> int | None:
    steps = []
    if not os.path.isdir(path):
        return None
    for name in os.listdir(path):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                pass
    return max(steps) if steps else None
