"""Device mesh construction."""

from __future__ import annotations

import numpy as np


def make_mesh(shape: dict[str, int] | None = None, devices=None):
    """Build a Mesh from {axis: size}. Default: all devices on one 'dp' axis."""
    import jax
    from jax.sharding import Mesh

    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = {"dp": len(devices)}
    sizes = tuple(shape.values())
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(f"mesh {shape} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(arr, tuple(shape.keys()))


def task_grid_mesh(grid=(2, 8), devices=None):
    """The reference's `parallel-task-grid` (default 2x8,
    DefaultPipeline.cpp:50-54) reinterpreted as a (dp, tp) device mesh."""
    return make_mesh({"dp": grid[0], "tp": grid[1]}, devices)
