"""Multi-device execution: mesh task grids, sharded runners, training step.

The reference's entire parallelism stack is an OpenMP task grid over tiles
(SURVEY.md 2.12: scf.parallel + `parallel-task-grid`, default 2x8). The
TPU-native equivalents here:

  * within one chip, the Pallas grid plays the task-grid role (kernels.py);
  * across chips, a jax.sharding.Mesh + shard_map/pjit distributes the same
    kernels with XLA collectives over ICI — the surface the reference
    exposes as `--def-parallel`/`--parallel-task-grid` maps to
    `mesh_shape=(dp, tp)` here.

The reference has no cross-chip distribution at all (no NCCL/MPI), so
everything beyond `data_parallel_run` is capability headroom, not parity.
"""

from .mesh import make_mesh, task_grid_mesh
from .runner import data_parallel_run, shard_run
from .train import TrainState, make_train_step, mlp_init
from .transformer import make_mha_forward, mha_param_specs, mha_params

__all__ = ["make_mesh", "task_grid_mesh", "data_parallel_run", "shard_run",
           "TrainState", "make_train_step", "mlp_init",
           "make_mha_forward", "mha_params", "mha_param_specs"]
