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
All five production parallelism modes are implemented and differential-
tested against unsharded oracles:

  dp  data parallel        runner.py   (batch sharding, psum grads)
  tp  tensor parallel      train.py / transformer.py (Megatron MHA/MLP)
  pp  pipeline parallel    pipeline.py (GPipe microbatches over ppermute)
  sp  sequence parallel    sequence.py (ring attention, rotating KV)
  ep  expert parallel      moe.py      (switch MoE, GShard all_to_all)
"""

from .mesh import make_mesh, task_grid_mesh
from .moe import make_moe_forward, moe_init, moe_reference
from .pipeline import (make_pipeline_forward, make_pipeline_train_step,
                       pipeline_init, pipeline_param_specs,
                       pipeline_reference)
from .runner import data_parallel_run, shard_run, task_grid_run
from .sequence import make_ring_attention, ring_attention_reference
from .gpt_train import make_gpt_train_step
from .optim import make_optim_train_step, opt_state_shardings
from .train import make_train_step, mlp_init
from .transformer import make_mha_forward, mha_param_specs, mha_params

__all__ = ["make_mesh", "task_grid_mesh", "data_parallel_run", "shard_run",
           "task_grid_run",
           "make_train_step", "mlp_init",
           "make_optim_train_step", "opt_state_shardings",
           "make_gpt_train_step",
           "make_mha_forward", "mha_params", "mha_param_specs",
           "make_pipeline_forward", "make_pipeline_train_step",
           "pipeline_init", "pipeline_param_specs", "pipeline_reference",
           "make_moe_forward", "moe_init", "moe_reference",
           "make_ring_attention", "ring_attention_reference"]
