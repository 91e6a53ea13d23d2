"""Sharded execution of compiled programs.

`data_parallel_run` is the multi-chip face of the reference's
`--def-parallel` flag: the same compiled kernel function, with the leading
(batch) dimension of designated args sharded over the mesh's 'dp' axis.
XLA inserts any collectives; with a pure data-parallel MLP there are none in
the forward path, so scaling is linear over ICI.
"""

from __future__ import annotations

from typing import Callable, Sequence


def shard_run(fn: Callable, mesh, in_specs, out_specs=None):
    """jit `fn` with explicit shardings over `mesh`.

    in_specs/out_specs are PartitionSpecs (or None for replicated)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def sharding(spec):
        return NamedSharding(mesh, spec if spec is not None else P())

    in_shardings = tuple(sharding(s) for s in in_specs)
    kw = {}
    if out_specs is not None:
        kw["out_shardings"] = (
            tuple(sharding(s) for s in out_specs)
            if isinstance(out_specs, (tuple, list)) else sharding(out_specs))
    return jax.jit(fn, in_shardings=in_shardings, **kw)


def data_parallel_run(fn: Callable, mesh, batch_arg_indices: Sequence[int],
                      num_args: int, axis: str = "dp"):
    """Shard the leading dim of the given args over `axis`; replicate rest."""
    from jax.sharding import PartitionSpec as P

    specs = [P(axis) if i in set(batch_arg_indices) else P()
             for i in range(num_args)]
    return shard_run(fn, mesh, specs)


def task_grid_run(inner, task_grid, num_args, batch_arg_indices=(0,)):
    """Wire a compiled function over a --task-grid mesh: "DPxTP" (or
    "DP,TP") shards the leading batch dim over dp, with tp available to
    tensor-parallel programs. ONE definition shared by tpp-run and the
    bench driver so grid parsing / mesh rules cannot drift."""
    from .mesh import make_mesh

    dims = [int(x) for x in str(task_grid).replace("x", ",").split(",")]
    shape = {"dp": dims[0]}
    if len(dims) > 1 and dims[1] > 1:
        shape["tp"] = dims[1]
    mesh = make_mesh(shape)
    return data_parallel_run(inner, mesh,
                             batch_arg_indices=list(batch_arg_indices),
                             num_args=num_args)
