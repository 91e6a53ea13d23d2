"""Differentiation-correct collectives for shard_map training.

shard_map with `check_vma=False` (required while Pallas outputs carry no
varying-mesh-axes metadata) does NOT track replication, so the automatic
transposes of collectives over-count: the transpose of `psum` w.r.t. an
already-replicated cotangent is IDENTITY (each shard's partial receives
the true cotangent once), but unchecked shard_map transposes psum to
psum — measured on the dp×tp train step as gradients uniformly ntp×
too large plus un-reduced dp variation (tests/parallel/test_optim.py
pins the corrected values leaf-by-leaf against a single-device oracle).

These wrappers make the backward correct BY CONSTRUCTION under one
convention: every cotangent flowing through the backward pass is the
COMPLETE derivative of the (dp-local) loss. Each wrapper's custom VJP
states the true dual:

- `row_parallel_psum`: z = Σ_tp partial. ∂z/∂partial_local = I, so the
  complete cotangent of z passes through unchanged.
- `gather_cols`: out = concat_tp(slices). The complete cotangent of the
  gathered value restricts to each shard's own block.
- `mark_replicated`: identity forward, placed where a tp-REPLICATED
  activation is consumed by a tp-SHARDED weight (a column-parallel
  layer): each shard's backward produces only its PARTIAL contribution
  (its slice of the contraction), so the dual psums the partials —
  restoring the complete-cotangent invariant for the producer.

Gradients of dp-replicated params then only need one explicit
`pmean` over dp after `value_and_grad` on the dp-LOCAL loss (done by
the callers), because dp never appears inside the differentiated math.
"""

from __future__ import annotations

from functools import partial

import jax


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def row_parallel_psum(x, axis):
    """psum over `axis` whose result is replicated; backward = identity."""
    return jax.lax.psum(x, axis)


def _rpp_fwd(x, axis):
    return jax.lax.psum(x, axis), None


def _rpp_bwd(axis, _, ct):
    return (ct,)


row_parallel_psum.defvjp(_rpp_fwd, _rpp_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def gather_cols(x, axis, dim):
    """Tiled all_gather over `axis` along `dim`; backward = own block."""
    return jax.lax.all_gather(x, axis, axis=dim, tiled=True)


def _gc_fwd(x, axis, dim):
    return jax.lax.all_gather(x, axis, axis=dim, tiled=True), x.shape[dim]


def _gc_bwd(axis, dim, n, ct):
    i = jax.lax.axis_index(axis)
    return (jax.lax.dynamic_slice_in_dim(ct, i * n, n, axis=dim),)


gather_cols.defvjp(_gc_fwd, _gc_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def mark_replicated(x, axis):
    """Identity on a value replicated over `axis`; backward psums the
    per-shard PARTIAL cotangents into the complete one."""
    return x


def _mr_fwd(x, axis):
    return x, None


def _mr_bwd(axis, _, ct):
    return (jax.lax.psum(ct, axis),)


mark_replicated.defvjp(_mr_fwd, _mr_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def pmax_stopgrad(x, axis):
    """pmax over `axis` with a ZERO gradient (jax has no pmax
    differentiation rule, and stop_gradient alone still traces the
    primitive under JVP). For quantities that are exact invariances of
    the loss — e.g. the max shift in a stable log-softmax — the zero
    cotangent is exact, not an approximation."""
    return jax.lax.pmax(x, axis)


def _pmax_fwd(x, axis):
    return jax.lax.pmax(x, axis), None


def _pmax_bwd(axis, _, ct):
    import jax.numpy as jnp

    # pmax is shape-preserving: the zero cotangent matches ct's aval
    return (jnp.zeros_like(ct),)


pmax_stopgrad.defvjp(_pmax_fwd, _pmax_bwd)
