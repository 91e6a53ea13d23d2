#!/usr/bin/env python
"""r5 probe: where do the wres kernel's unaccounted ~4.4MB of scoped
VMEM go?

Evidence: the epilogue-free bf16 wres GEMM at (m=4096, k=3072, n=768,
bm=512) OOM'd scoped vmem at 16.43M while the builder's need() estimate
(wbuf k*n + 2x a-block + 2x out-block) accounts 12.0M. The gap ~= the
weight matrix AGAIN (4.5M) — hypothesis: the `pl.ANY` weight operand is
being materialized in VMEM by the compiler on top of the manual-DMA
scratch copy. Alternative: the full (bm, k) A-block read is spilled
live across the chunk-dot loop (3.0M) plus f32 chunk temps.

This probe compiles a standalone kernel mimicking the wres structure at
the exact OOM shape, once with the weight ref in pl.ANY and once pinned
to pltpu.HBM. Outcomes:
  ANY OOMs, HBM fits  -> pin wres weights to HBM (one-line builder fix)
  both OOM            -> the gap is A-block/temp pressure; need() gets
                         a measured slack term instead
  both fit            -> the real builder differs somewhere else; dig.
"""

import functools
import json
import sys


def build(mem: str, m: int, k: int, n: int, bm: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CH = 4
    nc = n // CH

    def kernel(a_ref, w_ref, o_ref, wbuf, sems):
        i = pl.program_id(0)

        def chunk_copy(c):
            return pltpu.make_async_copy(
                w_ref.at[:, pl.ds(c * nc, nc)],
                wbuf.at[:, pl.ds(c * nc, nc)],
                sems.at[c])

        @pl.when(i == 0)
        def _start_all():
            for c in range(CH):
                chunk_copy(c).start()

        a = a_ref[:]
        for c in range(CH):
            @pl.when(i == 0)
            def _wait(c=c):
                chunk_copy(c).wait()
            res = jnp.dot(a, wbuf[:, c * nc:(c + 1) * nc],
                          preferred_element_type=jnp.float32)
            o_ref[:, c * nc:(c + 1) * nc] = res.astype(jnp.bfloat16)

    wspace = pl.ANY if mem == "any" else pltpu.HBM
    return pl.pallas_call(
        kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=wspace),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((k, n), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((CH,))],
    )


def main() -> int:
    import jax.numpy as jnp
    import numpy as np

    M, K, N, BM = 4096, 3072, 768, 512
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.05, jnp.bfloat16)
    ref = np.asarray(a, np.float32) @ np.asarray(w, np.float32)
    rows = []
    for mem in ("any", "hbm"):
        try:
            fn = build(mem, M, K, N, BM)
            out = np.asarray(fn(a, w), np.float32)
            err = float(np.abs(out - ref).max() / np.abs(ref).max())
            rows.append({"mem": mem, "ok": True, "err": err})
        except Exception as e:
            msg = str(e)
            rows.append({"mem": mem, "ok": False,
                         "error": msg[:300]})
        print(json.dumps(rows[-1]), flush=True)
    json.dump(rows, open("benchmarks/results/wres_vmem_probe_r5.json",
                         "w"), indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
