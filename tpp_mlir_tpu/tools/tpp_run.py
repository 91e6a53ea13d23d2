"""tpp-run: compile, execute, time, and print IR programs.

The reference tpp-run (tools/tpp-run/tpp-run.cpp) wraps a kernel in a
generated main: deterministic arg init (TensorInit), a perf.bench timing
loop, result printing, then JIT + run. Equivalent flags:

  tpp-run model.ir -n 100                 # benchmark, report mean + GFLOPS
  tpp-run model.ir --print                # print result tensors
  tpp-run model.ir --linalg-to-loops      # reference semantics, no lowering
  tpp-run model.ir -seed 7 -init-type rand
  echo ... | tpp-gen --bias --relu | tpp-run - -n 10
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..ir import Function, Module, parse_module
from ..ir.ops import TppBuilder
from ..passes import PassManager
from ..runtime import bench, tensor_init
from ..runtime import compile as tpp_compile
from ..runtime.perf import model_flops
from ..xsmm.kernels import interpret_default


def wrap_bench_main(module: Module, func_name: str, n: int) -> str | None:
    """Synthesize the timing wrapper IN IR: a main that runs the kernel
    through a perf.bench op (the MLIRBench createTimerLoop role,
    reference MLIRBench.cpp:265-295 — the timed loop is carried by the
    program, not only by the harness). Returns the wrapper name, or None
    when the entry's results cannot chain into its leading args."""
    entry = module[func_name]
    rets = [v.type for v in entry.returns]
    args_t = [a.type for a in entry.args]
    if not rets or rets != args_t[:len(rets)]:
        return None
    name = f"{func_name}_bench_main"
    if name in module.funcs:
        return name
    wrapper = module.add(Function(name, args_t,
                                  [a.name for a in entry.args]))
    b = TppBuilder(wrapper)
    results = b.perf_bench(func_name, list(wrapper.args), n,
                           num_chained=len(rets))
    wrapper.returns = list(results)
    module.verify()
    return name


def print_tensor(arr, file=None):
    """Row-wise tensor printing in the MLIRBench style
    (reference MLIRBench.cpp printShapedType:313-372: '( v, v, ... )' rows;
    bf16 extended to f32 for printing, :302-311)."""
    file = file or sys.stdout
    a = np.asarray(arr, dtype=np.float32)
    if a.ndim == 0:
        print(f"{float(a):g}", file=file)
        return
    rows = a.reshape(-1, a.shape[-1])
    for row in rows:
        print("( " + ", ".join(f"{v:g}" for v in row) + " )", file=file)


def init_args(module: Module, func_name: str, init_type: str, seed: int):
    import numpy as np

    import jax.numpy as jnp

    func = module[func_name]
    out = []
    for i, a in enumerate(func.args):
        if a.type.dtype in ("i32", "i8"):
            # integer args are token ids: uniform in the id range of the
            # gather table they feed (deterministic per seed, like every
            # tensor_init family)
            bound = 256
            for op in func.ops:
                if op.opname == "tl.gather" and op.operands[1] is a:
                    bound = op.operands[0].type.shape[0]
                    break
            rng = np.random.default_rng(seed + i)
            arr = rng.integers(0, bound, size=a.type.shape,
                               dtype=np.int32)
        else:
            arr = tensor_init(init_type, a.type.shape, a.type.dtype,
                              seed=seed + i)
        out.append(jnp.asarray(arr))
    return out


def run_module(module: Module, func_name: str = "entry", n: int = 0,
               init_type: str = "normal", seed: int = 0,
               pipeline: str = "default-tpp-passes",
               linalg_to_loops: bool = False, print_result: bool = False,
               print_mlir: str = "", task_grid: str = "",
               out_stream=None) -> dict:
    out_stream = out_stream or sys.stdout
    stages = {"early": None, "late": None}
    dump_kernels = print_mlir in ("kernel", "llvm")
    if dump_kernels:
        # rebuild kernels with artifact capture (cached entries were built
        # without the capture wrapper)
        from ..xsmm.cache import global_cache
        global_cache().clear()
        global_cache().capture_artifacts = True
    if print_mlir == "early":
        print(module, file=sys.stderr)
    if not linalg_to_loops:
        PassManager([pipeline]).run(module)
    wrapper = (wrap_bench_main(module, func_name, n)
               if n > 0 and not task_grid else None)
    if print_mlir in ("late", "mid"):
        print(module, file=sys.stderr)

    args = init_args(module, func_name, init_type, seed)
    fn = tpp_compile(module, func_name,
                     interpret_kernels=interpret_default() or None)
    if task_grid:
        # the reference's --def-parallel / --parallel-task-grid across
        # devices: shard the leading (batch) dim of arg 0 over a mesh
        # (SURVEY.md 2.12); e.g. --task-grid 2x4 -> dp=2, tp=4 mesh with
        # batch sharded over dp
        from ..parallel import task_grid_run

        inner = tpp_compile(module, func_name, jit=False,
                            interpret_kernels=interpret_default() or None)
        fn = task_grid_run(inner, task_grid, len(args))
    result = {"module": module}
    if n > 0:
        if wrapper is not None:
            # timing semantics live in IR: execute the perf.bench wrapper
            # (in-kernel timed region when the body qualifies, else a
            # timed scan chain — runtime/executor.py _eval_bench)
            bfn = tpp_compile(module, wrapper, jit=False,
                              interpret_kernels=interpret_default() or None)
            outs = bfn(*args)
            mean = float(outs[0])
            result["mean_seconds"] = mean
            flops = model_flops(module)
            result["gflops"] = flops / mean / 1e9 if flops else None
        else:
            res = bench(fn, args, iters=n, flops=model_flops(module))
            result["mean_seconds"] = res.mean_seconds
            result["gflops"] = res.gflops
            mean = res.mean_seconds
        if result["gflops"] is not None:
            print(f"{result['gflops']:.3f} gflops ({mean * 1e3:.6f} ms "
                  f"mean of {n})", file=out_stream)
        else:
            print(f"{mean * 1e3:.6f} ms (mean of {n})",
                  file=out_stream)
    out = fn(*args)
    outs = out if isinstance(out, tuple) else (out,)
    result["outputs"] = outs
    if dump_kernels:
        from ..xsmm.cache import global_cache
        cache = global_cache()
        for key, art in cache.artifacts.items():
            print(f"// ===== kernel {key!r} =====", file=sys.stderr)
            for stage in ("jaxpr", "stablehlo", "error"):
                if stage in art:
                    print(f"// --- {stage} ---", file=sys.stderr)
                    print(art[stage], file=sys.stderr)
        cache.capture_artifacts = False
        result["kernel_artifacts"] = dict(cache.artifacts)
    if print_result:
        for o in outs:
            print_tensor(o, file=out_stream)
    return result


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tpp-run", description=__doc__)
    p.add_argument("input", nargs="?", default="-")
    p.add_argument("-e", "--entry", default="entry")
    p.add_argument("-n", type=int, default=0, help="benchmark iterations")
    p.add_argument("--print", dest="print_result", action="store_true")
    p.add_argument("-seed", "--seed", type=int, default=0)
    p.add_argument("-init-type", "--init-type", default="normal")
    p.add_argument("--linalg-to-loops", action="store_true",
                   help="skip lowering; execute reference semantics")
    p.add_argument("--pipeline", default="default-tpp-passes")
    p.add_argument("-print-mlir", "--print-mlir",
                   choices=["", "early", "mid", "late", "kernel", "llvm"],
                   default="",
                   help="'kernel' (alias 'llvm', reference -print-mlir=llvm) "
                        "dumps each dispatched kernel's jaxpr + StableHLO "
                        "(incl. the Mosaic custom-call payload) to stderr")
    p.add_argument("-v", "--verbose", action="count", default=0,
                   help="-v prints kernel-cache stats after the run")
    p.add_argument("-splat-to-random", "--splat-to-random",
                   action="store_true",
                   help="replace splat ('const'/'zero'-init, non-accumulator) "
                        "constants with random init (reference tpp-run "
                        "-splat-to-random, MLIRBench.cpp:111-164)")
    p.add_argument("--precision", choices=["default", "highest"],
                   default="default",
                   help="'highest' keeps true-f32 MXU passes (bf16x3-class "
                        "rate); 'default' matches XLA default precision")
    p.add_argument("--register-blocking", "-registerBlocking", default="",
                   help="force m,n,k kernel block sizes (reference "
                        "--registerBlocking)")
    p.add_argument("--task-grid", "-parallel-task-grid", default="",
                   help="shard the batch over a device mesh, e.g. '2x4' "
                        "(the reference's --parallel-task-grid analogue, "
                        "SURVEY.md 2.12)")
    p.add_argument("--profile", default="",
                   help="write a jax profiler trace to this directory "
                        "(the reference's perf-dialect timing + IR staging "
                        "equivalents live in -n/-print-mlir; this adds "
                        "device-level tracing, SURVEY.md section 5)")
    p.add_argument("--sanitize", choices=["", "nan"], default="",
                   help="'nan' enables jax_debug_nans — the runtime "
                        "numerical-safety net (role of the reference's "
                        "USE_SANITIZER build + check dialect)")
    args = p.parse_args(argv)

    if args.sanitize == "nan":
        import jax
        jax.config.update("jax_debug_nans", True)

    text = sys.stdin.read() if args.input == "-" else open(args.input).read()
    module = parse_module(text)
    module.verify()
    if args.register_blocking:
        module.attrs["register_blocking"] = tuple(
            int(x) for x in args.register_blocking.split(","))
    if args.precision != "default":
        module.attrs["precision"] = args.precision
    if args.splat_to_random:
        CONTRACTIONS = ("tl.matmul", "tl.brgemm", "tl.vnni_brgemm",
                        "tl.batch_matmul", "tl.blocked_matmul",
                        "tl.conv2d_nhwc_hwcf", "tl.conv2d")

        def only_accumulator(op):
            # C operand (index 2) of a contraction: its ZERO value is
            # semantics (beta_0), not a splat shortcut
            return op.results and op.result.uses and all(
                u.opname in CONTRACTIONS and i == 2
                for u, i in op.result.uses)

        for f in module.funcs.values():
            for op in f.ops:
                if op.opname != "tl.constant" or \
                        op.attrs.get("init") not in ("const", "zero"):
                    continue
                if op.attrs.get("init") == "zero" and only_accumulator(op):
                    continue   # accumulator zeros keep their semantics
                # weight/input splats become random so benchmarks don't
                # measure splat-shortcut arithmetic (MLIRBench.cpp:111-164)
                op.attrs["init"] = "rand"
                op.attrs.setdefault("seed", args.seed)

    def go():
        run_module(module, args.entry, n=args.n, init_type=args.init_type,
                   seed=args.seed, pipeline=args.pipeline,
                   linalg_to_loops=args.linalg_to_loops,
                   print_result=args.print_result,
                   print_mlir=args.print_mlir, task_grid=args.task_grid)

    if args.profile:
        import jax
        with jax.profiler.trace(args.profile):
            go()
    else:
        go()
    if args.verbose:
        from ..xsmm import global_cache
        st = global_cache().stats
        print(f"kernel cache: {len(global_cache())} kernels, "
              f"{st.hits} hits, {st.misses} misses", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
