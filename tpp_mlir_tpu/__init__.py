"""tpp-mlir-tpu: a TPU-native tensor-processing-primitive compiler.

Re-design of libxsmm/tpp-mlir's capabilities (see /root/repo/SURVEY.md) for
TPU: a tensor IR with tile/fuse/pack transforms, BRGEMM formation, and an
XSMM-equivalent kernel layer whose JIT backend is Pallas/Mosaic driving the
MXU (contractions) and VPU (fused eltwise epilogues).

Layer map (top to bottom, mirroring SURVEY.md section 1):
  tools/      tpp-gen / tpp-opt / tpp-run / fpcmp CLI equivalents
  models/     parameterized MLP / conv / MHA model builders
  ir/         tensor IR (linalg-subset + xsmm/perf/check dialects)
  passes/     pack, tile-and-fuse, BRGEMM formation, xsmm lowering
  xsmm/       dispatch/invoke kernel cache backed by Pallas kernels
  runtime/    executor (IR -> jitted JAX fn), perf timing, check asserts,
              native C++ helpers (fpcmp core, tensor init, timers)
  parallel/   mesh / shard_map task-grid runner (the OpenMP-grid analogue)
  ops/        public functional op API
"""

__version__ = "0.1.0"
