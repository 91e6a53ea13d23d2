// Pack micro-kernel (reference benchmarks/mlir/fp32-pack-gemm-operand-a-512x1024.mlir:1-13)
// BENCH_TOTAL_FLOPS: 2097152
func @entry(%x: tensor<512x1024xf32>) {
  %0 = tl.pack %x {inner_dims = [0, 1], inner_tiles = [32, 32]} : tensor<16x32x32x32xf32>
  return %0 : tensor<16x32x32x32xf32>
}
