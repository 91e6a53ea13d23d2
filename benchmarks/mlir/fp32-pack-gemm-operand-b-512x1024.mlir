// Pack micro-kernel, B operand with outer transpose (reference fp32-pack-gemm-operand-b-512x1024.mlir)
// BENCH_TOTAL_FLOPS: 2097152
func @entry(%x: tensor<512x1024xf32>) {
  %0 = tl.pack %x {inner_dims = [0, 1], inner_tiles = [32, 32], outer_perm = [1, 0]} : tensor<32x16x32x32xf32>
  return %0 : tensor<32x16x32x32xf32>
}
