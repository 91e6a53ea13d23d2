// Unpack micro-kernel (reference fp32-unpack-gemm-operand-a-512x512.mlir)
// BENCH_TOTAL_FLOPS: 1048576
func @entry(%x: tensor<16x16x32x32xf32>) {
  %0 = tl.unpack %x {inner_dims = [0, 1], inner_tiles = [32, 32]} : tensor<512x512xf32>
  return %0 : tensor<512x512xf32>
}
