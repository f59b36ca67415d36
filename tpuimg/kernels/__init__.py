# Pallas (Mosaic) kernels — the TPU-native analogs of the reference's
# optimized CUDA kernels. Each op in tpuimg.ops accepts impl="pallas" to
# dispatch here.
