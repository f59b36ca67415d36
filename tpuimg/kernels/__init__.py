# Pallas (Mosaic) kernels — the TPU-native analogs of the reference's
# optimized CUDA kernels. Each op in tpuimg.ops accepts impl="pallas" to
# dispatch here.

import jax


def interpret_mode() -> bool:
    """Pallas kernels compile via Mosaic on TPU; on the CPU backend (tests,
    virtual meshes) they run in interpreter mode."""
    return jax.default_backend() == "cpu"
