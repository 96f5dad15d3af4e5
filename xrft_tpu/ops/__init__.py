from . import fft_core, matmul_fft  # noqa: F401
