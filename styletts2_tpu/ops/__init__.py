from styletts2_tpu.ops import stft  # noqa: F401
