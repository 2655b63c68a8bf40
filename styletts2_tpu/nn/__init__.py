from styletts2_tpu.nn import layers  # noqa: F401
