from styletts2_tpu.data.dataset import FilePathDataset  # noqa: F401
from styletts2_tpu.data.sampler import DurationBinSampler  # noqa: F401
from styletts2_tpu.data.loader import build_dataloader  # noqa: F401
