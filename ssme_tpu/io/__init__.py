from ssme_tpu.io.csv import read_data, read_params_csv, ParamSampler
from ssme_tpu.io.recording import (
    SampleWriter,
    MessageWriter,
    timestamped_path,
)
from ssme_tpu.io.checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "read_data", "read_params_csv", "ParamSampler",
    "SampleWriter", "MessageWriter", "timestamped_path",
    "save_checkpoint", "load_checkpoint",
]
