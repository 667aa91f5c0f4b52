from tpu_unet.utils.io import (append_jsonl, convert_numpy, create_output_dirs,
                               save_json)
from tpu_unet.utils.logging import setup_logging
from tpu_unet.utils.meters import AverageMeter, print_metrics

__all__ = [
    "append_jsonl",
    "convert_numpy",
    "create_output_dirs",
    "save_json",
    "setup_logging",
    "AverageMeter",
    "print_metrics",
]
