from tpu_unet.losses.anomaly import binary_focal_loss, combined_anomaly_loss, mse_loss
from tpu_unet.losses.segmentation import (
    combined_segmentation_loss,
    cross_entropy_loss,
    dice_loss,
    focal_loss,
)

__all__ = [
    "binary_focal_loss",
    "combined_anomaly_loss",
    "mse_loss",
    "combined_segmentation_loss",
    "cross_entropy_loss",
    "dice_loss",
    "focal_loss",
]
