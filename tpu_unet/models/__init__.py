from tpu_unet.models.blocks import DoubleConv, Down, Up, OutConv
from tpu_unet.models.unet import UNet, SegmentationUNet, AnomalyUNet, build_model
from tpu_unet.models.unetpp import UNetPlusPlus
from tpu_unet.models.attention import AttentionGate, AttentionUNet

__all__ = [
    "DoubleConv",
    "Down",
    "Up",
    "OutConv",
    "UNet",
    "SegmentationUNet",
    "AnomalyUNet",
    "build_model",
    "UNetPlusPlus",
    "AttentionGate",
    "AttentionUNet",
]
