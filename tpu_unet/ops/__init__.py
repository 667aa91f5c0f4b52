from tpu_unet.ops.resize import upsample2x_bilinear_align_corners, resize_bilinear_align_corners

__all__ = ["upsample2x_bilinear_align_corners", "resize_bilinear_align_corners"]
