"""tpu_unet — a TPU-native (JAX / Flax / pjit / Pallas) framework for industrial
surface-defect detection.

Capability-parity rebuild of the reference PyTorch stack (ukeSJTU/tiaozhanbei-unet):
three UNet-family models (UNet, SegmentationUNet, AnomalyUNet) over three workloads
(MVTec anomaly detection, Gear multi-class segmentation, KolektorSDD surface-defect
segmentation) — redesigned TPU-first:

- NHWC layouts and bf16 compute feeding the MXU (``tpu_unet.core.precision``)
- fused XLA/Pallas compute path (``tpu_unet.ops``)
- on-device metrics (confusion matrices, AUROC/AUPRC sweeps) (``tpu_unet.metrics``)
- a host-decode / device-transform input pipeline (``tpu_unet.data``)
- data-parallel training over a ``jax.sharding.Mesh`` (``tpu_unet.parallel``)
- Orbax checkpointing with the reference's best/periodic semantics (``tpu_unet.train``)
- production serving engines with int8 post-training quantization
  (``tpu_unet.serve``: AnomalyScorer, SegmentationPredictor; ``tpu_unet.ops.quantize``)
"""

__version__ = "0.1.0"
