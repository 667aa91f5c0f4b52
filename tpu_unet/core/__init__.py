from tpu_unet.core.precision import Policy, DEFAULT_POLICY, BF16_POLICY, get_policy

__all__ = ["Policy", "DEFAULT_POLICY", "BF16_POLICY", "get_policy"]
