"""Running averages (host-side bookkeeping between device fetches)."""

from __future__ import annotations


class AverageMeter:
    """Computes and stores the average and current value
    (/root/reference/src/utils.py:285-300)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


def print_metrics(metrics: dict, prefix: str = "") -> None:
    """Formatted metric printout (/root/reference/src/utils.py:303-312)."""
    print(f"\n{prefix} Metrics:")
    print("-" * 40)
    for key, value in metrics.items():
        if isinstance(value, float):
            print(f"{key.capitalize()}: {value:.4f}")
        else:
            print(f"{key.capitalize()}: {value}")
    print("-" * 40)
