"""Progress meters (reference: NANN_impls/nann/util.py:28-59)."""

from __future__ import annotations


class AverageMeter:
    """Tracks current value plus running (or exponential moving) average."""

    def __init__(self, name: str, fmt: str = ":f", moving_average: bool = False,
                 momentum: float = 0.99):
        self.name = name
        self.fmt = fmt
        self.moving_average = moving_average
        self.momentum = momentum
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1) -> None:
        val = float(val)
        self.val = val
        if self.moving_average:
            if self.count == 0:
                self.avg = val
            else:
                m = self.momentum
                self.avg = m * self.avg + (1.0 - m) * val
            self.count += n
        else:
            self.sum += val * n
            self.count += n
            self.avg = self.sum / max(self.count, 1)

    def __str__(self) -> str:
        fmtstr = "{name} {val" + self.fmt + "} ({avg" + self.fmt + "})"
        return fmtstr.format(name=self.name, val=self.val, avg=self.avg)
