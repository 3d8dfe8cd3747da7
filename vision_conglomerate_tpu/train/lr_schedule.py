"""LR schedulers mirroring torch.optim.lr_scheduler semantics.

The reference resolves schedulers by name from torch
(train_det.py:55-59, config lr_scheduler_config.name:
CosineAnnealingWarmRestarts). Here the same names resolve to host-side
scheduler objects that produce a scalar lr per epoch — the lr is fed into
the jitted train step as an argument, so schedule changes never retrace.

torch CosineAnnealingWarmRestarts semantics reproduced: T_cur increments on
each .step(); on reaching T_i it wraps and T_i *= T_mult;
lr = eta_min + (base - eta_min) * (1 + cos(pi * T_cur / T_i)) / 2.
"""
import math
from typing import Any, Dict, Optional


class LRScheduler:
    def __init__(self, base_lr: float):
        self.base_lr = base_lr

    def get_lr(self) -> float:
        raise NotImplementedError

    def step(self):
        raise NotImplementedError

    def state_dict(self) -> Dict[str, Any]:
        return dict(self.__dict__)

    def load_state_dict(self, state: Dict[str, Any]):
        self.__dict__.update(state)


class CosineAnnealingWarmRestarts(LRScheduler):
    def __init__(self, base_lr: float, T_0: int, T_mult: int = 1, eta_min: float = 0.0):
        super().__init__(base_lr)
        assert T_0 > 0
        self.T_0 = T_0
        self.T_mult = T_mult
        self.eta_min = eta_min
        self.T_cur = 0
        self.T_i = T_0

    def get_lr(self) -> float:
        return self.eta_min + (self.base_lr - self.eta_min) * (
            1 + math.cos(math.pi * self.T_cur / self.T_i)) / 2

    def step(self):
        self.T_cur += 1
        if self.T_cur >= self.T_i:
            self.T_cur -= self.T_i
            self.T_i *= self.T_mult


class ConstantLR(LRScheduler):
    def get_lr(self) -> float:
        return self.base_lr

    def step(self):
        pass


class StepLR(LRScheduler):
    def __init__(self, base_lr: float, step_size: int, gamma: float = 0.1):
        super().__init__(base_lr)
        self.step_size = step_size
        self.gamma = gamma
        self.epoch = 0

    def get_lr(self) -> float:
        return self.base_lr * self.gamma ** (self.epoch // self.step_size)

    def step(self):
        self.epoch += 1


class CosineAnnealingLR(LRScheduler):
    def __init__(self, base_lr: float, T_max: int, eta_min: float = 0.0):
        super().__init__(base_lr)
        self.T_max = T_max
        self.eta_min = eta_min
        self.epoch = 0

    def get_lr(self) -> float:
        return self.eta_min + (self.base_lr - self.eta_min) * (
            1 + math.cos(math.pi * self.epoch / self.T_max)) / 2

    def step(self):
        self.epoch += 1


class ExponentialLR(LRScheduler):
    """torch ExponentialLR: lr = base_lr * gamma**epoch."""

    def __init__(self, base_lr: float, gamma: float):
        super().__init__(base_lr)
        self.gamma = gamma
        self.epoch = 0

    def get_lr(self) -> float:
        return self.base_lr * self.gamma ** self.epoch

    def step(self):
        self.epoch += 1


class MultiStepLR(LRScheduler):
    """torch MultiStepLR: lr = base_lr * gamma**(#milestones <= epoch)."""

    def __init__(self, base_lr: float, milestones, gamma: float = 0.1):
        super().__init__(base_lr)
        self.milestones = sorted(int(m) for m in milestones)
        self.gamma = gamma
        self.epoch = 0

    def get_lr(self) -> float:
        k = sum(1 for m in self.milestones if m <= self.epoch)
        return self.base_lr * self.gamma ** k

    def step(self):
        self.epoch += 1


class LinearLR(LRScheduler):
    """torch LinearLR: factor interpolates start_factor -> end_factor over
    total_iters steps, then stays at end_factor."""

    def __init__(self, base_lr: float, start_factor: float = 1.0 / 3,
                 end_factor: float = 1.0, total_iters: int = 5):
        super().__init__(base_lr)
        self.start_factor = start_factor
        self.end_factor = end_factor
        self.total_iters = total_iters
        self.epoch = 0

    def get_lr(self) -> float:
        t = min(self.epoch, self.total_iters) / self.total_iters
        return self.base_lr * (
            self.start_factor + (self.end_factor - self.start_factor) * t)

    def step(self):
        self.epoch += 1


SCHEDULERS = {
    "CosineAnnealingWarmRestarts": CosineAnnealingWarmRestarts,
    "CosineAnnealingLR": CosineAnnealingLR,
    "StepLR": StepLR,
    "ConstantLR": ConstantLR,
    "ExponentialLR": ExponentialLR,
    "MultiStepLR": MultiStepLR,
    "LinearLR": LinearLR,
}


def make_lr_scheduler(config: Optional[Dict[str, Any]], base_lr: float) -> Optional[LRScheduler]:
    """Resolve by the reference's config convention (name + kwargs)."""
    if not config:
        return None
    cfg = dict(config)
    name = cfg.pop("name")
    if name not in SCHEDULERS:
        raise KeyError(f"Unknown lr scheduler {name!r}; available: {sorted(SCHEDULERS)}")
    return SCHEDULERS[name](base_lr, **cfg)
