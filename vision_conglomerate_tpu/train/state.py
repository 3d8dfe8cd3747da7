"""Train state pytree: params + BN stats + optimizer state + step counter."""
from typing import Any

import flax.struct


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: int = 0
