"""Optimizer factory: reference config names -> optax transforms.

The reference resolves torch optimizers by name
(train_det.py:52-54: `getattr(torch.optim, name)(params, lr=..., **cfg)`),
scaling lr by device count. Here the same config block builds an optax
transform wrapped in inject_hyperparams so the learning rate is a runtime
hyperparameter (set per epoch by the host-side scheduler without retracing).

torch-parity notes:
- Adam weight_decay is L2-added-to-grad (not decoupled); modeled with
  add_decayed_weights *before* scale_by_adam;
- lr scaling by device count is the caller's job (trainer multiplies by
  mesh size, matching train_det.py:52).
"""
from typing import Any, Dict, Tuple

import optax


def _adam_like(learning_rate: float, b1: float, b2: float, eps: float,
               weight_decay: float) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    parts.append(optax.scale(-learning_rate))
    return optax.chain(*parts)


def make_optimizer(config: Dict[str, Any]) -> Tuple[optax.GradientTransformation, float]:
    """Build (tx, base_lr) from the reference optimizer_config block."""
    cfg = dict(config)
    name = cfg.pop("name", "Adam")
    lr = float(cfg.pop("lr", 1e-3))

    if name in ("Adam", "AdamW"):
        betas = cfg.pop("betas", (0.9, 0.999))
        eps = float(cfg.pop("eps", 1e-8))
        wd = float(cfg.pop("weight_decay", 0.0))
        if name == "AdamW":
            def opt(learning_rate):
                return optax.adamw(learning_rate, b1=betas[0], b2=betas[1],
                                   eps=eps, weight_decay=wd)
        else:
            def opt(learning_rate):
                return _adam_like(learning_rate, betas[0], betas[1], eps, wd)
    elif name == "SGD":
        momentum = float(cfg.pop("momentum", 0.0))
        wd = float(cfg.pop("weight_decay", 0.0))
        nesterov = bool(cfg.pop("nesterov", False))

        def opt(learning_rate):
            parts = []
            if wd:
                parts.append(optax.add_decayed_weights(wd))
            parts.append(optax.trace(decay=momentum, nesterov=nesterov))
            parts.append(optax.scale(-learning_rate))
            return optax.chain(*parts)
    elif name == "Adadelta":
        rho = float(cfg.pop("rho", 0.9))
        eps = float(cfg.pop("eps", 1e-6))
        wd = float(cfg.pop("weight_decay", 0.0))

        def opt(learning_rate):
            return optax.adadelta(learning_rate, rho=rho, eps=eps, weight_decay=wd)
    elif name == "RMSprop":
        decay = float(cfg.pop("alpha", 0.99))
        eps = float(cfg.pop("eps", 1e-8))
        momentum = float(cfg.pop("momentum", 0.0))

        def opt(learning_rate):
            return optax.rmsprop(learning_rate, decay=decay, eps=eps, momentum=momentum)
    else:
        raise KeyError(f"Unknown optimizer {name!r}")

    tx = optax.inject_hyperparams(opt)(learning_rate=lr)
    return tx, lr


def set_learning_rate(opt_state, lr):
    """Functionally set the injected learning_rate hyperparameter."""
    hyper = dict(opt_state.hyperparams)
    hyper["learning_rate"] = lr
    return opt_state._replace(hyperparams=hyper)
