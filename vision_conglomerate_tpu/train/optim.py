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
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

ANCHOR_PARAM_NAMES = ("sm_anchors", "md_anchors", "lg_anchors")


def _freeze_anchors_transform() -> optax.GradientTransformation:
    """Zero every update to the `{sm,md,lg}_anchors` params.

    Mirrors the reference's `requires_grad=config["train_anchors"]`
    (/root/reference/modules/detection.py:36-38): with requires_grad=False
    torch's optimizer never touches the anchors — in particular weight decay
    can never shrink them. Here no gradient ever reaches the anchors either
    (the loss detaches them), but `add_decayed_weights` would still decay
    them every step with a nonzero weight_decay, silently corrupting the
    checkpointed anchors; this stateless final link kills any such update.
    """
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def zero_if_anchor(path, u):
            if any(getattr(k, "key", None) in ANCHOR_PARAM_NAMES for k in path):
                return jnp.zeros_like(u)
            return u

        return jax.tree_util.tree_map_with_path(zero_if_anchor, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def _adam_like(learning_rate: float, b1: float, b2: float, eps: float,
               weight_decay: float) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    parts.append(optax.scale(-learning_rate))
    return optax.chain(*parts)


class NAdamState(NamedTuple):
    """Module-level (picklable into checkpoint manifests) NAdam state."""

    count: Any
    mu_product: Any
    m: Any
    v: Any


def _scale_by_torch_nadam(b1: float, b2: float, eps: float,
                          momentum_decay: float) -> optax.GradientTransformation:
    """torch.optim.NAdam's exact update (Dozat Nesterov-Adam with torch's
    mu_t = b1*(1 - 0.5*0.96^(t*momentum_decay)) momentum schedule and
    mu-product bias correction). optax's nesterov Adam omits the schedule,
    so it diverges from torch early in training; this matches torch
    step-for-step (parity test: tests/test_optim_schedulers.py)."""
    def init_fn(params):
        return NAdamState(
            count=jnp.zeros([], jnp.int32),
            # default float dtype (f64 under x64) so the scalar mu schedule
            # doesn't inject f32 rounding into higher-precision training
            mu_product=jnp.ones([], jnp.result_type(float)),
            m=jax.tree_util.tree_map(jnp.zeros_like, params),
            v=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        t = state.count + 1
        tf = t.astype(state.mu_product.dtype)
        mu_t = b1 * (1.0 - 0.5 * 0.96 ** (tf * momentum_decay))
        mu_next = b1 * (1.0 - 0.5 * 0.96 ** ((tf + 1.0) * momentum_decay))
        mu_prod = state.mu_product * mu_t
        m = jax.tree_util.tree_map(
            lambda mm, g: b1 * mm + (1.0 - b1) * g, state.m, updates)
        v = jax.tree_util.tree_map(
            lambda vv, g: b2 * vv + (1.0 - b2) * g * g, state.v, updates)
        bc2 = 1.0 - b2 ** tf

        def upd(g, mm, vv):
            denom = jnp.sqrt(vv / bc2) + eps
            return ((1.0 - mu_t) / (1.0 - mu_prod) * g
                    + mu_next * mm / (1.0 - mu_prod * mu_next)) / denom

        new_updates = jax.tree_util.tree_map(upd, updates, m, v)
        return new_updates, NAdamState(count=t, mu_product=mu_prod, m=m, v=v)

    return optax.GradientTransformation(init_fn, update_fn)


class RpropState(NamedTuple):
    """Module-level (picklable into checkpoint manifests) Rprop state."""

    count: Any
    step_sizes: Any
    prev_grad: Any


def _scale_by_torch_rprop(learning_rate: float, eta_minus: float,
                          eta_plus: float, step_min: float,
                          step_max: float) -> optax.GradientTransformation:
    """torch.optim.Rprop's exact update: per-weight step sizes grown by
    eta_plus on consecutive same-sign gradients, shrunk by eta_minus on a
    sign flip (that step's gradient is also zeroed, torch's 'backtrack'),
    clamped to [step_min, step_max]; the update is -sign(g)*step.

    torch seeds the step sizes LAZILY at the first optimizer.step() from
    group['lr'] — which a scheduler has already adjusted by then — and
    ignores lr afterwards (the scheduler intentionally cannot retune a
    running Rprop). Under inject_hyperparams `learning_rate` here is the
    current injected value each update, so a count-gated seed reproduces
    torch exactly even when a scheduler changes the epoch-0 lr."""
    def init_fn(params):
        return RpropState(
            count=jnp.zeros([], jnp.int32),
            step_sizes=jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, dtype=jnp.result_type(float)),
                params),
            prev_grad=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        tm = jax.tree_util.tree_map
        first = state.count == 0
        sign = tm(lambda g, prev: jnp.sign(g * prev), updates, state.prev_grad)
        steps = tm(
            lambda s, sg: jnp.clip(
                jnp.where(first, learning_rate, s)
                * jnp.where(sg > 0, eta_plus,
                            jnp.where(sg < 0, eta_minus, 1.0)),
                step_min, step_max),
            state.step_sizes, sign)
        g_used = tm(lambda g, sg: jnp.where(sg < 0, 0.0, g), updates, sign)
        upd = tm(lambda gu, st: -jnp.sign(gu) * st, g_used, steps)
        return upd, RpropState(count=state.count + 1, step_sizes=steps,
                               prev_grad=g_used)

    return optax.GradientTransformation(init_fn, update_fn)


class ASGDState(NamedTuple):
    """Module-level (picklable) ASGD state. The Polyak average buffer (`ax`
    in torch) shadows the iterate without affecting it; it is not
    materialized here — the parameter trajectory is torch-exact."""

    count: Any
    eta: Any


def _scale_by_torch_asgd(learning_rate: float, lambd: float, alpha: float,
                         weight_decay: float) -> optax.GradientTransformation:
    """torch.optim.ASGD's exact iterate: with eta_t from the previous step,
    p <- p*(1 - lambd*eta_t) - eta_t*(g + wd*p), then
    eta_{t+1} = lr / (1 + lambd*lr*t)^alpha.

    Like Rprop, torch seeds the eta buffer lazily at the first step from the
    (possibly scheduler-adjusted) group lr; the count-gated seed below
    matches that. torch's t0 kwarg only shapes the Polyak average buffer
    (`ax`), which shadows the iterate without affecting it and is never read
    by the reference pipeline — so it is accepted in the config and ignored,
    which IS torch's live-weight behavior."""
    def init_fn(params):
        del params
        return ASGDState(count=jnp.zeros([], jnp.int32),
                         eta=jnp.zeros([], jnp.result_type(float)))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("ASGD requires params (decayed iterate)")
        eta = jnp.where(state.count == 0, learning_rate, state.eta)
        new_updates = jax.tree_util.tree_map(
            lambda g, p: -eta * (g + weight_decay * p) - lambd * eta * p,
            updates, params)
        t = state.count + 1
        new_eta = learning_rate / (
            1.0 + lambd * learning_rate * t.astype(eta.dtype)) ** alpha
        return new_updates, ASGDState(count=t, eta=new_eta)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    config: Dict[str, Any], train_anchors: bool = True,
) -> Tuple[optax.GradientTransformation, float]:
    """Build (tx, base_lr) from the reference optimizer_config block.

    train_anchors=False freezes the anchor params exactly like the
    reference's requires_grad=False path (see _freeze_anchors_transform).
    With True, torch semantics are kept: anchors sit in the optimizer, so a
    nonzero weight_decay decays them (zero grads) — same as torch would.
    """
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
    elif name in ("NAdam", "RAdam", "Adamax"):
        # reference resolves ANY torch.optim name by reflection
        # (/root/reference/train_det.py:52-54); these three share torch's
        # Adam kwarg surface. torch weight_decay is L2-added-to-grad, so it
        # goes before the scale_by_* transform (as in _adam_like).
        betas = cfg.pop("betas", (0.9, 0.999))
        eps = float(cfg.pop("eps", 1e-8))
        wd = float(cfg.pop("weight_decay", 0.0))
        momentum_decay = float(cfg.pop("momentum_decay", 4e-3))
        scalers = {
            "NAdam": lambda: _scale_by_torch_nadam(
                b1=betas[0], b2=betas[1], eps=eps, momentum_decay=momentum_decay),
            "RAdam": lambda: optax.scale_by_radam(b1=betas[0], b2=betas[1], eps=eps),
            "Adamax": lambda: optax.scale_by_adamax(b1=betas[0], b2=betas[1], eps=eps),
        }
        scaler = scalers[name]

        def opt(learning_rate):
            parts = []
            if wd:
                parts.append(optax.add_decayed_weights(wd))
            parts.append(scaler())
            parts.append(optax.scale(-learning_rate))
            return optax.chain(*parts)
    elif name == "Adagrad":
        eps = float(cfg.pop("eps", 1e-10))
        wd = float(cfg.pop("weight_decay", 0.0))
        initial_accumulator_value = float(cfg.pop("initial_accumulator_value", 0.0))

        def opt(learning_rate):
            parts = []
            if wd:
                parts.append(optax.add_decayed_weights(wd))
            parts.append(optax.scale_by_rss(
                initial_accumulator_value=initial_accumulator_value, eps=eps))
            parts.append(optax.scale(-learning_rate))
            return optax.chain(*parts)
    elif name == "Rprop":
        etas = cfg.pop("etas", (0.5, 1.2))
        step_sizes = cfg.pop("step_sizes", (1e-6, 50.0))

        def opt(learning_rate):
            return _scale_by_torch_rprop(
                learning_rate, eta_minus=float(etas[0]), eta_plus=float(etas[1]),
                step_min=float(step_sizes[0]), step_max=float(step_sizes[1]))
    elif name == "ASGD":
        lambd = float(cfg.pop("lambd", 1e-4))
        alpha = float(cfg.pop("alpha", 0.75))
        cfg.pop("t0", None)  # Polyak-buffer-only in torch; see _scale_by_torch_asgd
        wd = float(cfg.pop("weight_decay", 0.0))

        def opt(learning_rate):
            return _scale_by_torch_asgd(
                learning_rate, lambd=lambd, alpha=alpha, weight_decay=wd)
    else:
        raise KeyError(
            f"Unknown optimizer {name!r}; supported: Adam, AdamW, SGD, Adadelta, "
            f"RMSprop, NAdam, RAdam, Adamax, Adagrad, Rprop, ASGD")

    if not train_anchors:
        inner_opt = opt

        # NB: no extra parameters here — inject_hyperparams introspects the
        # signature and would try to inject them as hyperparams
        def _frozen_opt(learning_rate):
            return optax.chain(inner_opt(learning_rate), _freeze_anchors_transform())

        opt = _frozen_opt

    tx = optax.inject_hyperparams(opt)(learning_rate=lr)
    return tx, lr


def set_learning_rate(opt_state, lr):
    """Functionally set the injected learning_rate hyperparameter."""
    hyper = dict(opt_state.hyperparams)
    hyper["learning_rate"] = lr
    return opt_state._replace(hyperparams=hyper)
