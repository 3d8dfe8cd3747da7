"""Optimizer/scheduler breadth + anchor-freeze semantics (VERDICT r2 items
#2 and #6).

- `train_anchors: False` must freeze the anchor params exactly like the
  reference's requires_grad gate (/root/reference/modules/detection.py:36-38):
  even a nonzero weight_decay may never move them. With True, torch
  semantics apply: zero-grad anchors still decay under weight_decay.
- New optimizer names (NAdam, RAdam, Adamax, Adagrad) and schedulers
  (ExponentialLR, MultiStepLR, LinearLR) are parity-tested against torch on
  a quadratic toy problem, mirroring the reference's string-reflection
  resolution of any torch.optim name (/root/reference/train_det.py:52-57).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from vision_conglomerate_tpu.train.lr_schedule import make_lr_scheduler
from vision_conglomerate_tpu.train.optim import make_optimizer, set_learning_rate


# --------------------------------------------------------------- anchors

def _anchorish_params():
    return {
        "sm_anchors": jnp.asarray([[0.05, 0.06], [0.1, 0.1]], jnp.float32),
        "md_anchors": jnp.asarray([[0.2, 0.2], [0.3, 0.25]], jnp.float32),
        "lg_anchors": jnp.asarray([[0.4, 0.5], [0.6, 0.5]], jnp.float32),
        "body": {"kernel": jnp.ones((3, 3), jnp.float32)},
    }


def _run_steps(train_anchors, weight_decay=0.01, n=3):
    import optax

    params = _anchorish_params()
    tx, _ = make_optimizer(
        {"name": "Adam", "lr": 1e-2, "weight_decay": weight_decay},
        train_anchors=train_anchors)
    opt_state = tx.init(params)
    for _ in range(n):
        # anchors get exactly-zero grads (the loss detaches them); the body
        # gets a real gradient
        grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        grads["body"]["kernel"] = jnp.ones_like(params["body"]["kernel"])
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    return params


def test_anchors_frozen_when_train_anchors_false():
    before = _anchorish_params()
    after = _run_steps(train_anchors=False, weight_decay=0.01)
    for k in ("sm_anchors", "md_anchors", "lg_anchors"):
        np.testing.assert_array_equal(np.asarray(after[k]), np.asarray(before[k]))
    # the body must still train
    assert not np.allclose(np.asarray(after["body"]["kernel"]),
                           np.asarray(before["body"]["kernel"]))


def test_anchors_decay_when_train_anchors_true():
    """torch parity: requires_grad=True + weight_decay decays zero-grad
    anchors (documented quirk, models/detection.py docstring)."""
    before = _anchorish_params()
    after = _run_steps(train_anchors=True, weight_decay=0.01)
    for k in ("sm_anchors", "md_anchors", "lg_anchors"):
        assert not np.array_equal(np.asarray(after[k]), np.asarray(before[k]))


def test_pipeline_anchor_freeze_three_steps():
    """End-to-end: 3 real train steps with wd=0.01 leave anchors bit-equal."""
    from vision_conglomerate_tpu.losses import DetectionLossConfig
    from vision_conglomerate_tpu.models import DetectionNet
    from vision_conglomerate_tpu.parallel import make_mesh
    from vision_conglomerate_tpu.train import TrainDetectionPipeline

    config = {
        "train_anchors": False,
        "backbone": "CSPBackBone",
        "neck": "RepBiPAN",
        "head": "EffiDecHead",
        "cspbackbone_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
        "repbipan_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
        "effidechead_config": {"width_multiple": 0.5},
    }
    anchors = {
        "sm": [[0.05, 0.06], [0.1, 0.1], [0.15, 0.12]],
        "md": [[0.2, 0.2], [0.3, 0.25], [0.25, 0.35]],
        "lg": [[0.4, 0.5], [0.6, 0.5], [0.7, 0.8]],
    }
    model = DetectionNet(num_classes=2, config=config, anchors=anchors)
    tx, _ = make_optimizer({"name": "Adam", "lr": 1e-2, "weight_decay": 0.01},
                           train_anchors=config["train_anchors"])
    pipe = TrainDetectionPipeline(
        model, DetectionLossConfig(num_classes=2), tx,
        mesh=make_mesh(1), sample_input_shape=(64, 64, 3))

    rng = np.random.default_rng(0)
    imgs = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    labels = np.zeros((2, 4, 5), np.float32)
    labels[:, 0] = [1, 0.5, 0.5, 0.3, 0.3]
    mask = np.zeros((2, 4), bool)
    mask[:, 0] = True

    before = {k: np.asarray(pipe.state.params[k])
              for k in ("sm_anchors", "md_anchors", "lg_anchors")}
    lr = jnp.float32(1e-2)
    state = pipe.state
    for _ in range(3):
        state, metrics = pipe._train_step(
            state, lr, jnp.asarray(imgs), jnp.asarray(labels), jnp.asarray(mask))
    for k, v in before.items():
        np.testing.assert_array_equal(np.asarray(state.params[k]), v)
    assert np.isfinite(float(metrics["aggregate_loss"]))


# ------------------------------------------------- optimizer torch parity

QUAD_TARGET = np.asarray([0.3, -1.2, 2.4], np.float64)
W0 = np.asarray([1.5, -2.0, 3.0], np.float64)


def _torch_traj(name, lr, steps=10, **kwargs):
    w = torch.nn.Parameter(torch.tensor(W0, dtype=torch.float64))
    opt = getattr(torch.optim, name)([w], lr=lr, **kwargs)
    t = torch.tensor(QUAD_TARGET, dtype=torch.float64)
    traj = []
    for _ in range(steps):
        opt.zero_grad()
        loss = 0.5 * ((w - t) ** 2).sum()
        loss.backward()
        opt.step()
        traj.append(w.detach().numpy().copy())
    return np.stack(traj)


def _jax_traj(cfg, steps=10):
    import optax

    # x64 so the comparison against torch's float64 trajectory isolates
    # algorithm parity from f32 rounding
    with jax.enable_x64(True):
        tx, _ = make_optimizer(cfg)
        w = jnp.asarray(W0)
        t = jnp.asarray(QUAD_TARGET)
        opt_state = tx.init(w)
        traj = []
        for _ in range(steps):
            g = w - t
            updates, opt_state = tx.update(g, opt_state, w)
            w = optax.apply_updates(w, updates)
            traj.append(np.asarray(w, np.float64))
    return np.stack(traj)


@pytest.mark.parametrize("name,cfg,tol", [
    ("RAdam", {"lr": 0.05}, 1e-8),
    # torch Adamax adds eps INSIDE the infinity-norm max (max(b2*u, |g|+eps));
    # optax adds it to the denominator — sub-1e-6 drift on this toy
    ("Adamax", {"lr": 0.05}, 1e-5),
    ("Adagrad", {"lr": 0.1}, 1e-9),
    ("Adagrad", {"lr": 0.1, "weight_decay": 0.01}, 1e-9),
    ("Adamax", {"lr": 0.05, "weight_decay": 0.01}, 1e-5),
    ("Rprop", {"lr": 0.01}, 1e-12),
    ("Rprop", {"lr": 0.05, "etas": (0.4, 1.3), "step_sizes": (1e-5, 2.0)}, 1e-12),
    # torch ASGD keeps its eta buffer in float32 even for f64 params, so the
    # trajectories drift at f32 resolution (~1e-9 here); the algorithm is
    # exact
    ("ASGD", {"lr": 0.05}, 1e-7),
    ("ASGD", {"lr": 0.05, "lambd": 1e-3, "weight_decay": 0.01}, 1e-7),
])
def test_new_optimizers_match_torch(name, cfg, tol):
    ours = _jax_traj({"name": name, **cfg})
    theirs = _torch_traj(name, **cfg)
    np.testing.assert_allclose(ours, theirs, atol=tol, rtol=0)


def test_nadam_matches_torch():
    """_scale_by_torch_nadam reproduces torch NAdam step-for-step, including
    the momentum_decay=4e-3 mu schedule and mu-product bias correction."""
    ours = _jax_traj({"name": "NAdam", "lr": 0.05})
    theirs = _torch_traj("NAdam", lr=0.05)
    np.testing.assert_allclose(ours, theirs, atol=1e-9, rtol=0)


def test_nadam_with_weight_decay_matches_torch():
    ours = _jax_traj({"name": "NAdam", "lr": 0.05, "weight_decay": 0.01})
    theirs = _torch_traj("NAdam", lr=0.05, weight_decay=0.01)
    np.testing.assert_allclose(ours, theirs, atol=1e-9, rtol=0)


def test_nadam_state_pickles():
    """Checkpoint manifests pickle opt_state; NAdamState must be a
    module-level type (caught by the round-3 CLI verify run)."""
    import pickle

    tx, _ = make_optimizer({"name": "NAdam", "lr": 1e-3})
    st = tx.init({"w": jnp.ones(3)})
    st_np = jax.tree_util.tree_map(np.asarray, st)
    restored = pickle.loads(pickle.dumps(st_np))
    assert jax.tree_util.tree_structure(restored) == jax.tree_util.tree_structure(st_np)


def test_unknown_optimizer_lists_supported():
    with pytest.raises(KeyError, match="NAdam"):
        make_optimizer({"name": "LBFGS", "lr": 0.1})


def test_set_learning_rate_with_freeze_wrapper():
    """inject_hyperparams state surface survives the freeze wrapper."""
    params = _anchorish_params()
    tx, _ = make_optimizer({"name": "SGD", "lr": 0.1}, train_anchors=False)
    st = tx.init(params)
    st = set_learning_rate(st, 0.05)
    assert float(st.hyperparams["learning_rate"]) == pytest.approx(0.05)


# ------------------------------------------------- scheduler torch parity

def _torch_sched_lrs(name, base_lr, epochs, **kwargs):
    w = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([w], lr=base_lr)
    sched = getattr(torch.optim.lr_scheduler, name)(opt, **kwargs)
    lrs = []
    for _ in range(epochs):
        lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return lrs


@pytest.mark.parametrize("name,kwargs", [
    ("ExponentialLR", {"gamma": 0.9}),
    ("MultiStepLR", {"milestones": [3, 7], "gamma": 0.5}),
    ("LinearLR", {"start_factor": 0.25, "end_factor": 1.0, "total_iters": 4}),
    ("StepLR", {"step_size": 4, "gamma": 0.2}),
    ("ConstantLR", {"factor": 0.5, "total_iters": 4}),
    ("ConstantLR", {}),  # torch defaults: lr/3 for the first 5 epochs
])
def test_schedulers_match_torch(name, kwargs):
    base_lr = 0.1
    theirs = _torch_sched_lrs(name, base_lr, epochs=12, **kwargs)
    ours_sched = make_lr_scheduler({"name": name, **kwargs}, base_lr)
    ours = []
    for _ in range(12):
        ours.append(ours_sched.get_lr())
        ours_sched.step()
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)


@pytest.mark.parametrize("mode,gamma", [
    ("triangular", 1.0), ("triangular2", 1.0), ("exp_range", 0.97)])
def test_cyclic_lr_matches_torch(mode, gamma):
    """torch CyclicLR parity across all three amplitude modes, asymmetric
    up/down step sizes, over 3+ full cycles. cycle_momentum=False on both
    sides (momentum cycling is torch-SGD-specific; ours rejects True)."""
    base_lr = 0.02
    kw = dict(max_lr=0.2, step_size_up=3, step_size_down=5, mode=mode,
              gamma=gamma, cycle_momentum=False)
    # inline (not _torch_sched_lrs): torch CyclicLR takes base_lr as its own
    # ctor argument, which would collide with the helper's positional
    w = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([w], lr=base_lr)
    tsched = torch.optim.lr_scheduler.CyclicLR(opt, base_lr=base_lr, **kw)
    theirs = []
    for _ in range(26):
        theirs.append(opt.param_groups[0]["lr"])
        opt.step()
        tsched.step()
    # reference-format config: base_lr is a mandatory torch CyclicLR kwarg and
    # must override the optimizer lr (0.999 decoy), not collide with it
    sched = make_lr_scheduler({"name": "CyclicLR", "base_lr": base_lr, **kw}, 0.999)
    ours = []
    for _ in range(26):
        ours.append(sched.get_lr())
        sched.step()
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)


def test_cyclic_lr_rejects_momentum_cycling():
    with pytest.raises(ValueError, match="cycle_momentum"):
        make_lr_scheduler({"name": "CyclicLR", "max_lr": 0.2,
                           "cycle_momentum": True}, 0.02)


def test_polynomial_lr_matches_torch():
    base_lr = 0.1
    kwargs = {"total_iters": 8, "power": 2.0}
    theirs = _torch_sched_lrs("PolynomialLR", base_lr, epochs=12, **kwargs)
    sched = make_lr_scheduler({"name": "PolynomialLR", **kwargs}, base_lr)
    ours = []
    for _ in range(12):
        ours.append(sched.get_lr())
        sched.step()
    np.testing.assert_allclose(ours, theirs, rtol=1e-10, atol=1e-15)


@pytest.mark.parametrize("strategy", ["cos", "linear"])
def test_onecycle_lr_matches_torch(strategy):
    # torch OneCycleLR refuses to step past total_steps, so drive one short
    kwargs = dict(max_lr=0.4, total_steps=15, pct_start=0.3,
                  anneal_strategy=strategy, div_factor=25.0,
                  final_div_factor=1e3)
    theirs = _torch_sched_lrs("OneCycleLR", 0.1, epochs=14, **kwargs)
    sched = make_lr_scheduler({"name": "OneCycleLR", **kwargs}, 0.1)
    ours = []
    for _ in range(14):
        ours.append(sched.get_lr())
        sched.step()
    np.testing.assert_allclose(ours, theirs, rtol=1e-10)


def test_reduce_lr_on_plateau_matches_torch():
    """Same synthetic metric trace through torch and ours: identical lr
    trajectory (patience counting, rel-threshold, cooldown, min_lr floor)."""
    metrics = [1.0, 0.9, 0.9, 0.9, 0.9, 0.89, 0.89, 0.89, 0.89, 0.89,
               0.5, 0.5, 0.5, 0.5, 0.5]
    kwargs = dict(mode="min", factor=0.5, patience=2, threshold=1e-2,
                  threshold_mode="rel", cooldown=1, min_lr=1e-3)

    w = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([w], lr=0.1)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, **kwargs)
    theirs = []
    for m in metrics:
        tsched.step(m)
        theirs.append(opt.param_groups[0]["lr"])

    sched = make_lr_scheduler({"name": "ReduceLROnPlateau", **kwargs}, 0.1)
    ours = []
    for m in metrics:
        sched.step(m)
        ours.append(sched.get_lr())
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)
    assert theirs[-1] < 0.1  # the trace actually triggered reductions


def test_plateau_trainer_wiring_feeds_eval_metric():
    """BasePipeline._scheduler_step must feed ReduceLROnPlateau the eval
    metric it names, exactly once per NEW eval — never before the first
    eval, and never re-feeding a stale metric on non-eval epochs (which
    would burn patience eval_interval times too fast)."""
    import types

    from vision_conglomerate_tpu.train.base import BasePipeline
    from vision_conglomerate_tpu.train.lr_schedule import ReduceLROnPlateau

    sched = make_lr_scheduler(
        {"name": "ReduceLROnPlateau", "factor": 0.5, "patience": 0,
         "metric": "aggregate_loss"}, 0.1)
    assert isinstance(sched, ReduceLROnPlateau)
    ns = types.SimpleNamespace(lr_scheduler=sched, last_eval_metrics=None,
                               _evals_seen=0, _plateau_evals_consumed=0)
    BasePipeline._scheduler_step(ns)           # no eval yet -> no-op
    assert sched.get_lr() == pytest.approx(0.1)
    BasePipeline._note_eval(ns, {"aggregate_loss": 1.0})
    BasePipeline._scheduler_step(ns)           # best=1.0
    BasePipeline._note_eval(ns, {"aggregate_loss": 2.0})
    BasePipeline._scheduler_step(ns)           # worse, patience 0 -> cut
    assert sched.get_lr() == pytest.approx(0.05)
    # stale epoch (no new eval): 2.0 again would cut once more if re-fed
    BasePipeline._scheduler_step(ns)
    assert sched.get_lr() == pytest.approx(0.05)
    # missing metric key: warn + skip rather than silently no-op forever
    BasePipeline._note_eval(ns, {"loss": 3.0})
    BasePipeline._scheduler_step(ns)
    assert sched.get_lr() == pytest.approx(0.05)

    # non-plateau schedulers keep the plain step() path
    plain = make_lr_scheduler({"name": "ExponentialLR", "gamma": 0.5}, 0.1)
    ns2 = types.SimpleNamespace(lr_scheduler=plain, last_eval_metrics=None,
                                _evals_seen=0, _plateau_evals_consumed=0)
    BasePipeline._scheduler_step(ns2)
    assert plain.get_lr() == pytest.approx(0.05)


@pytest.mark.parametrize("name,kwargs,tol", [
    ("Rprop", {}, 1e-12),
    ("ASGD", {"lambd": 1e-3}, 1e-7),
])
def test_lazy_lr_seed_with_scheduler(name, kwargs, tol):
    """torch seeds Rprop's step sizes / ASGD's eta buffer at the FIRST
    optimizer.step() from the scheduler-adjusted group lr, not the
    construction lr. ConstantLR(1/3) also jumps back to base_lr at epoch 5,
    covering post-seed semantics (Rprop ignores lr changes; ASGD re-reads
    the current lr for each eta recurrence)."""
    import optax

    base_lr = 0.09
    w = torch.nn.Parameter(torch.tensor(W0, dtype=torch.float64))
    opt = getattr(torch.optim, name)([w], lr=base_lr, **kwargs)
    tsched = torch.optim.lr_scheduler.ConstantLR(opt, factor=1.0 / 3, total_iters=5)
    t = torch.tensor(QUAD_TARGET, dtype=torch.float64)
    theirs = []
    for _ in range(8):
        opt.zero_grad()
        loss = 0.5 * ((w - t) ** 2).sum()
        loss.backward()
        opt.step()
        tsched.step()
        theirs.append(w.detach().numpy().copy())

    with jax.enable_x64(True):
        tx, lr0 = make_optimizer({"name": name, "lr": base_lr, **kwargs})
        sched = make_lr_scheduler(
            {"name": "ConstantLR", "factor": 1.0 / 3, "total_iters": 5}, lr0)
        wj = jnp.asarray(W0)
        tj = jnp.asarray(QUAD_TARGET)
        st = tx.init(wj)
        ours = []
        for _ in range(8):
            st = set_learning_rate(st, sched.get_lr())  # as the trainers do
            updates, st = tx.update(wj - tj, st, wj)
            wj = optax.apply_updates(wj, updates)
            sched.step()
            ours.append(np.asarray(wj, np.float64))
    np.testing.assert_allclose(np.stack(ours), np.stack(theirs), atol=tol, rtol=0)
