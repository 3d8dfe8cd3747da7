"""Integration tests (SURVEY.md §4b/§4c): one-batch overfit + DP equivalence
on the 8-virtual-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_conglomerate_tpu.losses import DetectionLossConfig
from vision_conglomerate_tpu.models import DetectionNet
from vision_conglomerate_tpu.parallel import make_mesh
from vision_conglomerate_tpu.train import TrainDetectionPipeline, make_optimizer
from vision_conglomerate_tpu.train.lr_schedule import make_lr_scheduler

TINY_CONFIG = {
    "train_anchors": True,
    "backbone": "CSPBackBone",
    "neck": "RepBiPAN",
    "head": "EffiDecHead",
    "cspbackbone_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
    "repbipan_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
    "effidechead_config": {"width_multiple": 0.5},
}

ANCHORS = {
    "sm": [[0.05, 0.06], [0.1, 0.1], [0.15, 0.12]],
    "md": [[0.2, 0.2], [0.3, 0.25], [0.25, 0.35]],
    "lg": [[0.4, 0.5], [0.6, 0.5], [0.7, 0.8]],
}


def _batch(rng, b=8, m=4, size=64):
    imgs = rng.uniform(size=(b, size, size, 3)).astype(np.float32)
    labels = np.zeros((b, m, 5), np.float32)
    mask = np.zeros((b, m), bool)
    for i in range(b):
        labels[i, 0] = [1, 0.5, 0.5, 0.3, 0.3]
        labels[i, 1] = [0, 0.25, 0.3, 0.1, 0.12]
        mask[i, :2] = True
    return imgs, labels, mask


def _make_pipeline(mesh, seed=42):
    model = DetectionNet(num_classes=2, config=TINY_CONFIG, anchors=ANCHORS)
    tx, base_lr = make_optimizer({"name": "Adam", "lr": 5e-3})
    sched = make_lr_scheduler(
        {"name": "CosineAnnealingWarmRestarts", "T_0": 50, "T_mult": 1, "eta_min": 1e-6},
        base_lr)
    return TrainDetectionPipeline(
        model,
        DetectionLossConfig(num_classes=2),
        tx,
        lr_scheduler=sched,
        mesh=mesh,
        sample_input_shape=(64, 64, 3),
    )


class _OneBatchLoader:
    def __init__(self, batch, n=1):
        self.batch = batch
        self.n = n

    def __len__(self):
        return self.n

    def __iter__(self):
        for _ in range(self.n):
            yield self.batch


def test_train_step_runs_and_overfits():
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    mesh = make_mesh(1)
    pipe = _make_pipeline(mesh)
    losses = []
    for _ in range(8):
        metrics = pipe.train(_OneBatchLoader(batch))
        losses.append(metrics["aggregate_loss"])
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_eval_step_runs():
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    pipe = _make_pipeline(make_mesh(1))
    metrics = pipe.evaluate(_OneBatchLoader(batch))
    assert np.isfinite(metrics["aggregate_loss"])


def test_dp8_matches_single_device_loss():
    """Same global batch, 1-device vs 8-device mesh -> same loss/metrics.

    (BN batch stats are per-shard under DP — matching per-replica DDP BN — so
    losses match on the FIRST step only when BN normalisation differences are
    nil; with per-shard batches of 1 vs 8 the train-mode BN stats differ, so
    we compare the eval step, which uses identical running stats.)
    """
    rng = np.random.default_rng(1)
    batch = _batch(rng, b=8)
    pipe1 = _make_pipeline(make_mesh(1), seed=42)
    pipe8 = _make_pipeline(make_mesh(8), seed=42)
    m1 = pipe1.evaluate(_OneBatchLoader(batch))
    m8 = pipe8.evaluate(_OneBatchLoader(batch))
    assert m1["aggregate_loss"] == pytest.approx(m8["aggregate_loss"], rel=2e-4)
    assert m1["conf_loss"] == pytest.approx(m8["conf_loss"], rel=2e-4)


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    batch = _batch(rng)
    pipe = _make_pipeline(make_mesh(1))
    pipe.train(_OneBatchLoader(batch))
    pipe.checkpoints_dir = str(tmp_path / "ckpts")
    pipe.best_model_dir = str(tmp_path / "best")
    pipe.save_checkpoint()
    import glob
    ckpts = glob.glob(str(tmp_path / "ckpts" / "*.ckpt.tar"))
    assert len(ckpts) == 1

    pipe2 = _make_pipeline(make_mesh(1))
    pipe2.load_checkpoint(ckpts[0])
    assert pipe2.last_epoch == pipe.last_epoch
    l1 = pipe.evaluate(_OneBatchLoader(batch))["aggregate_loss"]
    l2 = pipe2.evaluate(_OneBatchLoader(batch))["aggregate_loss"]
    assert l1 == pytest.approx(l2, rel=1e-5)

    # a directory resolves to the newest snapshot under it (resume QoL:
    # --checkpoint_path saved_model/<task>/checkpoints works as-is)
    pipe3 = _make_pipeline(make_mesh(1))
    pipe3.load_checkpoint(str(tmp_path / "ckpts"))
    assert pipe3.last_epoch == pipe.last_epoch
    from vision_conglomerate_tpu.train.checkpoint import resolve_checkpoint_path
    assert resolve_checkpoint_path(str(tmp_path / "ckpts")) == ckpts[0]
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint_path(str(empty))


def test_best_eval_loss_survives_resume(tmp_path):
    """best_eval_loss seeds the CLI best-model tracking from RESTORED
    history: a resumed run whose first eval is worse than the pre-resume
    best must not treat it as a new best (train_det.py best_loss seed)."""
    rng = np.random.default_rng(3)
    batch = _batch(rng)
    pipe = _make_pipeline(make_mesh(1))
    assert pipe.best_eval_loss() == float("inf")  # no history yet
    pipe.train(_OneBatchLoader(batch))
    m = pipe.evaluate(_OneBatchLoader(batch))
    assert pipe.best_eval_loss() == pytest.approx(m["aggregate_loss"])
    pipe.checkpoints_dir = str(tmp_path / "ckpts")
    pipe.save_checkpoint()

    pipe2 = _make_pipeline(make_mesh(1))
    pipe2.load_checkpoint(str(tmp_path / "ckpts"))
    assert pipe2.best_eval_loss() == pytest.approx(m["aggregate_loss"])
    # a worse post-resume eval is not a new best; a better one is
    pipe2._record("eval", {"aggregate_loss": m["aggregate_loss"] + 1.0}, False)
    assert pipe2.best_eval_loss() == pytest.approx(m["aggregate_loss"])
    pipe2._record("eval", {"aggregate_loss": m["aggregate_loss"] - 1.0}, False)
    assert pipe2.best_eval_loss() == pytest.approx(m["aggregate_loss"] - 1.0)


class _RaggedEvalLoader:
    """Mimics DataLoader pad_last="wrap": yields one batch whose trailing
    rows are wrap-padded duplicates; .dataset carries the true length."""

    def __init__(self, batch, n_real):
        self.batch = batch
        self.dataset = list(range(n_real))

    def __len__(self):
        return 1

    def __iter__(self):
        yield self.batch


def _ragged_inputs(rng, n_real=6, b=8, m=4, size=64):
    """n_real distinct images with IDENTICAL label structure (equal
    per-image candidate counts, so candidate-level metric weighting is exact
    — see _combine_metrics docstring), wrap-padded to b rows."""
    imgs, labels, mask = _batch(rng, b=n_real, m=m, size=size)
    pad = [i % n_real for i in range(b - n_real)]
    imgs_p = np.concatenate([imgs, imgs[pad]], axis=0)
    labels_p = np.concatenate([labels, labels[pad]], axis=0)
    mask_p = np.concatenate([mask, mask[pad]], axis=0)
    return (imgs, labels, mask), (imgs_p, labels_p, mask_p), n_real


@pytest.mark.parametrize("batch_scale", [False, True])
def test_eval_wrap_padding_masked_matches_ragged(batch_scale):
    """ADVICE r3: the wrap-tail masking feature (label_mask zeroing, masked
    conf-BCE denominator, per-shard weighting) vs ground truth — a padded
    batch with a partial image_mask must score exactly like the unpadded
    ragged batch, on a 1-device mesh AND on the 8-device mesh where the
    padded rows land on entirely-padded shards."""
    from vision_conglomerate_tpu.losses import DetectionLossConfig
    from vision_conglomerate_tpu.train import make_optimizer

    rng = np.random.default_rng(3)
    ragged, padded, n_real = _ragged_inputs(rng)

    def mk(mesh):
        model = DetectionNet(num_classes=2, config=TINY_CONFIG, anchors=ANCHORS)
        tx, _ = make_optimizer({"name": "Adam", "lr": 1e-3})
        return TrainDetectionPipeline(
            model, DetectionLossConfig(num_classes=2, batch_scale_loss=batch_scale),
            tx, mesh=mesh, sample_input_shape=(64, 64, 3), seed=7)

    keys = ("aggregate_loss", "conf_loss", "class_loss", "mean_ciou",
            "avg_pos_conf", "avg_neg_conf", "f1", "accuracy")

    m_ref = mk(make_mesh(1)).evaluate(_RaggedEvalLoader(ragged, n_real))
    m_pad1 = mk(make_mesh(1)).evaluate(_RaggedEvalLoader(padded, n_real))
    for k in keys:
        assert m_pad1[k] == pytest.approx(m_ref[k], rel=1e-4, abs=1e-6), k

    # 8-device mesh: 8 rows -> 1 per shard; shards 6,7 are fully padded and
    # must contribute nothing. f1/accuracy are argmax-derived AND macro-f1
    # is nonlinear across shards (per-shard-weighted macro-f1 only
    # approximates the global one — _combine_metrics docstring): with an
    # untrained net a borderline class argmax can flip on float noise and
    # move macro-f1 by a whole per-class quantum, so those two get a loose
    # gate; the continuous metrics stay tight.
    m_pad8 = mk(make_mesh(8)).evaluate(_RaggedEvalLoader(padded, n_real))
    for k in keys:
        rel = 2e-2 if k in ("f1", "accuracy") else 2e-4
        assert m_pad8[k] == pytest.approx(m_ref[k], rel=rel, abs=1e-6), k


def test_eval_loader_contract_violation_raises():
    """A loader advertising more dataset rows than it yields would have had
    real rows silently masked — the trainer must fail loudly (ADVICE r3)."""
    rng = np.random.default_rng(4)
    batch = _batch(rng, b=4)
    pipe = _make_pipeline(make_mesh(1))
    loader = _RaggedEvalLoader(batch, n_real=4)
    loader.dataset = list(range(9))  # claims 9 rows, yields 4
    with pytest.raises(RuntimeError, match="yielded 4 rows"):
        pipe.evaluate(loader)
