"""TrackNet tests: dataset windows, both architectures, train/eval loop,
video inference driver."""
import glob
import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

BASE_CONFIG = {
    "weight_init": "uniform",
    "architecture": "base",
    "base_arch_config": {
        "encoder_config": {"width_multiple": 0.25},
        "decoder_config": {"width_multiple": 0.25},
    },
}

ADV_CONFIG = {
    "weight_init": "xavier",
    "architecture": "advanced",
    "advanced_arch_config": {
        "encoder_modules": ["CSPNet", "RepBiPAN"],
        "decoder_modules": ["DeconvRepBiPAN", "DeconvCSPNet"],
        "encoder_config": {
            "cspnet_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
            "repbipan_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
        },
        "decoder_config": {
            "deconvrepbipan_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
            "deconvcspnet_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
        },
    },
}


def _write_clip(root, n_frames=6, size=(64, 32), seed=0):
    """data/<game>/Clip1/{frames + Label.csv} (reference layout)."""
    rng = np.random.default_rng(seed)
    clip = os.path.join(root, "game1", "Clip1")
    os.makedirs(clip, exist_ok=True)
    rows = []
    for i in range(n_frames):
        img = (rng.uniform(size=(size[1], size[0], 3)) * 255).astype(np.uint8)
        name = f"{i:04d}.jpg"
        Image.fromarray(img).save(os.path.join(clip, name))
        rows.append({"file name": name, "visibility": 1,
                     "x-coordinate": 20 + i, "y-coordinate": 10 + i, "status": 0})
    pd.DataFrame(rows).to_csv(os.path.join(clip, "Label.csv"), index=False)
    return clip


def test_tracknet_dataset_windows(tmp_path):
    from vision_conglomerate_tpu.data import TrackNetDataset

    root = str(tmp_path / "tn")
    _write_clip(root, n_frames=6)
    ds = TrackNetDataset(data_path=root, num_stacks=3, img_wh=(64, 32), avg_diameter=5)
    assert len(ds) == 4  # 6 frames -> 4 windows
    frames, heatmap, others = ds[0]
    assert frames.shape == (32, 64, 9)
    assert heatmap.shape == (32, 64)
    assert heatmap.dtype == np.uint8
    assert heatmap.max() > 200  # gaussian peak
    vis, x, y, status = others
    assert vis == 1


def test_tracknet_dataset_cache(tmp_path):
    from vision_conglomerate_tpu.data import TrackNetDataset

    root = str(tmp_path / "tn")
    _write_clip(root, n_frames=6)
    ds = TrackNetDataset(data_path=root, num_stacks=3, img_wh=(64, 32),
                         avg_diameter=5, cache=True, seed=0)
    uncached = TrackNetDataset(data_path=root, num_stacks=3, img_wh=(64, 32),
                               avg_diameter=5, seed=0)
    for i in range(len(ds)):
        a = ds[i]
        b = ds[i]  # second read served from cache
        c = uncached[i]
        assert a[0] is b[0]  # cached: identical object, no re-decode
        for x, y in zip(a, c):
            np.testing.assert_array_equal(x, y)
    assert len(ds._cache) == len(ds)


@pytest.mark.parametrize("config", [BASE_CONFIG, ADV_CONFIG],
                         ids=["base", "advanced"])
def test_tracknet_forward_shapes(config):
    import jax
    import jax.numpy as jnp

    from vision_conglomerate_tpu.models import TrackNet

    model = TrackNet(config=config)
    x = jnp.zeros((1, 32, 64, 9))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 32, 64, 256)
    hm = model.apply(variables, x, train=False, inference=True)
    assert hm.shape == (1, 32, 64) and hm.dtype == jnp.uint8


def test_tracknet_dataset_uint8_transfer(tmp_path):
    """uint8 shipping mode: frames come back uint8 and, after /255, match
    the reference-parity f32 path within bilinear-rounding tolerance."""
    from vision_conglomerate_tpu.data import TrackNetDataset

    root = str(tmp_path / "tn")
    _write_clip(root, n_frames=6)
    f32 = TrackNetDataset(data_path=root, num_stacks=3, img_wh=(64, 32), seed=0)
    u8 = TrackNetDataset(data_path=root, num_stacks=3, img_wh=(64, 32), seed=0,
                         transfer_dtype="uint8")
    for i in range(len(f32)):
        a, hm_a, o_a = f32[i]
        b, hm_b, o_b = u8[i]
        assert b.dtype == np.uint8 and a.dtype == np.float32
        np.testing.assert_allclose(b.astype(np.float32) / 255.0, a,
                                   atol=1.5 / 255.0)
        np.testing.assert_array_equal(hm_a, hm_b)
        np.testing.assert_array_equal(o_a, o_b)
    with pytest.raises(ValueError):
        TrackNetDataset(data_path=root, transfer_dtype="float16")


def test_tracknet_trainer_accepts_uint8(tmp_path):
    """The jitted train/eval steps normalize uint8 frames in-jit to the
    same result as pre-normalized f32 frames."""
    import jax.numpy as jnp

    from vision_conglomerate_tpu.models import TrackNet
    from vision_conglomerate_tpu.parallel import make_mesh
    from vision_conglomerate_tpu.train import TrainTrackNetPipeline, make_optimizer

    model = TrackNet(config=BASE_CONFIG)
    tx, _ = make_optimizer({"name": "Adam", "lr": 1e-3})
    pipe = TrainTrackNetPipeline(model, tx, mesh=make_mesh(1),
                                 sample_input_shape=(32, 64, 9))
    rng = np.random.default_rng(0)
    frames_u8 = rng.integers(0, 256, size=(2, 32, 64, 9), dtype=np.uint8)
    heatmaps = np.zeros((2, 32, 64), np.uint8)

    lr = jnp.float32(1e-3)
    loss_f32, *_ = pipe._eval_forward(
        pipe.state, jnp.asarray(frames_u8.astype(np.float32) / 255.0),
        jnp.asarray(heatmaps))
    loss_u8, *_ = pipe._eval_forward(
        pipe.state, jnp.asarray(frames_u8), jnp.asarray(heatmaps))
    np.testing.assert_allclose(  # per-sample eval losses (B,)
        np.asarray(loss_u8), np.asarray(loss_f32), rtol=1e-5)
    state2, m = pipe._train_step(pipe.state, lr, jnp.asarray(frames_u8),
                                 jnp.asarray(heatmaps))
    assert np.isfinite(float(m["loss"]))


def test_tracknet_heatmap_fires_tp():
    """Learnability: overfitting a tiny batch must drive the predicted
    heatmap peak over the 128 decode threshold within 4px of the ball —
    i.e. the eval protocol can produce tp>0, not just a falling CE loss
    (reference protocol: /root/reference/pipeline/tracknet_trainer.py:141-155)."""
    import jax
    import jax.numpy as jnp
    import optax

    from vision_conglomerate_tpu.losses.focal import softmax_cross_entropy
    from vision_conglomerate_tpu.models import TrackNet
    from vision_conglomerate_tpu.ops.heatmap import make_gt_heatmap_np

    hw, B = 48, 2
    rng = np.random.default_rng(0)
    frames = rng.normal(0, 0.05, size=(B, hw, hw, 9)).astype(np.float32) + 0.4
    hms = []
    for b in range(B):
        x, y = rng.integers(10, hw - 10, size=2)
        yy, xx = np.mgrid[0:hw, 0:hw]
        ball = ((xx - x) ** 2 + (yy - y) ** 2 <= 9).astype(np.float32)
        for c in range(9):
            frames[b, :, :, c] = np.where(ball > 0, 0.95, frames[b, :, :, c])
        hms.append(make_gt_heatmap_np(int(x), int(y), 1, (hw, hw), variance=5))
    heatmaps = np.stack(hms)

    model = TrackNet(config=BASE_CONFIG, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 9)),
                           train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)
    fx, hy = jnp.asarray(frames), jnp.asarray(heatmaps).astype(jnp.int32)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            logits, mut = model.apply({"params": p, "batch_stats": batch_stats},
                                      fx, train=True, mutable=["batch_stats"])
            return softmax_cross_entropy(logits, hy).mean(), mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), mut["batch_stats"], opt_state, loss

    hits = 0
    for i in range(120):
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state)
        if i >= 40 and i % 20 == 0:
            pred = np.asarray(jnp.argmax(model.apply(
                {"params": params, "batch_stats": batch_stats}, fx, train=False), -1))
            hits = 0
            for b in range(B):
                gy, gx = np.unravel_index(heatmaps[b].argmax(), heatmaps[b].shape)
                py, px = np.unravel_index(pred[b].argmax(), pred[b].shape)
                if pred[b].max() >= 128 and np.hypot(px - gx, py - gy) <= 4:
                    hits += 1
            if hits == B:
                break
    assert hits == B, f"heatmap never fired tp on all {B} samples (hits={hits})"


def test_tracknet_train_eval(tmp_path):
    from vision_conglomerate_tpu.data import DataLoader, TrackNetDataset
    from vision_conglomerate_tpu.models import TrackNet
    from vision_conglomerate_tpu.parallel import make_mesh
    from vision_conglomerate_tpu.train import TrainTrackNetPipeline, make_optimizer

    root = str(tmp_path / "tn")
    _write_clip(root, n_frames=8)
    ds = TrackNetDataset(data_path=root, num_stacks=3, img_wh=(64, 32))
    dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2, drop_last=True)

    model = TrackNet(config=BASE_CONFIG)
    tx, _ = make_optimizer({"name": "Adadelta", "lr": 1.0, "rho": 0.9, "eps": 1e-6})
    pipe = TrainTrackNetPipeline(
        model, tx, mesh=make_mesh(1), sample_input_shape=(32, 64, 9))
    l1 = pipe.train(dl, steps_per_epoch=2)
    assert np.isfinite(l1)
    metrics = pipe.evaluate(dl)
    assert set(metrics) >= {"loss", "tp", "fp", "tn", "fn", "precision", "recall", "f1"}
    # steps_per_epoch cap respected
    l2 = pipe.train(dl, steps_per_epoch=1)
    assert np.isfinite(l2)

    # pad_last="wrap" eval (ONE compiled shape, train_tracknet.py default)
    # must score every window exactly once: identical metrics to the plain
    # ragged-tail loader, incl. the tail batch's loss-mean semantics
    n = len(ds)
    bs = 4 if n % 4 else 3  # force a partial tail batch
    assert n % bs != 0
    dl_plain = DataLoader(ds, batch_size=bs, shuffle=False, num_workers=2)
    dl_wrap = DataLoader(ds, batch_size=bs, shuffle=False, num_workers=2,
                         pad_last="wrap")
    m_plain = pipe.evaluate(dl_plain)
    m_wrap = pipe.evaluate(dl_wrap)
    for k in ("loss", "tp", "fp", "tn", "fn", "precision", "recall", "f1"):
        np.testing.assert_allclose(m_wrap[k], m_plain[k], rtol=1e-6, err_msg=k)


def test_tracknet_inference_image_dir(tmp_path, monkeypatch):
    """Image-sequence inference: sliding stacks over a frame folder.

    Regression: iterating the map-style dataset past len() used to yield
    ragged (short) stacks because list slices don't raise IndexError."""
    from vision_conglomerate_tpu.data.inference import TrackNetInferenceImgDataset
    from vision_conglomerate_tpu.infer.tracknet_runner import run_tracknet_inference
    from vision_conglomerate_tpu.models import TrackNet
    from vision_conglomerate_tpu.parallel import make_mesh
    from vision_conglomerate_tpu.train import TrainTrackNetPipeline, make_optimizer

    monkeypatch.chdir(tmp_path)
    clip = _write_clip(str(tmp_path / "tn"), n_frames=7, size=(64, 32))

    ds = TrackNetInferenceImgDataset(clip, img_ext="jpg", img_wh=(64, 32), num_stacks=3)
    assert len(list(iter(ds))) == len(ds) == 5  # iteration stops at len
    import pytest as _pytest
    with _pytest.raises(IndexError):
        ds[len(ds)]

    model = TrackNet(config=BASE_CONFIG)
    tx, _ = make_optimizer({"name": "Adadelta", "lr": 1.0})
    pipe = TrainTrackNetPipeline(model, tx, mesh=make_mesh(1),
                                 sample_input_shape=(32, 64, 9))
    pipe.best_model_dir = str(tmp_path / "best")
    pipe.save_best_model()
    config = {
        "model_config": BASE_CONFIG,
        "train_config": {
            "img_config": {"img_wh": [64, 32], "num_stacks": 3},
            "heatmap_threshold": 128,
        },
    }
    storage = run_tracknet_inference(
        path=clip, weights_path=str(tmp_path / "best" / "TrackNet.ckpt.tar"),
        config=config, batch_size=4, img_ext="jpg", with_summary=True,
        storage_path=str(tmp_path / "out"))
    assert os.path.exists(os.path.join(storage, "video.mp4"))


def test_tracknet_inference_video(tmp_path, monkeypatch):
    import cv2

    from vision_conglomerate_tpu.data import TrackNetDataset
    from vision_conglomerate_tpu.infer.tracknet_runner import run_tracknet_inference
    from vision_conglomerate_tpu.models import TrackNet
    from vision_conglomerate_tpu.parallel import make_mesh
    from vision_conglomerate_tpu.train import TrainTrackNetPipeline, make_optimizer

    monkeypatch.chdir(tmp_path)
    # tiny video
    vid_path = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 32))
    rng = np.random.default_rng(0)
    for _ in range(8):
        w.write((rng.uniform(size=(32, 64, 3)) * 255).astype(np.uint8))
    w.release()

    model = TrackNet(config=BASE_CONFIG)
    tx, _ = make_optimizer({"name": "Adadelta", "lr": 1.0})
    pipe = TrainTrackNetPipeline(model, tx, mesh=make_mesh(1),
                                 sample_input_shape=(32, 64, 9))
    pipe.best_model_dir = str(tmp_path / "best")
    pipe.save_best_model()
    weights = str(tmp_path / "best" / "TrackNet.ckpt.tar")

    config = {
        "model_config": BASE_CONFIG,
        "train_config": {
            "img_config": {"img_wh": [64, 32], "num_stacks": 3},
            "heatmap_threshold": 128,
        },
    }
    storage = run_tracknet_inference(
        path=vid_path, weights_path=weights, config=config,
        batch_size=4, with_summary=True, storage_path=str(tmp_path / "out"))
    assert os.path.exists(os.path.join(storage, "video.mp4"))
    assert os.path.exists(os.path.join(storage, "output.csv"))


def test_tracknet_inference_int8_ptq(tmp_path, monkeypatch):
    """--quantize int8: first-batch PTQ then int8 serving, same protocol as
    the detection runner. The heatmap decode must still produce a video +
    csv, and quantize without the deploy form must be rejected."""
    import pytest as _pytest

    from vision_conglomerate_tpu.infer.tracknet_runner import run_tracknet_inference
    from vision_conglomerate_tpu.models import TrackNet
    from vision_conglomerate_tpu.parallel import make_mesh
    from vision_conglomerate_tpu.train import TrainTrackNetPipeline, make_optimizer

    monkeypatch.chdir(tmp_path)
    clip = _write_clip(str(tmp_path / "tn"), n_frames=6, size=(64, 32))

    model = TrackNet(config=BASE_CONFIG)
    tx, _ = make_optimizer({"name": "Adadelta", "lr": 1.0})
    pipe = TrainTrackNetPipeline(model, tx, mesh=make_mesh(1),
                                 sample_input_shape=(32, 64, 9))
    pipe.best_model_dir = str(tmp_path / "best")
    pipe.save_best_model()
    weights = str(tmp_path / "best" / "TrackNet.ckpt.tar")
    config = {
        "model_config": BASE_CONFIG,
        "train_config": {
            "img_config": {"img_wh": [64, 32], "num_stacks": 3},
            "heatmap_threshold": 128,
        },
    }
    storage = run_tracknet_inference(
        path=clip, weights_path=weights, config=config, batch_size=4,
        img_ext="jpg", with_summary=True, quantize="int8",
        storage_path=str(tmp_path / "out_int8"))
    assert os.path.exists(os.path.join(storage, "video.mp4"))
    assert os.path.exists(os.path.join(storage, "output.csv"))

    with _pytest.raises(ValueError, match="reparam"):
        run_tracknet_inference(
            path=clip, weights_path=weights, config=config, quantize="int8",
            use_reparam=False, storage_path=str(tmp_path / "out_bad"))
