"""TrackNet inference driver: stacked frames -> heatmaps -> ball track video.

Re-design of /root/reference/inference_tracknet.py:23-224:
- model forward + argmax + resize to og size runs jitted on device; the
  default circle decode is the on-device thresholded-centroid decoder
  (ops/heatmap.py); decode="hough" selects the reference's cv2.HoughCircles
  path;
- per-batch gap filling via np.interp when at least half the frames have
  detections (inference_tracknet.py:71-75);
- fading trace of the last max_num_trace positions, thickness
  max_circle_thickness - j (inference_tracknet.py:84-89);
- the first num_stacks-1 lead-in frames are emitted with NaN tracks so the
  output video starts at frame 0 (inference_tracknet.py:40-51);
- mp4 + optional output.csv [frame, x, y, r] (inference_tracknet.py:147-152).
"""
import logging
import os
from datetime import datetime
from typing import Any, Dict, Optional

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

import jax
import jax.numpy as jnp
import pandas as pd

from ..data.inference import TrackNetInferenceImgDataset, TrackNetInferenceVideoDataset
from ..models import TrackNet
from ..nn.blocks import bn_folding
from ..nn.reparam import deploy_transform
from ..ops.heatmap import decode_heatmap_peaks
from ..train.checkpoint import load_checkpoint
from ..utils.image import load_and_process_img

logger = logging.getLogger(__name__)


def _adv_repvgg_canonical(model_config: Dict[str, Any]) -> bool:
    """True iff every RepVGG-bearing module config uses canonical
    (activation-free) branches -> full fusion is valid."""
    adv = model_config.get("advanced_arch_config", {}) or {}
    for section in ("encoder_config", "decoder_config"):
        for key, cfg in (adv.get(section, {}) or {}).items():
            if "repbipan" in key and (cfg or {}).get("repvgg_branch_act", "silu") is not None:
                return False
    return True


def load_tracknet_model(weights_path: str, model_config: Dict[str, Any],
                        use_reparam: bool = True, dtype=jnp.bfloat16):
    """Returns (model, variables, folded). RepVGG blocks exist only in the
    advanced arch; BN folding applies to both archs."""
    manifest = load_checkpoint(weights_path)
    net = manifest["NETWORK_PARAMS"]
    params, batch_stats = net["params"], net.get("batch_stats", {})
    fuse_repvgg = (
        use_reparam
        and model_config.get("architecture") == "advanced"
        and _adv_repvgg_canonical(model_config)
    )
    if use_reparam:
        params, batch_stats = deploy_transform(
            params, batch_stats, fuse_repvgg=fuse_repvgg)
    model = TrackNet(config=model_config, deploy=fuse_repvgg, dtype=dtype)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    if batch_stats:
        variables["batch_stats"] = jax.tree_util.tree_map(jnp.asarray, batch_stats)
    return model, variables, use_reparam


def _hough_decode_batch(heatmaps: np.ndarray, threshold: int,
                        hough_kwargs: Dict[str, Any]):
    kwargs = dict(method=cv2.HOUGH_GRADIENT, dp=1, minDist=1, param1=50,
                  param2=2, minRadius=2, maxRadius=7)
    kwargs.update(hough_kwargs or {})
    if isinstance(kwargs.get("method"), str):
        kwargs["method"] = getattr(cv2, kwargs["method"])
    out = np.full((heatmaps.shape[0], 3), np.nan)
    for i in range(heatmaps.shape[0]):
        hm = heatmaps[i].copy()
        hm[hm < threshold] = 0
        hm[hm >= threshold] = 255
        circles = cv2.HoughCircles(hm, **kwargs)
        if circles is not None and len(circles) == 1:
            out[i] = circles[0][0][:3]
    return out


def run_tracknet_inference(
    path: str,
    weights_path: str,
    config: Dict[str, Any],
    batch_size: int = 32,
    fps: int = 30,
    img_ext: str = "jpg",
    frame_skips: int = 0,
    with_summary: bool = False,
    max_num_trace: int = 5,
    max_circle_thickness: int = 10,
    decode: Optional[str] = None,
    use_reparam: bool = True,
    storage_path: Optional[str] = None,
    quantize: Optional[str] = None,  # None | "int8" (PTQ on the first batch,
    # same protocol as the detection runner — see nn/quantize.py)
):
    tc = config["train_config"]
    img_cfg = tc["img_config"]
    num_stacks = int(img_cfg.get("num_stacks", 3))
    img_wh = tuple(img_cfg["img_wh"])
    threshold = int(tc.get("heatmap_threshold", 128))
    decode = decode or tc.get("heatmap_decode", "centroid")

    storage = storage_path or os.path.join(
        "outputs", "tracknet", str(datetime.now()).replace(":", "_"))
    os.makedirs(storage, exist_ok=True)

    if os.path.isdir(path):
        dataset = TrackNetInferenceImgDataset(
            path, img_ext=img_ext, img_wh=img_wh, num_stacks=num_stacks)
        lead_in = [load_and_process_img(p, None, scale=False)
                   for p in dataset.img_files[:num_stacks - 1]]
    elif os.path.isfile(path) and path.endswith(("avi", "mkv", "mp4")):
        dataset = TrackNetInferenceVideoDataset(
            path, img_wh=img_wh, num_stacks=num_stacks, frame_skips=frame_skips)
        lead_in = []
        cap = cv2.VideoCapture(path)
        for _ in range(num_stacks - 1):
            ok, frame = cap.read()
            if ok:
                lead_in.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        cap.release()
    else:
        raise OSError(f"{path} not found or unsupported")

    if quantize not in (None, "none", "int8"):
        raise ValueError(f"unknown quantize mode: {quantize!r}")
    if quantize == "int8" and not use_reparam:
        raise ValueError("--quantize int8 requires the deploy (reparam) form; "
                         "drop --no_reparam")
    model, variables, folded = load_tracknet_model(
        weights_path, config["model_config"], use_reparam=use_reparam)

    fwd_cache = {}
    quantize_pending = quantize == "int8"
    int8_on = False

    def forward(stacked: np.ndarray, og_hw):
        nonlocal variables, quantize_pending, int8_on
        if quantize_pending:  # PTQ calibrated on the first real batch
            from .runner import quantize_model_int8
            variables = quantize_model_int8(
                model, variables, stacked, og_size=og_hw)
            int8_on, quantize_pending = True, False
            fwd_cache.clear()
        key = (stacked.shape, og_hw)
        if key not in fwd_cache:
            from ..nn.quantize import int8_serving
            local_vars, local_int8 = variables, int8_on

            def f(x):
                with bn_folding(folded), int8_serving(local_int8):
                    return model.apply(local_vars, x, train=False, inference=True,
                                       og_size=og_hw)
            fwd_cache[key] = jax.jit(f)
        return fwd_cache[key](jnp.asarray(stacked))

    vwriter = None
    summary_rows = {"x": [], "y": [], "r": []}

    def write_frame(img_rgb, tracks, idx_in_clip, all_tracks):
        nonlocal vwriter
        img = cv2.cvtColor(np.ascontiguousarray(img_rgb), cv2.COLOR_RGB2BGR)
        for j in range(max_num_trace):
            if (idx_in_clip - j) <= 0:
                break
            t = all_tracks[idx_in_clip - j]
            if not np.isnan(t[0]):
                x, y = int(t[0]), int(t[1])
                img = cv2.circle(img, (x, y), radius=0, color=(100, 100, 255),
                                 thickness=max_circle_thickness - j)
        vwriter.write(img)

    all_tracks = []  # global list of (x, y, r) incl. lead-in NaNs
    frames_buffer = []  # og frames pending write (aligned with all_tracks)

    for og in lead_in:
        all_tracks.append([np.nan] * 3)
        frames_buffer.append(og)

    batch_i, batch_o = [], []

    def flush_batch():
        nonlocal batch_i, batch_o
        if not batch_i:
            return
        stacked = np.stack(batch_i)
        ogs = batch_o
        og_hw = (ogs[0].shape[0], ogs[0].shape[1])
        heatmaps = np.asarray(forward(stacked, og_hw))
        if decode == "hough":
            tracks = _hough_decode_batch(heatmaps, threshold, tc.get("hough_grad_config", {}))
        else:
            cx, cy, r, found = decode_heatmap_peaks(jnp.asarray(heatmaps), threshold=threshold)
            tracks = np.stack([np.asarray(cx), np.asarray(cy), np.asarray(r)], axis=1)
            tracks[~np.asarray(found)] = np.nan
        # per-batch gap fill (reference inference_tracknet.py:71-75)
        not_nan = ~np.isnan(tracks[:, 0])
        idxs = np.linspace(0, tracks.shape[0] - 1, num=tracks.shape[0])
        if np.any(not_nan) and not_nan.sum() >= not_nan.shape[0] // 2:
            for c in range(3):
                tracks[:, c] = np.interp(idxs, idxs[not_nan], tracks[:, c][not_nan])
        for t, og in zip(tracks, ogs):
            all_tracks.append(list(t))
            frames_buffer.append(og)
        batch_i, batch_o = [], []

    for stacked, og in dataset:
        batch_i.append(stacked)
        batch_o.append(og)
        if len(batch_i) == batch_size:
            flush_batch()
    flush_batch()

    tracks_arr = np.asarray(all_tracks) if all_tracks else np.zeros((0, 3))
    for idx, og in enumerate(frames_buffer):
        if vwriter is None:
            h, w = og.shape[0], og.shape[1]
            vwriter = cv2.VideoWriter(
                os.path.join(storage, "video.mp4"),
                fourcc=cv2.VideoWriter_fourcc(*"mp4v"), fps=fps, frameSize=(w, h))
        write_frame(og, tracks_arr[idx], idx, tracks_arr)
        if with_summary:
            summary_rows["x"].append(tracks_arr[idx][0])
            summary_rows["y"].append(tracks_arr[idx][1])
            summary_rows["r"].append(tracks_arr[idx][2])

    if vwriter is not None:
        vwriter.release()
    if with_summary:
        df = pd.DataFrame.from_dict(summary_rows)
        df["frame"] = range(1, df.shape[0] + 1)
        df = df[["frame", "x", "y", "r"]].dropna(axis=0)
        df.to_csv(os.path.join(storage, "output.csv"), index=False)
    logger.info(f"outputs written to {storage}")
    return storage
