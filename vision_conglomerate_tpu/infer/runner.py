"""Detection / segmentation inference driver.

Re-design of /root/reference/inference_det.py + inference_seg.py for TPU:
- the model forward + decode + NMS + (for segmentation) mask assembly run as
  ONE jitted program per (batch, og_size) shape; only fixed-capacity
  (<=K) results cross to host;
- the deploy (RepVGG-fused) form of the network is used by default — the
  reference defines reparameterisation but its shipped CLIs never invoke it
  (detection.py:204-213 vs inference_det.py:286); here it is the default
  serving path (disable with use_reparam=False);
- ByteTrack association, drawing and CSV summaries remain host-side
  (sequential per-frame logic, SURVEY §2.2).

Output artifacts mirror the reference: outputs/<task>/<datetime>/ with
img_<n>.png or video.mp4 + optional output.csv summary.
"""
import json
import logging
import os
import queue
import threading
from datetime import datetime
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

import jax
import jax.numpy as jnp

from ..data.inference import (
    InferenceImgDataset,
    InferenceVideoDataset,
    SingleImgSample,
)
from ..models import DetectionNet, SegmentationNet
from ..nn.blocks import bn_folding
from ..nn.reparam import deploy_transform
from ..ops.postprocess import assemble_instance_masks, postprocess_detections
from ..tools.bytetrack import ByteTrack, Detections
from ..train.checkpoint import load_checkpoint
from ..utils.drawing import (
    apply_bboxes,
    apply_bboxes_from_tracks,
    apply_keypoints,
    apply_segments,
    detection_summary_df,
)
from ..utils.labels import xyxy2xywh_np

logger = logging.getLogger(__name__)


def load_classmap(path: str) -> Optional[List[Dict[str, Any]]]:
    """classmap/<task>/classmap.json; first entry (supercategory header)
    skipped via [1:] (reference inference_det.py:189-192)."""
    if os.path.isfile(path):
        with open(path, "r") as f:
            return json.load(f)[1:]
    return None


def load_detection_model(
    weights_path: str,
    model_config: Dict[str, Any],
    task: str = "detection",
    num_keypoints: Optional[int] = None,
    use_reparam: bool = True,
    dtype=jnp.bfloat16,
):
    """Rebuild the net from checkpoint + config; optionally derive the
    RepVGG deploy form. Returns (model, variables, num_classes)."""
    manifest = load_checkpoint(weights_path)
    num_classes = int(manifest["NUM_CLASSES"])
    net = manifest["NETWORK_PARAMS"]
    params = net["params"]
    batch_stats = net.get("batch_stats", {})

    cls = SegmentationNet if task == "segmentation" else DetectionNet
    # full RepVGG fusion only for canonical (activation-free-branch) blocks;
    # reference-parity blocks (the default) deploy via BN folding only
    neck_cfg = model_config.get(model_config.get("neck", "").lower() + "_config", {}) or {}
    fuse_repvgg = use_reparam and neck_cfg.get("repvgg_branch_act", "silu") is None
    if use_reparam:
        params, batch_stats = deploy_transform(
            params, batch_stats, fuse_repvgg=fuse_repvgg)
    model = cls(
        num_classes=num_classes,
        config=model_config,
        anchors=None,  # anchors ride in the checkpointed params
        num_keypoints=num_keypoints,
        deploy=fuse_repvgg,
        dtype=dtype,
    )
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    if batch_stats:
        variables["batch_stats"] = jax.tree_util.tree_map(jnp.asarray, batch_stats)
    return model, variables, num_classes


def _make_forward(model, variables, folded: bool, int8: bool = False):
    # og rescale is static per og-size; cache one jitted program per
    # (batch shape, og size)
    from ..nn.quantize import int8_serving

    cache = {}

    def forward(imgs: np.ndarray, og_hw: Tuple[int, int]):
        key = (imgs.shape, tuple(og_hw))
        if key not in cache:
            def f(x):
                with bn_folding(folded), int8_serving(int8):
                    return model.apply(
                        variables, x, train=False, inference=True, og_size=tuple(og_hw))
            cache[key] = jax.jit(f)
        return cache[key](jnp.asarray(imgs))

    return forward


def _prefetch_batches(gen, depth: int = 2):
    """Overlap host decode + H2D with device compute for the serving loop.

    A background thread pulls (imgs, ogs) batches from `gen` (cv2/PIL decode
    releases the GIL) and starts their async device_put, `depth` batches
    ahead of the consumer. Yields (imgs_host, imgs_device, ogs) — the host
    copy stays available for PTQ calibration and save_og_size=False drawing.
    Disable with VCT_INFER_PREFETCH=0 (the A/B baseline: decode, transfer and
    compute fully serialized, the pre-round-3 behavior)."""
    if os.environ.get("VCT_INFER_PREFETCH", "1") == "0":
        for imgs, ogs in gen:
            yield imgs, imgs, ogs
        return
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    SENTINEL = object()
    stop = threading.Event()  # consumer-gone flag: unblocks a full-queue put

    def _put(item) -> bool:
        # bounded-timeout put so the worker can't block forever on a consumer
        # that stopped iterating (early error/break in the serve loop would
        # otherwise leak the thread + its queued device batches + the open
        # input generator)
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            try:
                for imgs, ogs in gen:
                    if not _put((imgs, jax.device_put(imgs), ogs)):
                        return
            finally:
                close = getattr(gen, "close", None)
                if close is not None:
                    close()  # release video capture / file handles promptly
        except BaseException as e:  # surface decode errors in the consumer
            _put((SENTINEL, e, None))
            return
        _put((SENTINEL, None, None))

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()
    try:
        while True:
            imgs, dev, ogs = q.get()
            if imgs is SENTINEL:
                if dev is not None:
                    raise dev
                return
            yield imgs, dev, ogs
    finally:
        stop.set()
        # drain until the worker exits: a q.put already inside its 0.1 s
        # timeout window when stop was set can still enqueue one item, so a
        # single drain pass could leave a device-buffer-holding batch queued
        # until GC (ADVICE r3) — drain/join in a short loop instead.
        while True:
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            thread.join(timeout=0.2)
            if not thread.is_alive():
                break
        try:  # final sweep after the worker exited
            while True:
                q.get_nowait()
        except queue.Empty:
            pass


def quantize_model_int8(model, variables, calib_imgs, **apply_kwargs):
    """PTQ: calibrate activation scales on `calib_imgs` (normalized floats,
    the serve input), quantize the folded conv params to int8. Returns the
    int8 variables; apply them under int8_serving()."""
    from ..nn.quantize import collect_calibration, int8_quantize_params

    absmax = collect_calibration(
        model, variables, [jnp.asarray(calib_imgs)], inference=True,
        **apply_kwargs)
    qv = dict(variables)
    qv["params"] = int8_quantize_params(variables["params"], absmax)
    return qv


def run_detection_inference(
    path: str,
    weights_path: str,
    config: Dict[str, Any],
    task: str = "detection",
    batch_size: int = 32,
    iou_threshold: float = 0.35,
    score_threshold: float = 0.3,
    fps: int = 30,
    with_summary: bool = False,
    tracked_classes: Optional[List[int]] = None,
    frame_skips: int = 0,
    box_allowance: float = 4.0,
    save_og_size: bool = True,
    use_reparam: bool = True,
    max_detections: int = 300,
    storage_path: Optional[str] = None,
    quantize: Optional[str] = None,  # None | "int8" (PTQ; calibrates on the
    # first batch of the actual input — see nn/quantize.py)
    crop_masks: bool = False,  # beyond-reference: crop assembled masks to
    # their predicted boxes (see ops/postprocess.assemble_instance_masks)
    out_ext: str = "png",  # annotated-image format; "png" is the reference's
    # format (inference_det.py:157-158) but PNG encode is the dominant host
    # cost of directory serving on small hosts (135 vs 6 ms/img at 720p,
    # docs/PERF.md end-to-end serving) — "jpg" is the fast opt-in
):
    """End-to-end CLI driver (reference inference_det.py run/evaluate_frames,
    :168-311). `save_og_size` implements the flag the reference documents in
    its readme (readme.md:32) but never wired up: when False, outputs are
    rendered at network resolution instead of the original image size."""
    model_config = config["model_config"]
    img_wh = tuple(config["train_config"]["img_config"]["img_wh"])
    num_keypoints = model_config.get("num_keypoints") or None
    num_masks = int(model_config.get("num_masks") or 0) if task == "segmentation" else 0

    storage = storage_path or os.path.join(
        "outputs", task, str(datetime.now()).replace(":", "_"))
    os.makedirs(storage, exist_ok=True)
    classmap = load_classmap(os.path.join("classmap", task, "classmap.json"))

    is_video = False
    if os.path.isdir(path):
        dataset = InferenceImgDataset(
            path, img_exts=["png", "jpg", "jpeg"], img_wh=img_wh)
    elif os.path.isfile(path):
        if path.endswith(("avi", "mkv", "mp4")):
            is_video = True
            dataset = InferenceVideoDataset(path, img_wh=img_wh, frame_skips=frame_skips)
        elif path.endswith(("png", "jpg", "jpeg")):
            dataset = SingleImgSample(path, img_wh)
        else:
            raise OSError(f"unsupported file type: {path}")
    else:
        raise OSError(f"{path} not found")

    if quantize not in (None, "none", "int8"):
        raise ValueError(f"unknown quantize mode: {quantize!r}")
    if out_ext not in ("png", "jpg", "jpeg"):
        raise ValueError(f"unknown out_ext: {out_ext!r} (png|jpg|jpeg)")
    if quantize == "int8" and not use_reparam:
        raise ValueError("--quantize int8 requires the deploy (reparam) form; "
                         "drop --no_reparam")
    model, variables, num_classes = load_detection_model(
        weights_path, model_config, task=task,
        num_keypoints=num_keypoints, use_reparam=use_reparam)
    forward = _make_forward(model, variables, folded=use_reparam)
    quantize_pending = quantize == "int8"

    tracker = ByteTrack(
        track_activation_threshold=0.35,
        lost_track_buffer=30,
        minimum_matching_threshold=0.85,
        frame_rate=30,
        minimum_consecutive_frames=1,
    ) if is_video else None

    colormap = np.random.randint(0, 255, size=(num_classes, 3))
    vwriter = None
    summaries = []
    start_idx = 0

    def batches():
        if isinstance(dataset, SingleImgSample):
            img, og = dataset[0]
            yield np.stack([img]), np.stack([og])
        elif isinstance(dataset, InferenceImgDataset):
            buf_i, buf_o = [], []
            for i in range(len(dataset)):
                img, og = dataset[i]
                if buf_o and og.shape != buf_o[0].shape:
                    yield np.stack(buf_i), np.stack(buf_o)
                    buf_i, buf_o = [], []
                buf_i.append(img)
                buf_o.append(og)
                if len(buf_i) == batch_size:
                    yield np.stack(buf_i), np.stack(buf_o)
                    buf_i, buf_o = [], []
            if buf_i:
                yield np.stack(buf_i), np.stack(buf_o)
        else:
            buf_i, buf_o = [], []
            for img, og in dataset:
                buf_i.append(img)
                buf_o.append(og)
                if len(buf_i) == batch_size:
                    yield np.stack(buf_i), np.stack(buf_o)
                    buf_i, buf_o = [], []
            if buf_i:
                yield np.stack(buf_i), np.stack(buf_o)

    for imgs, dev_imgs, ogs in _prefetch_batches(batches()):
        if quantize_pending:  # PTQ on the first real batch, then serve int8
            variables = quantize_model_int8(model, variables, imgs)
            forward = _make_forward(model, variables, folded=use_reparam, int8=True)
            quantize_pending = False
        og_hw = (ogs.shape[1], ogs.shape[2]) if save_og_size else (imgs.shape[1], imgs.shape[2])
        out = forward(dev_imgs, og_hw)
        protos = None
        if task == "segmentation":
            preds, protos = out
        else:
            preds = out
        post = postprocess_detections(
            preds,
            num_classes=num_classes,
            num_masks=num_masks,
            num_keypoints=num_keypoints or 0,
            iou_threshold=iou_threshold,
            score_threshold=score_threshold,
            box_allowance=box_allowance,
            max_detections=max_detections,
        )
        inst_masks = None
        if task == "segmentation":
            inst_masks = np.asarray(assemble_instance_masks(
                protos, post.mask_coefs, og_size=og_hw,
                boxes_xyxy=post.boxes_xyxy if crop_masks else None))

        boxes_np = np.asarray(post.boxes_xyxy)
        scores_np = np.asarray(post.scores)
        classes_np = np.asarray(post.classes)
        valid_np = np.asarray(post.valid)
        kp_np = np.asarray(post.keypoints)

        if is_video and vwriter is None:
            h, w = (ogs.shape[1], ogs.shape[2]) if save_og_size else (imgs.shape[1], imgs.shape[2])
            vwriter = cv2.VideoWriter(
                os.path.join(storage, "video.mp4"),
                fourcc=cv2.VideoWriter_fourcc(*"mp4v"), fps=fps, frameSize=(w, h))

        for i in range(imgs.shape[0]):
            frame_no = start_idx + i
            v = valid_np[i]
            boxes = np.concatenate(
                [scores_np[i][:, None], classes_np[i][:, None].astype(np.float32),
                 boxes_np[i]], axis=-1)[v]
            kp = kp_np[i][v]
            masks_i = inst_masks[i][v] if inst_masks is not None else None
            if tracked_classes:
                sel = np.isin(boxes[:, 1], tracked_classes)
                boxes = boxes[sel]
                kp = kp[sel]
                if masks_i is not None:
                    masks_i = masks_i[sel]
            if boxes.shape[0] == 0:
                logger.info(f"frame {frame_no} has no detected boxes")
                if vwriter is not None:
                    img = ogs[i] if save_og_size else (imgs[i] * 255).astype(np.uint8)
                    vwriter.write(cv2.cvtColor(np.ascontiguousarray(img), cv2.COLOR_RGB2BGR))
                continue
            img = ogs[i] if save_og_size else (imgs[i] * 255).astype(np.uint8)
            img = np.ascontiguousarray(img)
            draw_kwargs = dict(colormap=colormap, box_thickness=2,
                               text_thickness=1, classmap=classmap)

            if masks_i is not None and masks_i.shape[0] > 0:
                img = apply_segments(img, masks_i.astype(np.uint8))

            if tracker is None:
                img = apply_bboxes(img, boxes, **draw_kwargs)
                out_boxes = boxes
                if kp.shape[-2:] != (0, 3) and kp.size:
                    img = apply_keypoints(img, kp.reshape(-1, 3))
            else:
                # keypoints ride the tracker as a data payload so the kept/
                # reordered rows keep their kp sets, exactly like the
                # reference's sv.Detections data dict
                # (/root/reference/inference_det.py:130-144). Unlike the
                # reference, kp was filtered by tracked_classes above
                # together with the boxes (the reference filters only boxes
                # there, which would misalign the payload — latent bug).
                has_kp = kp.shape[-2:] != (0, 3) and kp.size
                det = Detections(
                    xyxy=boxes[:, 2:], confidence=boxes[:, 0],
                    class_id=boxes[:, 1].astype(int),
                    data={"keypoints": kp} if has_kp else None)
                det = tracker.update_with_detections(det)
                if len(det) == 0:
                    logger.info(f"frame {frame_no} has no tracked detections")
                    if vwriter is not None:
                        vwriter.write(cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
                    continue
                tracks = np.concatenate([
                    det.tracker_id[:, None].astype(np.float32),
                    det.confidence[:, None],
                    det.class_id[:, None].astype(np.float32),
                    det.xyxy], axis=-1)
                img, out_boxes = apply_bboxes_from_tracks(img, tracks, **draw_kwargs)
                tracked_kp = (det.data or {}).get("keypoints")
                if tracked_kp is not None and tracked_kp.size:
                    img = apply_keypoints(img, tracked_kp.reshape(-1, 3))

            if with_summary and out_boxes is not None and len(out_boxes):
                out_boxes = np.array(out_boxes, dtype=np.float64, copy=True)
                out_boxes[:, -4:] = xyxy2xywh_np(out_boxes[:, -4:])
                df = detection_summary_df(out_boxes, classmap=classmap)
                if df is not None:
                    df.insert(0, "frame", np.full(df.shape[0], frame_no, dtype=int))
                    summaries.append(df)

            if vwriter is None:
                from PIL import Image
                Image.fromarray(img).save(
                    os.path.join(storage, f"img_{frame_no}.{out_ext}"),
                    **({"quality": 90} if out_ext in ("jpg", "jpeg") else {}))
            else:
                vwriter.write(cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        start_idx += imgs.shape[0]

    if vwriter is not None:
        vwriter.release()
    if summaries:
        import pandas as pd
        pd.concat(summaries, axis=0).to_csv(os.path.join(storage, "output.csv"), index=False)
    logger.info(f"outputs written to {storage}")
    return storage
