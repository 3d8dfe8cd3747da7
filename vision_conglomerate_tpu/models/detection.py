"""DetectionNet: anchor-based detector (TPU-native re-design of
/root/reference/modules/detection.py:8-213).

Differences from the reference, by design:
- NHWC layout end to end; decode is a pure jittable function;
- anchors are flax params initialised from the provided anchor dict (the
  reference stores them as nn.Parameter so they ride in checkpoints,
  detection.py:36-38 — same here via the param pytree). NOTE: as in the
  reference, no gradient ever reaches them (train-mode decode does not use
  anchors; the loss detaches them), so `train_anchors` only controls whether
  the optimizer may touch them at all: train CLIs pass it to
  `make_optimizer(..., train_anchors=...)`, whose False path zeroes every
  anchor update (train/optim.py:_freeze_anchors_transform) — matching
  torch's requires_grad=False, where even weight decay can't shrink them.
  With True, torch semantics are likewise kept: a nonzero weight_decay
  decays the zero-grad anchors, exactly as torch Adam would;
- RepVGG deploy form is selected with `deploy=True` + params derived by
  `nn.reparam.reparameterize_params` (pure transform, no module mutation).

Reference quirks preserved (documented):
- stride vector is [h/ny, w/nx] and multiplies (x, y) in that order
  (detection.py:148-154): x scales by h/ny, y by w/nx. Identical to the sane
  formula whenever cell aspect is square (the shipped 640x640 configs);
- og-size rescale triggers only when BOTH dims differ (`and`,
  detection.py:76).
"""
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .. import registry
from ..nn.blocks import ProtoSegModule

Dtype = Any

ZERO_ANCHORS = {
    "sm": ((0.0, 0.0), (0.0, 0.0), (0.0, 0.0)),
    "md": ((0.0, 0.0), (0.0, 0.0), (0.0, 0.0)),
    "lg": ((0.0, 0.0), (0.0, 0.0), (0.0, 0.0)),
}


def make_2dgrid(nx: int, ny: int, dtype=jnp.float32) -> jnp.ndarray:
    """(1, ny, nx, 1, 2) grid of (x, y) cell indices (reference detection.py:192-196)."""
    xg, yg = jnp.meshgrid(jnp.arange(nx), jnp.arange(ny), indexing="xy")
    return jnp.stack([xg, yg], axis=2).reshape(1, ny, nx, 1, 2).astype(dtype)


def decode_scale(
    scale_pred: jnp.ndarray,
    anchors: jnp.ndarray,
    input_shape: Tuple[int, int],
    num_classes: int,
    num_masks: int = 0,
    num_keypoints: int = 0,
    inference: bool = False,
) -> jnp.ndarray:
    """Per-scale raw-head decode (reference detection.py:98-173).

    scale_pred: (B, ny, nx, na, 1 + C + 4 + K + 5*Kp); anchors: (na, 2) in 0-1.
    Train: xy = sig*2-0.5 (cell units), wh = (sig*2)^2 (anchor-relative).
    Inference: xy/wh mapped to input pixels.
    """
    _, ny, nx, _, _ = scale_pred.shape
    if inference:
        # decode in f32: bf16's 8-bit mantissa would quantize 640-px box
        # coordinates to ~2px. The head outputs are small (B, ny, nx, A, D)
        # so the upcast is cheap.
        scale_pred = scale_pred.astype(jnp.float32)
    bbox_i = num_classes + 1
    bbox_j = bbox_i + 4
    kp_i = bbox_j + num_masks

    objectness = scale_pred[..., :1]
    class_proba = scale_pred[..., 1:bbox_i]
    xy = jax.nn.sigmoid(scale_pred[..., bbox_i:bbox_i + 2]) * 2.0 - 0.5
    wh = jnp.square(jax.nn.sigmoid(scale_pred[..., bbox_i + 2:bbox_j]) * 2.0)

    masks_coefs = None
    if num_masks:
        masks_coefs = jnp.tanh(scale_pred[..., bbox_j:kp_i])

    keypoints = None
    if num_keypoints:
        kp = scale_pred[..., kp_i:]
        kp = kp.reshape(*kp.shape[:-1], -1, 5)
        kp_xy = jax.nn.sigmoid(kp[..., :2])  # bbox-relative 0-1
        kp_rest = kp[..., 2:]
        keypoints = (kp_xy, kp_rest)

    if inference:
        dtype = scale_pred.dtype
        # NOTE reference quirk: stride = [h/ny, w/nx] multiplies (x, y)
        # element-wise in that order (detection.py:148-154).
        stride = jnp.asarray([input_shape[0] / ny, input_shape[1] / nx], dtype=dtype)
        grid = make_2dgrid(nx, ny, dtype=dtype)
        xy = (xy + grid) * stride
        wh = wh * anchors.astype(dtype) * jnp.asarray([nx, ny], dtype=dtype) * stride
        if keypoints is not None:
            kp_xy, kp_rest = keypoints
            kp_xy = kp_xy * wh[..., None, :]
            kp_xy = kp_xy + (xy - wh / 2.0)[..., None, :]
            keypoints = (kp_xy, kp_rest)

    parts = [objectness, class_proba, xy, wh]
    if masks_coefs is not None:
        parts.append(masks_coefs)
    if keypoints is not None:
        kp_xy, kp_rest = keypoints
        kp = jnp.concatenate([kp_xy, kp_rest], axis=-1)
        parts.append(kp.reshape(*kp.shape[:-2], -1))
    return jnp.concatenate(parts, axis=-1)


def rescale_preds_to_size(
    pred: jnp.ndarray,
    from_wh: Tuple[int, int],
    to_wh: Tuple[int, int],
    num_classes: int,
    num_masks: int = 0,
) -> jnp.ndarray:
    """Rescale decoded boxes (+keypoint xy) to another image size
    (reference detection.py:175-190)."""
    box_i = 1 + num_classes
    box_j = box_i + 4
    kp_i = box_j + num_masks
    dtype = pred.dtype
    _from = jnp.asarray([from_wh[0], from_wh[1], from_wh[0], from_wh[1]], dtype=dtype)
    _to = jnp.asarray([to_wh[0], to_wh[1], to_wh[0], to_wh[1]], dtype=dtype)
    boxes = pred[..., box_i:box_j] / _from * _to
    head = jnp.concatenate([pred[..., :box_i], boxes, pred[..., box_j:kp_i]], axis=-1)
    kp = pred[..., kp_i:]
    if kp.shape[-1] == 0:
        return head
    kp = kp.reshape(*kp.shape[:-1], -1, 5)
    ones = jnp.ones(3, dtype=dtype)
    kp = kp / jnp.concatenate([_from[:2], ones]) * jnp.concatenate([_to[:2], ones])
    kp = kp.reshape(*pred.shape[:-1], -1)
    return jnp.concatenate([head, kp], axis=-1)


class DetectionNet(nn.Module):
    """Backbone + neck + 3 decoupled heads + per-scale decode.

    config is the reference `model_config` dict (backbone/neck/head names and
    their `<name>_config` blocks, resolved via the explicit registry).
    """

    num_classes: int
    config: Dict[str, Any]
    anchors: Optional[Dict[str, Any]] = None
    num_keypoints: Optional[int] = None
    deploy: bool = False
    dtype: Dtype = jnp.float32
    with_proto_seg: bool = False

    @property
    def num_anchors(self) -> int:
        anchors = self.anchors or ZERO_ANCHORS
        return len(anchors["sm"])

    @property
    def num_masks(self) -> int:
        return int(self.config.get("num_masks") or 0) if self.with_proto_seg else 0

    def neck_out_channels(self) -> Tuple[int, int, int, int]:
        bb_spec = registry.resolve(registry.BACKBONES, self.config["backbone"])
        bb_cfg = registry.component_config(self.config, self.config["backbone"])
        neck_spec = registry.resolve(registry.NECKS, self.config["neck"])
        neck_cfg = registry.component_config(self.config, self.config["neck"])
        bb_out = bb_spec.out_channels(**bb_cfg)
        return neck_spec.out_channels(bb_out, **neck_cfg)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        inference: bool = False,
        og_size: Optional[Tuple[int, int]] = None,
        raw_fields: bool = False,
    ):
        cfg = self.config
        anchors_init = self.anchors or ZERO_ANCHORS
        get_anchor = lambda k: self.param(  # noqa: E731
            f"{k}_anchors",
            lambda rng: jnp.asarray(anchors_init[k], dtype=jnp.float32),
        )
        sm_anchors = get_anchor("sm")
        md_anchors = get_anchor("md")
        lg_anchors = get_anchor("lg")

        bb_spec = registry.resolve(registry.BACKBONES, cfg["backbone"])
        bb_cfg = registry.component_config(cfg, cfg["backbone"])
        neck_spec = registry.resolve(registry.NECKS, cfg["neck"])
        neck_cfg = registry.component_config(cfg, cfg["neck"])
        head_spec = registry.resolve(registry.HEADS, cfg["head"])
        head_cfg = registry.component_config(cfg, cfg["head"])

        # model_config.remat: stage-granular rematerialization for training
        # (nn/blocks.maybe_remat) — checkpoint/variable-tree transparent, so
        # it is a runtime knob, not an architecture choice. Ignored by
        # components without a `remat` field.
        if cfg.get("remat") and "remat" not in bb_cfg:
            if "remat" in bb_spec.cls.__dataclass_fields__:
                bb_cfg = {**bb_cfg, "remat": True}
        if cfg.get("remat") and "remat" not in neck_cfg:
            if "remat" in neck_spec.cls.__dataclass_fields__:
                neck_cfg = {**neck_cfg, "remat": True}
        backbone = bb_spec.cls(**bb_cfg, dtype=self.dtype, name="backbone")
        if "deploy" in neck_spec.cls.__dataclass_fields__:
            neck = neck_spec.cls(**neck_cfg, deploy=self.deploy, dtype=self.dtype, name="neck")
        else:
            neck = neck_spec.cls(**neck_cfg, dtype=self.dtype, name="neck")

        x = x.astype(self.dtype)
        fmaps = backbone(x, train)
        _, n3, n4, n5 = neck(fmaps, train)

        heads_out = []
        for i, fm in enumerate((n3, n4, n5)):
            head = head_spec.cls(
                num_classes=self.num_classes,
                num_anchors=self.num_anchors,
                num_masks=(self.num_masks or None),
                num_keypoints=self.num_keypoints,
                **head_cfg,
                dtype=self.dtype,
                name=f"head_{i}",
            )
            heads_out.append(head(fm, train, raw_fields=raw_fields))

        if raw_fields:
            # serve-fast path (ops/serve_decode.py): per-scale field dicts +
            # anchors; the decode runs outside the module in a lanes-major
            # layout instead of the (A, D)-minor reference layout
            scale_fields = ({"sm": sm_anchors, "md": md_anchors, "lg": lg_anchors},
                            heads_out)
            if self.with_proto_seg:
                protos = ProtoSegModule(
                    out_channels=int(cfg["num_masks"]),
                    **dict(cfg.get("protos_config", {}) or {}),
                    dtype=self.dtype,
                    name="proto_seg_module",
                )(n3, train)
                return scale_fields, protos
            return scale_fields

        input_shape = (x.shape[1], x.shape[2])
        decode = lambda sp, a: decode_scale(  # noqa: E731
            sp, a, input_shape,
            num_classes=self.num_classes,
            num_masks=self.num_masks,
            num_keypoints=self.num_keypoints or 0,
            inference=inference,
        )
        sm_preds = decode(heads_out[0], sm_anchors)
        md_preds = decode(heads_out[1], md_anchors)
        lg_preds = decode(heads_out[2], lg_anchors)

        if not inference:
            preds = (sm_preds, md_preds, lg_preds)
        else:
            # reference quirk: rescale only when BOTH og dims differ (`and`,
            # detection.py:76).
            if og_size is not None and (og_size[0] != x.shape[1] and og_size[1] != x.shape[2]):
                from_wh = (x.shape[2], x.shape[1])
                to_wh = (og_size[1], og_size[0])
                rescale = lambda p: rescale_preds_to_size(  # noqa: E731
                    p, from_wh, to_wh, self.num_classes, self.num_masks)
                sm_preds = rescale(sm_preds)
                md_preds = rescale(md_preds)
                lg_preds = rescale(lg_preds)
            batch = x.shape[0]
            final_dim = self.num_classes + 5 + self.num_masks + (self.num_keypoints or 0) * 5
            preds = jnp.concatenate(
                [p.reshape(batch, -1, final_dim) for p in (sm_preds, md_preds, lg_preds)],
                axis=1,
            )

        if self.with_proto_seg:
            protos = ProtoSegModule(
                out_channels=int(cfg["num_masks"]),
                **dict(cfg.get("protos_config", {}) or {}),
                dtype=self.dtype,
                name="proto_seg_module",
            )(n3, train)
            return preds, protos
        return preds
