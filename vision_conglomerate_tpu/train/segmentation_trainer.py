"""Segmentation training pipeline.

Re-design of /root/reference/pipeline/segmentation_trainer.py:21-72: same
structure as detection, but batches are (imgs, labels, label_mask,
target_masks), the model also emits protos, and the loss is
segmentation_loss (box/conf/cls + prototype-mask term).
"""
from typing import Dict

import jax

from ..losses import SegmentationLossConfig, segmentation_loss
from .detection_trainer import TrainDetectionPipeline


class TrainSegmentationPipeline(TrainDetectionPipeline):
    task = "segmentation"

    def _loss_of(self, params, batch_stats, batch, train: bool, rng,
                 image_mask=None):
        imgs, labels, mask, target_masks = batch
        if imgs.dtype == jax.numpy.uint8:  # device-side /255
            imgs = imgs.astype(jax.numpy.float32) / 255.0
        if train:
            (preds, protos), mut = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                imgs, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            new_bs = mut["batch_stats"]
        else:
            preds, protos = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, imgs, train=False)
            new_bs = batch_stats
        loss, metrics = segmentation_loss(
            preds, labels, mask, protos, target_masks,
            self._anchors_of(params), self.loss_cfg,
            rng=jax.random.fold_in(rng, 7),  # cap_policy="random" rotation
            image_mask=image_mask)
        return loss, (metrics, new_bs)
