"""SegmentationNet: DetectionNet + YOLACT-style prototype branch.

Re-design of /root/reference/modules/segmentation.py:7-32. The proto module
runs on the highest-resolution neck map (n3, stride 8) and upsamples x2, so
protos come out at stride 4 (f=2 relative to YOLACT's f=4; see the reference
comment segmentation.py:20-30). Output: (preds, protos) where protos is NHWC
(B, H/4, W/4, K) — channels-last, unlike the reference's (B, K, H, W); mask
assembly is `sigmoid(protos @ coefs)` which maps to a single MXU matmul.
"""
from .detection import DetectionNet


class SegmentationNet(DetectionNet):
    with_proto_seg: bool = True
