"""vision_conglomerate_tpu — a TPU-native (JAX/XLA/Pallas) vision framework.

A ground-up re-design of the capabilities of ches-001/vision-conglomerate
(anchor-based object detection, YOLACT-style instance segmentation, and
TrackNet small-object video tracking) for TPU hardware:

- models are pure flax.linen modules in NHWC layout (MXU/VPU friendly);
- losses are pure functions with *fixed-capacity masked* target assignment
  (no data-dependent shapes under jit);
- NMS / decode / metrics run on device;
- data parallelism is jax.sharding + shard_map with psum collectives over ICI;
- RepVGG re-parameterisation is a pure transform over the param pytree.

The YAML config schema of the reference (config/<task>/config.yaml +
anchors.yaml) is preserved as the public API; component names are resolved
through an explicit registry instead of getattr reflection.
"""

__version__ = "0.1.0"
