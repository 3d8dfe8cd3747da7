"""TrackNet: small-fast-object heatmap network on stacked video frames.

TPU-native re-design of /root/reference/modules/tracknet.py:9-214. Input is
3*num_stacks channels (stacked RGB frames, newest first); output is a
(B, H, W, 256) per-pixel 256-way classification over heatmap intensity.

`base` arch: VGG-ish encoder (13 convs, 3 maxpools) + skip-concat decoder.
`advanced` arch: any two registered encoder modules (e.g. CSPNet+RepBiPAN)
and two decoder modules (DeconvRepBiPAN+DeconvCSPNet), resolved by name.
"""
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .. import registry
from ..nn.blocks import ConvBNorm, maybe_remat
from ..ops.resize import resize_nhwc

Dtype = Any


class BaseTrackNetEncoder(nn.Module):
    """VGG-style encoder emitting fmaps at strides 1/2/4/8 (reference tracknet.py:9-41).

    NOTE (reference quirk, preserved): the skip taps are at module indices
    [1, 3, 6] (tracknet.py:35) — i.e. after the FIRST conv of stages 2 and 3,
    not the last. The reference's declared out_fmaps_channels [co1, co3, co6]
    (tracknet.py:31) only matches those taps because co2==co3 and co4==co6
    numerically at every width.
    """

    width_multiple: float = 1.0
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Sequence[jnp.ndarray]:
        co = [max(round(c * self.width_multiple), 1)
              for c in [64, 64, 128, 128, 256, 256, 256, 512, 512, 512]]
        Conv = maybe_remat(ConvBNorm, self.remat)
        conv = lambda c, name: Conv(  # noqa: E731
            c, 3, 1, 1, activation="relu", dtype=self.dtype, name=name)
        pool = lambda t: nn.max_pool(t, (2, 2), strides=(2, 2))  # noqa: E731

        fmaps = []
        x = conv(co[0], "enc_0")(x, train)
        x = conv(co[1], "enc_1")(x, train)
        fmaps.append(x)                        # tap @ idx 1
        x = pool(x)
        x = conv(co[2], "enc_3")(x, train)
        fmaps.append(x)                        # tap @ idx 3 (reference quirk)
        x = conv(co[3], "enc_4")(x, train)
        x = pool(x)
        x = conv(co[4], "enc_6")(x, train)
        fmaps.append(x)                        # tap @ idx 6 (reference quirk)
        x = conv(co[5], "enc_7")(x, train)
        x = conv(co[6], "enc_8")(x, train)
        x = pool(x)
        x = conv(co[7], "enc_10")(x, train)
        x = conv(co[8], "enc_11")(x, train)
        x = conv(co[9], "enc_12")(x, train)
        fmaps.append(x)
        return fmaps


class BaseTrackNetDecoder(nn.Module):
    """Skip-concat decoder back to full resolution (reference tracknet.py:44-77)."""

    out_channels: int = 256
    width_multiple: float = 1.0
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fmaps: Sequence[jnp.ndarray], train: bool = False) -> jnp.ndarray:
        co = [max(round(c * self.width_multiple), 1)
              for c in [256, 256, 256, 126, 128, 64, 64]]
        Conv = maybe_remat(ConvBNorm, self.remat)
        conv = lambda c, name: Conv(  # noqa: E731
            c, 3, 1, 1, activation="relu", dtype=self.dtype, name=name)

        x = fmaps[3]
        x = resize_nhwc(x, scale=2.0, method="nearest")
        x = jnp.concatenate([x, fmaps[2]], axis=-1)
        x = conv(co[0], "dec_2")(x, train)
        x = conv(co[1], "dec_3")(x, train)
        x = conv(co[2], "dec_4")(x, train)
        x = resize_nhwc(x, scale=2.0, method="nearest")
        x = jnp.concatenate([x, fmaps[1]], axis=-1)
        x = conv(co[3], "dec_7")(x, train)
        x = conv(co[4], "dec_8")(x, train)
        x = resize_nhwc(x, scale=2.0, method="nearest")
        x = jnp.concatenate([x, fmaps[0]], axis=-1)
        x = conv(co[5], "dec_11")(x, train)
        x = conv(co[6], "dec_12")(x, train)
        x = ConvBNorm(self.out_channels, 3, 1, 1, activation="relu",
                      no_batchnorm=True, dtype=self.dtype, name="dec_13")(x, train)
        return x


class AdvTrackNetEncoder(nn.Module):
    """Composes two registered encoder modules (reference tracknet.py:80-103)."""

    encoder_modules: Tuple[str, str]
    config: Dict[str, Any]
    deploy: bool = False
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Sequence[jnp.ndarray]:
        assert len(self.encoder_modules) == 2
        out = x
        for i, name in enumerate(self.encoder_modules):
            spec = registry.resolve(registry.TRACKNET_MODULES, name)
            cfg = registry.component_config(self.config, name)
            kwargs = dict(cfg)
            if "deploy" in spec.cls.__dataclass_fields__:
                kwargs["deploy"] = self.deploy
            if self.remat and "remat" in spec.cls.__dataclass_fields__:
                kwargs.setdefault("remat", True)
            mod = spec.cls(**kwargs, dtype=self.dtype, name=f"enc_module_p{i + 1}")
            out = mod(out, train)
        return out


class AdvTrackNetDecoder(nn.Module):
    """Composes two registered decoder modules (reference tracknet.py:106-131)."""

    out_channels: int
    decoder_modules: Tuple[str, str]
    config: Dict[str, Any]
    deploy: bool = False
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fmaps: Sequence[jnp.ndarray], train: bool = False) -> jnp.ndarray:
        assert len(self.decoder_modules) == 2
        spec1 = registry.resolve(registry.TRACKNET_MODULES, self.decoder_modules[0])
        cfg1 = dict(registry.component_config(self.config, self.decoder_modules[0]))
        if "deploy" in spec1.cls.__dataclass_fields__:
            cfg1["deploy"] = self.deploy
        if self.remat and "remat" in spec1.cls.__dataclass_fields__:
            cfg1.setdefault("remat", True)
        out = spec1.cls(**cfg1, dtype=self.dtype, name="dec_module_p1")(fmaps, train)

        spec2 = registry.resolve(registry.TRACKNET_MODULES, self.decoder_modules[1])
        cfg2 = dict(registry.component_config(self.config, self.decoder_modules[1]))
        if "deploy" in spec2.cls.__dataclass_fields__:
            cfg2["deploy"] = self.deploy
        if self.remat and "remat" in spec2.cls.__dataclass_fields__:
            cfg2.setdefault("remat", True)
        out = spec2.cls(out_channels=self.out_channels, **cfg2,
                        dtype=self.dtype, name="dec_module_p2")(out, train)
        return out


class TrackNet(nn.Module):
    """Heatmap tracker (reference tracknet.py:134-214).

    __call__(x NHWC float, train, inference, og_size):
      train/eval -> (B, H, W, 256) logits;
      inference  -> (B, H, W) uint8 intensity heatmap via argmax, optionally
                    antialias-resized to og_size.
    """

    config: Dict[str, Any]
    deploy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        inference: bool = False,
        og_size: Optional[Tuple[int, int]] = None,
    ) -> jnp.ndarray:
        arch = self.config["architecture"]
        remat = bool(self.config.get("remat", False))
        x = x.astype(self.dtype)
        if arch == "base":
            cfg = self.config["base_arch_config"]
            enc_cfg = dict(cfg.get("encoder_config", {}) or {})
            dec_cfg = dict(cfg.get("decoder_config", {}) or {})
            if remat:
                enc_cfg.setdefault("remat", True)
                dec_cfg.setdefault("remat", True)
            fmaps = BaseTrackNetEncoder(
                **enc_cfg, dtype=self.dtype, name="encoder"
            )(x, train)
            y = BaseTrackNetDecoder(
                256, **dec_cfg, dtype=self.dtype, name="decoder"
            )(fmaps, train)
        elif arch == "advanced":
            cfg = self.config["advanced_arch_config"]
            fmaps = AdvTrackNetEncoder(
                tuple(cfg["encoder_modules"]), cfg.get("encoder_config", {}) or {},
                deploy=self.deploy, remat=remat, dtype=self.dtype, name="encoder",
            )(x, train)
            y = AdvTrackNetDecoder(
                256, tuple(cfg["decoder_modules"]), cfg.get("decoder_config", {}) or {},
                deploy=self.deploy, remat=remat, dtype=self.dtype, name="decoder",
            )(fmaps, train)
        else:
            raise ValueError(
                f"Only base and advanced architectures are supported, got {arch}")

        if inference:
            hm = jnp.argmax(y, axis=3).astype(jnp.uint8)
            if og_size is not None and tuple(og_size) != (y.shape[1], y.shape[2]):
                hm = jax.image.resize(
                    hm.astype(jnp.float32),
                    (hm.shape[0], int(og_size[0]), int(og_size[1])),
                    method="linear",
                    antialias=True,
                )
                hm = jnp.clip(jnp.round(hm), 0, 255).astype(jnp.uint8)
            return hm
        return y
