"""YOLOv3-style pyramid detector, built from a spec.

Behavioural twin of the reference's ``BasicYOLONet``/``CarNet``
(yolo_modules/basic_yolo.py:7-123, car/utils.py:64-95): a darknet-style
backbone whose stage widths/depths come from ``spec['layers']`` /
``spec['channels']``, a top-down pyramid over the deepest
``len(all_anchors)`` stages (detection block -> 1x1 output head; 1x1
transition + 2x upsample + concat toward shallower stages), heads emitting
``(B, cells, anchors, slice_point[-1])``.

Output ordering: the list is returned **shallow level first**, matching
how the reference trainer consumes ``CarNet`` (car/utils.py:95 returns
``all_output[::-1]``) and matching the flattened grid-table ordering in
``yolo_tpu.ops.boxes``.
"""
from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp
from flax import linen as nn

from yolo_tpu.config import Spec
from yolo_tpu.models.layers import (ConvBNLeaky, DarknetBlock,
                                    YOLODetectionBlock, YOLOOutput,
                                    upsample2x)
from yolo_tpu.models.s2d import space_to_depth


class YOLOv3Net(nn.Module):
    spec: Spec
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        spec = self.spec
        layers = spec.layers
        channels = spec.channels
        assert len(channels) == len(layers) + 1
        anchors = spec.all_anchors
        num_levels = len(anchors)
        slice_last = spec.slice_point[-1]

        # ---- backbone ----
        # spec key `s2d_stem: true` runs the first two convs on a
        # space-to-depth packed layout — an exact remap of the trained
        # weights (models/s2d.py; the 448-square 16-channel conv0 is
        # the forward's biggest roofline hole, docs/MFU_CLOSEOUT.md)
        s2d = bool(spec.get("s2d_stem", False))
        routes = []
        if s2d:
            x = space_to_depth(x)
            x = ConvBNLeaky(channels[0] * 4, 3, 1, dtype=self.dtype)(
                x, train)
        else:
            x = ConvBNLeaky(channels[0], 3, 1, dtype=self.dtype)(x, train)
        num_stages = len(layers)
        for si, (nlayer, ch) in enumerate(zip(layers, channels[1:])):
            if s2d and si == 0:
                # packed stage-1 downsample: 2x2 stride-1 over the
                # packed grid == 3x3 stride-2 over raw; emits the
                # ORIGINAL unpacked feature map
                x = ConvBNLeaky(ch, 2, 1, dtype=self.dtype)(x, train)
            else:
                x = ConvBNLeaky(ch, 3, 2, dtype=self.dtype)(x, train)
            for _ in range(nlayer):
                x = DarknetBlock(ch // 2, dtype=self.dtype)(x, train)
            if si >= num_stages - num_levels:
                routes.append(x)          # shallow -> deep

        # ---- top-down pyramid, deepest first ----
        pyr_channels = channels[-num_levels:][::-1]   # deep -> shallow
        anchors_rev = list(anchors)[::-1]
        outputs = []
        for i in range(num_levels):
            route, tip = YOLODetectionBlock(
                pyr_channels[i], dtype=self.dtype)(x, train)
            outputs.append(YOLOOutput(
                slice_last, len(anchors_rev[i]), dtype=self.dtype)(tip))
            if i == num_levels - 1:
                break
            nxt = pyr_channels[i + 1]
            t = ConvBNLeaky(nxt, 1, dtype=self.dtype)(route, train)
            t = upsample2x(t)
            x = jnp.concatenate([t, routes[::-1][i + 1]], axis=-1)

        return outputs[::-1]   # shallow level first


class CarLPNet(nn.Module):
    """Joint car + licence-plate network (reference car_and_LP/YOLO.py:47-95).

    The YOLOv3 trunk above, plus an LP pose branch grafted onto the fused
    stride-16 feature (the input of the shallowest detection block): five
    stacked detection blocks (the branch threads each block's *tip*) and a
    1x1 conv to ``LP_slice_point[-1]`` channels.

    Returns ``(car_outputs, lp_output)`` where car_outputs is the
    shallow-first list of (B, cells, anchors, C) heads and lp_output is a
    (B, H/16, W/16, LP_slice_point[-1]) map.
    """
    spec: Spec
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = self.spec
        layers = spec.layers
        channels = spec.channels
        anchors = spec.all_anchors
        num_levels = len(anchors)
        slice_last = spec.slice_point[-1]
        lp_channels = channels[-3]
        lp_out_ch = spec.LP_slice_point[-1]

        s2d = bool(spec.get("s2d_stem", False))   # see YOLOv3Net
        routes = []
        if s2d:
            x = space_to_depth(x)
            x = ConvBNLeaky(channels[0] * 4, 3, 1, dtype=self.dtype)(
                x, train)
        else:
            x = ConvBNLeaky(channels[0], 3, 1, dtype=self.dtype)(x, train)
        num_stages = len(layers)
        for si, (nlayer, ch) in enumerate(zip(layers, channels[1:])):
            if s2d and si == 0:
                x = ConvBNLeaky(ch, 2, 1, dtype=self.dtype)(x, train)
            else:
                x = ConvBNLeaky(ch, 3, 2, dtype=self.dtype)(x, train)
            for _ in range(nlayer):
                x = DarknetBlock(ch // 2, dtype=self.dtype)(x, train)
            if si >= num_stages - num_levels:
                routes.append(x)

        pyr_channels = channels[-num_levels:][::-1]
        anchors_rev = list(anchors)[::-1]
        outputs = []
        lp_output = None
        for i in range(num_levels):
            if i == num_levels - 1:
                lp = x
                for _ in range(5):
                    _, lp = YOLODetectionBlock(
                        lp_channels, dtype=self.dtype)(lp, train)
                lp_output = nn.Conv(lp_out_ch, (1, 1), dtype=self.dtype,
                                    param_dtype=jnp.float32)(lp)
            route, tip = YOLODetectionBlock(
                pyr_channels[i], dtype=self.dtype)(x, train)
            outputs.append(YOLOOutput(
                slice_last, len(anchors_rev[i]), dtype=self.dtype)(tip))
            if i == num_levels - 1:
                break
            nxt = pyr_channels[i + 1]
            t = ConvBNLeaky(nxt, 1, dtype=self.dtype)(route, train)
            t = upsample2x(t)
            x = jnp.concatenate([t, routes[::-1][i + 1]], axis=-1)

        return outputs[::-1], lp_output
