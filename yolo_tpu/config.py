"""Spec/config plane.

Keeps the reference's per-version ``vN/spec.yaml`` contract (keys splatted
onto the task object — reference licence_plate/LP_detection.py:102-107,
car/YOLO.py:55-59) but as an explicit, typed wrapper instead of ``setattr``
splatting, plus the derived quantities every trainer recomputed by hand
(pyramid strides, per-level cell counts — reference car/YOLO.py:112-121).
"""
from __future__ import annotations

import os
from typing import Any, Dict, List

import yaml


class Spec:
    """A network/training spec.

    Attribute access falls through to the underlying dict so reference
    spec.yaml files drop in unchanged (same keys: ``size``, ``layers``,
    ``channels``, ``slice_point``, ``all_anchors``, ``classes``, loss
    ``scale``, ``LP_slice_point`` ... see reference car/v1/spec.yaml).
    """

    def __init__(self, data: Dict[str, Any]):
        self._data = dict(data)

    # -- raw access ------------------------------------------------------
    def __getattr__(self, key: str) -> Any:
        try:
            return self._data[key]
        except KeyError as e:
            raise AttributeError(f"spec has no key {key!r}") from e

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def get(self, key: str, default: Any = None) -> Any:
        return self._data.get(key, default)

    def to_dict(self) -> Dict[str, Any]:
        return dict(self._data)

    def replace(self, **kwargs: Any) -> "Spec":
        d = dict(self._data)
        d.update(kwargs)
        return Spec(d)

    # -- derived quantities -----------------------------------------------
    @property
    def num_class(self) -> int:
        return len(self._data["classes"])

    @property
    def num_anchors_per_cell(self) -> int:
        return len(self._data["all_anchors"][0])

    @property
    def steps(self) -> List[int]:
        """Pyramid strides, shallow-first.

        Semantics of reference car/YOLO.py:112-116: with ``layers`` giving
        the number of downsampling stages and ``all_anchors`` one entry per
        pyramid level, the shallowest pyramid level sits at stride
        2**(num_downsample - num_levels + 1).
        """
        num_down = len(self._data["layers"])
        num_levels = len(self._data["all_anchors"])
        start = num_down - num_levels + 1
        return [2 ** (start + i) for i in range(num_levels)]

    @property
    def areas(self) -> List[int]:
        """Cells per pyramid level (reference car/YOLO.py:118-121)."""
        h, w = self._data["size"]
        return [int(h * w // s ** 2) for s in self.steps]

    @property
    def total_cells(self) -> int:
        return sum(self.areas)

    # LP head ------------------------------------------------------------
    @property
    def lp_grid_hw(self) -> tuple:
        """LP head grid (rows, cols).

        Standalone LPD: stride 2**(len(block_config)+1) (reference
        LP_detection.py:112, 259-264). Joint net: stride
        2**(len(layers)-2) — the LP branch hangs off the fused stride-16
        feature map (reference car_and_LP/YOLO.py:110).
        """
        h, w = self._data["size"]
        s = self.lp_stride
        return (h // s, w // s)

    @property
    def lp_stride(self) -> int:
        if "block_config" in self._data and "layers" not in self._data:
            return 2 ** (len(self._data["block_config"]) + 1)
        if "layers" in self._data:
            return 2 ** (len(self._data["layers"]) - 2)
        raise ValueError("spec has neither block_config nor layers")


def load_spec(path: str) -> Spec:
    """Load a spec from a yaml file or a version directory holding spec.yaml."""
    if os.path.isdir(path):
        path = os.path.join(path, "spec.yaml")
    with open(path) as f:
        return Spec(yaml.safe_load(f))


def builtin_spec(name: str) -> Spec:
    """Load one of the packaged specs: car_v1, car_v11, carlp_v1, lp_v2, ocr_v1."""
    here = os.path.dirname(os.path.abspath(__file__))
    return load_spec(os.path.join(here, "configs", name + ".yaml"))


def spec_summary(spec: Spec) -> str:
    lines = [f"size={spec.size}"]
    if "all_anchors" in spec:
        lines.append(f"steps={spec.steps} areas={spec.areas}")
    return " ".join(lines)
