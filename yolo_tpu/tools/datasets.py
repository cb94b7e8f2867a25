"""Offline dataset tooling — the re-based Tools/ layer of the reference.

* ``read_pascal3d_annotation`` — PASCAL3D+ .mat viewpoint parser
  (reference car/render_car.py:440-459): returns (elevation_rad,
  azimuth_rad, bbox, skip).
* ``compose_detection_dataset`` — offline compositor writing jpg +
  normalised ``[cls y x h w]`` label txt pairs from car crops pasted onto
  car-free backgrounds (reference Tools/gen_dataset.py).
* ``filter_backgrounds_without_cars`` — drops images whose PASCAL-VOC XML
  names vehicles (reference Tools/remove_car_from_sun2012.py).
* ``labels_to_list_file`` — label txts -> a single index/list file
  (reference Tools/darknet2mxnet.py).
* ``pack_image_pool`` / unpack — directory of images -> one .npy shard
  for fast device upload (replaces the RecordIO path of Tools/im2rec.py;
  BackgroundPool loads these directly).
"""
from __future__ import annotations

import math
import os
from typing import List, Optional

import numpy as np


# --------------------------------------------------------------------------
# PASCAL3D+
# --------------------------------------------------------------------------
def read_pascal3d_annotation(mat_path: str):
    """(ele_rad, azi_rad, [l, t, r, b], skip). skip=True when the image
    holds more than one annotated object (the reference skips those)."""
    import scipy.io as sio
    mat = sio.loadmat(mat_path)
    objects = mat["record"][0][0][1][0]
    if len(objects) > 1:
        return 0.0, 0.0, [0, 0, 0, 0], True
    box = [int(v) for v in objects[0][1][0]]
    viewpoint = objects[0][3][0][0]
    azi = float(viewpoint[2][0]) * math.pi / 180.0
    ele = float(viewpoint[3][0]) * math.pi / 180.0
    return ele, azi, box, False


def compose_detection_dataset(out_dir: str, backgrounds_dir: str,
                              crops_dir: str, labels_dir: Optional[str] = None,
                              per_image: int = 5, size_hw=(320, 512),
                              seed: int = 0, limit: Optional[int] = None):
    """Paste ``per_image`` random car crops per background; write
    ``NNNN.jpg`` + ``NNNN.txt`` with one ``cls y x h w`` row per paste
    (all normalised). Crops are RGBA PNGs (transparent cars) or PASCAL
    crops with .mat labels in ``labels_dir``."""
    from PIL import Image
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    h, w = size_hw

    bgs = [f for f in sorted(os.listdir(backgrounds_dir))
           if f.lower().endswith((".jpg", ".jpeg", ".png"))]
    crops = [f for f in sorted(os.listdir(crops_dir))
             if f.lower().endswith(".png")]
    if not bgs or not crops:
        raise FileNotFoundError("need backgrounds and crops")
    if limit:
        bgs = bgs[:limit]

    for n, bg_name in enumerate(bgs):
        bg = Image.open(os.path.join(backgrounds_dir, bg_name)) \
            .convert("RGB").resize((w, h), Image.BILINEAR)
        rows: List[str] = []
        for _ in range(per_image):
            crop_name = crops[rng.integers(len(crops))]
            crop = Image.open(os.path.join(crops_dir, crop_name)) \
                .convert("RGBA")
            scale = rng.uniform(0.2, 0.8) * min(
                h / crop.height, w / crop.width)
            cw, chh = max(int(crop.width * scale), 4), \
                max(int(crop.height * scale), 4)
            crop = crop.resize((cw, chh), Image.BILINEAR)
            x = int(rng.integers(0, max(w - cw, 1)))
            y = int(rng.integers(0, max(h - chh, 1)))
            bg.paste(crop, (x, y), crop.split()[-1])
            cls = 0
            if labels_dir:
                mat = os.path.join(
                    labels_dir, os.path.splitext(crop_name)[0] + ".mat")
                if os.path.exists(mat):
                    ele, azi, _, skip = read_pascal3d_annotation(mat)
                    if not skip:
                        cls = int(round(math.degrees(azi) / 15.0)) % 24
            rows.append("%d %.6f %.6f %.6f %.6f" % (
                cls, (y + chh / 2) / h, (x + cw / 2) / w, chh / h, cw / w))
        stem = os.path.join(out_dir, "%05d" % n)
        bg.save(stem + ".jpg", quality=92)
        with open(stem + ".txt", "w") as f:
            f.write("\n".join(rows) + "\n")
    return len(bgs)


# --------------------------------------------------------------------------
# background curation / packing
# --------------------------------------------------------------------------
VEHICLE_NAMES = ("car", "van", "truck", "bus")


def filter_backgrounds_without_cars(image_dir: str, annotation_dir: str,
                                    out_list: Optional[str] = None
                                    ) -> List[str]:
    """Return image files whose VOC XML annotation names no vehicle."""
    import xml.etree.ElementTree as ET
    keep = []
    for f in sorted(os.listdir(image_dir)):
        if not f.lower().endswith((".jpg", ".jpeg", ".png")):
            continue
        xml = os.path.join(annotation_dir,
                           os.path.splitext(f)[0] + ".xml")
        has_vehicle = False
        if os.path.exists(xml):
            try:
                root = ET.parse(xml).getroot()
                for obj in root.iter("name"):
                    if any(v in (obj.text or "").lower()
                           for v in VEHICLE_NAMES):
                        has_vehicle = True
                        break
            except ET.ParseError:
                pass
        if not has_vehicle:
            keep.append(f)
    if out_list:
        with open(out_list, "w") as fh:
            fh.write("\n".join(keep) + "\n")
    return keep


def labels_to_list_file(label_dir: str, out_path: str,
                        image_ext: str = ".jpg") -> int:
    """Collect ``cls y x h w`` txt labels into one tab-separated index
    file: ``idx\\t<n_cols>\\t<cls y x h w ...>\\t<image>``."""
    count = 0
    with open(out_path, "w") as out:
        for f in sorted(os.listdir(label_dir)):
            if not f.endswith(".txt"):
                continue
            with open(os.path.join(label_dir, f)) as fh:
                vals = fh.read().split()
            img = os.path.splitext(f)[0] + image_ext
            out.write("\t".join([str(count), "5"] + vals + [img]) + "\n")
            count += 1
    return count


def pack_image_pool(image_dir: str, out_npy: str, size_hw=(320, 512),
                    max_images: int = 2048, file_list: Optional[str] = None
                    ) -> int:
    """Decode + resize a directory (or curated list) of images into one
    uint8 (N, H, W, 3) .npy shard for instant device upload."""
    from PIL import Image
    h, w = size_hw
    names = None
    if file_list and os.path.exists(file_list):
        with open(file_list) as f:
            names = [ln.strip() for ln in f if ln.strip()]
    else:
        names = [f for f in sorted(os.listdir(image_dir))
                 if f.lower().endswith((".jpg", ".jpeg", ".png"))]
    arrs = []
    for f in names[:max_images]:
        p = os.path.join(image_dir, f)
        try:
            im = Image.open(p).convert("RGB").resize((w, h), Image.BILINEAR)
            arrs.append(np.asarray(im, np.uint8))
        except Exception:
            continue
    if not arrs:
        raise FileNotFoundError(f"no decodable images under {image_dir}")
    np.save(out_npy, np.stack(arrs))
    return len(arrs)
