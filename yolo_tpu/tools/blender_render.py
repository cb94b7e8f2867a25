"""Blender batch renderer for car training sprites.

Run INSIDE Blender (headless):

    blender scene.blend --background --python -m ...  # or:
    blender car.blend -b -P yolo_tpu/tools/blender_render.py -- \
        --out /data/blender_car/train --azi-step 15 --ele 7.5 22.5

Renders the scene's car object on a transparent background over a grid of
(azimuth, elevation) camera poses, naming files with the framework's
asset contract ``car_aziAAAA_eleEEEE.png`` (centi-degrees) so
``render.car.CarAssetPool.from_directory`` ingests them directly.
Replaces the reference's insulator/blender_render_png.py for the car
pipeline. No-ops gracefully outside Blender.
"""
from __future__ import annotations

import math
import os
import sys


def render_grid(out_dir: str, azi_step_deg: float = 15.0,
                elevations=(7.5, 22.5), distance: float = 8.0,
                resolution=(512, 384)):
    try:
        import bpy
    except ImportError:
        print("blender_render: must run inside Blender (bpy missing)")
        return 0
    os.makedirs(out_dir, exist_ok=True)
    scene = bpy.context.scene
    scene.render.film_transparent = True
    scene.render.image_settings.file_format = "PNG"
    scene.render.image_settings.color_mode = "RGBA"
    scene.render.resolution_x, scene.render.resolution_y = resolution

    cam = scene.camera
    count = 0
    for ele in elevations:
        n = max(int(round(360.0 / azi_step_deg)), 1)
        for k in range(n):
            azi = k * azi_step_deg
            a, e = math.radians(azi), math.radians(ele)
            cam.location = (distance * math.cos(e) * math.cos(a),
                            distance * math.cos(e) * math.sin(a),
                            distance * math.sin(e))
            # aim at origin
            direction = cam.location
            cam.rotation_euler = (
                math.pi / 2 - e, 0.0, a + math.pi / 2)
            name = "car_azi%04d_ele%04d.png" % (
                int(azi * 100), int(ele * 100))
            scene.render.filepath = os.path.join(out_dir, name)
            bpy.ops.render.render(write_still=True)
            count += 1
    return count


def _parse_cli():
    argv = sys.argv
    args = argv[argv.index("--") + 1:] if "--" in argv else []
    out = "./blender_car_out"
    azi_step = 15.0
    eles = [7.5, 22.5]
    it = iter(range(len(args)))
    i = 0
    while i < len(args):
        if args[i] == "--out":
            out = args[i + 1]; i += 2
        elif args[i] == "--azi-step":
            azi_step = float(args[i + 1]); i += 2
        elif args[i] == "--ele":
            eles = []
            i += 1
            while i < len(args) and not args[i].startswith("--"):
                eles.append(float(args[i])); i += 1
        else:
            i += 1
    return out, azi_step, eles


if __name__ == "__main__":
    out, azi_step, eles = _parse_cli()
    n = render_grid(out, azi_step, eles)
    print(f"rendered {n} sprites to {out}")
