"""Mode implementations shared by the task apps.

Each mode mirrors a reference mode (train / valid / export / video /
kmean — car/YOLO.py:20-45, LP_detection.py:28-33) re-based on the fused
TPU pipelines. ``valid`` writes annotated PNGs instead of blocking on an
interactive matplotlib window (headless-first; pass --show to also
display when an X server exists).
"""
from __future__ import annotations

import os
import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.config import Spec, builtin_spec
from yolo_tpu.decode import peaks_to_text
from yolo_tpu.pipeline import ALPRPipeline, JointPipeline
from yolo_tpu.render import CarAssetPool  # noqa: F401 (re-export)
from yolo_tpu.train import make_task
from yolo_tpu.train.checkpoint import restore_checkpoint
from yolo_tpu.train.trainer import Trainer
from yolo_tpu.utils import viz
from yolo_tpu.utils.colors import log


def build_trainer(kind: str, spec: Spec, args) -> Trainer:
    # multi-host: no-op single-process; with JAX_COORDINATOR_ADDRESS set
    # it joins the DCN control plane and the mesh spans every host's
    # devices (checkpoints/metrics written by process 0 only)
    from yolo_tpu.parallel.distributed import (global_mesh, initialize,
                                               is_primary)
    multi_host = initialize()
    dtype = jnp.bfloat16 if getattr(args, "bf16", 0) else jnp.float32
    task = make_task(kind, spec, dtype=dtype)
    car_assets = None
    if getattr(args, "car_assets", None):
        from yolo_tpu.render.car import CarAssetPool as Pool
        car_assets = Pool.from_directory(args.car_assets)
    trainer = Trainer(
        task, workdir=args.version,
        mesh=global_mesh() if multi_host else None,
        background_dir=getattr(args, "backgrounds", None),
        batch_size=args.batch or None,
        car_assets=car_assets,
        record=bool(getattr(args, "record", 1)) and is_primary())
    if getattr(args, "weight", None):
        try:    # full train state (backup dirs)
            trainer.state = restore_checkpoint(args.weight, trainer.state)
        except Exception:
            # params-only snapshot (e.g. the packaged trained/ dirs)
            v = restore_checkpoint(args.weight, {
                "params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats})
            trainer.state = trainer.state.replace(
                params=v["params"], batch_stats=v["batch_stats"])
        log(f"restored weights from {args.weight}", "magenta")
    return trainer


def _restore_ocr_variables(ocr_task, args=None):
    """Best available OCR weights for the cascade export/serving paths.

    Tries --ocr-weight first, then the newest packaged snapshot. Loud
    about the outcome: exporting or serving a cascade with random OCR
    weights produces an artifact whose plate text is garbage while the
    car/LP heads look fine (easy to ship broken silently).
    Returns (variables, source_dir_or_None).
    """
    ov = ocr_task.init_variables(jax.random.PRNGKey(0))
    candidates = []
    if args is not None and getattr(args, "ocr_weight", None):
        candidates.append(args.ocr_weight)
    candidates += ["trained/ocr_v3", "trained/ocr_v2",
                   "trained/ocr_v1_cascade", "trained/ocr_v1"]
    for d in candidates:
        if not os.path.isdir(d):
            continue
        try:
            v = restore_checkpoint(d, ov)
            log(f"OCR weights: {d}", "magenta")
            return v, d
        except Exception as e:
            log(f"OCR restore failed for {d}: {e!r}", "red")
    log("OCR weights: RANDOM INIT (no checkpoint found)", "red")
    return ov, None


def run_train(kind: str, spec: Spec, args):
    trainer = build_trainer(kind, spec, args)
    if getattr(args, "until_step", 0):
        # restart-safe target: run only the remainder (the watchdog
        # relaunches the identical command after a transport stall)
        steps = max(0, args.until_step - int(trainer.state.step))
        if steps == 0:
            log(f"already at step {int(trainer.state.step)}", "green")
            return
    else:
        steps = args.steps or 10 ** 9
    valid_fn = trainer.valid_iou if kind in ("car", "car_dense", "carlp") \
        else None
    log(f"training {kind} for {steps} steps "
        f"(batch={trainer.batch_size})", "cyan")
    trainer.train(steps, valid_fn=valid_fn)


def run_valid(kind: str, spec: Spec, args, num_batches: int = 2):
    """Render validation scenes, run the net, write annotated PNGs to
    <version>/valid_out (reference interactive valid modes,
    car/YOLO.py:640-673, LP_detection.py:209-225, OCR/OCR.py:301-343)."""
    trainer = build_trainer(kind, spec, args)
    outdir = os.path.join(args.version, "valid_out")
    os.makedirs(outdir, exist_ok=True)
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    key = jax.random.PRNGKey(42)

    for b in range(num_batches):
        key, k1, k2 = jax.random.split(key, 3)
        bg = trainer.backgrounds.sample(k1, min(trainer.batch_size, 4))
        imgs, labels = trainer.synthesize(k2, bg)

        if kind == "ocr":
            (score_x, class_x) = trainer.task.apply_eval(variables, imgs)
            from yolo_tpu.decode import decode_ocr
            o = decode_ocr(jnp.asarray(score_x, jnp.float32),
                           jnp.asarray(class_x, jnp.float32), threshold=0.2)
            for i in range(imgs.shape[0]):
                img = (np.asarray(imgs[i]) * 255).astype(np.uint8).copy()
                text = peaks_to_text(o.peak_cls[i])
                viz.draw_ocr_trace(img, np.asarray(o.scores[i]), text)
                _save(img, os.path.join(outdir, f"b{b}_{i}.png"))
                print(f"[valid] batch {b} img {i}: OCR='{text}'")
        elif kind == "lp":
            from yolo_tpu.decode import decode_lp
            out = trainer.task.apply_eval(variables, imgs)
            lp = decode_lp(jnp.asarray(out, jnp.float32), spec.LP_r_max)
            for i in range(imgs.shape[0]):
                img = (np.asarray(imgs[i]) * 255).astype(np.uint8).copy()
                lab = np.asarray(labels[i, 0])
                if lab[0] > 0:
                    viz.draw_plate_edges(img, lab[1:7], color=(0, 255, 0))
                viz.draw_plate_edges(img, np.asarray(lp[i, 1:7]))
                _save(img, os.path.join(outdir, f"b{b}_{i}.png"))
                print(f"[valid] b{b} i{i} score={float(lp[i,0]):.3f} "
                      f"pred={np.asarray(lp[i,1:]).round(2)}")
        else:   # car / car_dense / carlp
            from yolo_tpu.decode import decode_car
            from yolo_tpu.ops.boxes import make_grid_tables
            out = trainer.task.apply_eval(variables, imgs)
            if kind == "carlp":
                out = out[0]
            grids = make_grid_tables(spec.size, spec.steps, spec.all_anchors)
            pred = decode_car(out, grids, spec.slice_point, spec.size)
            radar = viz.RadarProb(spec.num_class, spec.classes)
            for i in range(imgs.shape[0]):
                img = (np.asarray(imgs[i]) * 255).astype(np.uint8).copy()
                lab = np.asarray(labels[i, 0]) if kind != "carlp" else \
                    np.asarray(labels[0][i, 0])
                if lab[0] >= 0:
                    viz.draw_bbox(img, np.concatenate([[1.0], lab[1:6]]), 4)
                viz.draw_bbox(img, np.asarray(pred[i]), 5)
                _save(img, os.path.join(outdir, f"b{b}_{i}.png"))
                ang, rad, _ = radar.cls2ang(float(pred[i, 0]),
                                            np.asarray(pred[i, 6:]))
                print(f"[valid] b{b} i{i} score={float(pred[i,0]):.3f} "
                      f"azi={np.degrees(ang):.1f}° conf_r={rad:.3f}")
    log(f"annotated frames written to {outdir}", "green")


def run_eval(kind: str, spec: Spec, args, batches: int = 8):
    """Held-out synthetic accuracy evaluation (tools.evaluate)."""
    import json
    from yolo_tpu.tools import evaluate as ev
    trainer = build_trainer(kind, spec, args)
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    topk = int(getattr(args, "topk", 0) or 0)
    if kind == "ocr":
        m = ev.eval_ocr(trainer.task, variables, batches=batches)
    elif kind == "lp":
        m = ev.eval_lpd(trainer.task, variables, batches=batches,
                        r_max=tuple(spec.LP_r_max))
    elif topk and kind in ("car", "car_dense", "carlp"):
        m = ev.eval_car_multi(trainer.task, variables, batches=batches,
                              k=topk,
                              num_obj=int(getattr(args, "num_obj", 0) or 0)
                              or max(spec.get("max_objects", 1), 2),
                              score_thresh=float(
                                  getattr(args, "score_thresh", 0.5)),
                              nms_iou=float(
                                  getattr(args, "nms_iou", 0.45)),
                              car_assets=trainer.car_renderer.pool
                              if trainer.car_renderer else None)
    elif kind == "carlp" and getattr(args, "cascade", 0):
        # full fused serving path measured ON the joint net: CarLPNet ->
        # predicted-pose unwarp -> OCR -> text (not just the pose heads)
        ocr_spec = builtin_spec("ocr_v1")
        ocr_task = make_task("ocr", ocr_spec, dtype=trainer.task.dtype)
        ov, ocr_src = _restore_ocr_variables(ocr_task, args)
        m = ev.eval_joint_cascade(
            trainer.task, variables, ocr_task, ov, batches=batches,
            car_assets=trainer.car_renderer.pool
            if trainer.car_renderer else None)
        m["ocr_weights"] = ocr_src
    elif kind == "carlp":
        m = ev.eval_joint(trainer.task, variables, batches=batches,
                          car_assets=trainer.car_renderer.pool
                          if trainer.car_renderer else None)
    else:
        m = ev.eval_car(trainer.task, variables, batches=batches,
                        car_assets=trainer.car_renderer.pool
                        if trainer.car_renderer else None)
    m["step"] = int(trainer.state.step)
    print(json.dumps(m))
    return m


def run_export(kind: str, spec: Spec, args):
    """Checkpoint -> deployable artifact under <version>/export
    (reference export modes; yolo_gluon.export semantics)."""
    from yolo_tpu.serve.export import export_model
    trainer = build_trainer(kind, spec, args)
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    h, w = spec.size
    frames = jnp.zeros((1, h, w, 3), jnp.float32)
    export_dir = os.path.join(args.version, "export")

    if kind == "carlp":
        ocr_spec = builtin_spec("ocr_v1")
        ocr_task = make_task("ocr", ocr_spec, dtype=trainer.task.dtype)
        ov, ocr_src = _restore_ocr_variables(ocr_task, args)
        topk = int(getattr(args, "topk", 0) or 0)
        pipe = JointPipeline(trainer.task, ocr_task, topk=topk)
        export_model(lambda v, f: pipe(v, ov, f), (frames,), variables,
                     export_dir,
                     meta={"kind": kind, "topk": topk,
                           "ocr_weights": ocr_src})
    elif kind == "lp":
        ocr_spec = builtin_spec("ocr_v1")
        ocr_task = make_task("ocr", ocr_spec, dtype=trainer.task.dtype)
        ov, ocr_src = _restore_ocr_variables(ocr_task, args)
        pipe = ALPRPipeline(trainer.task, ocr_task)
        export_model(lambda v, f: pipe(v, ov, f), (frames,), variables,
                     export_dir,
                     meta={"kind": kind, "ocr_weights": ocr_src})
    else:
        task = trainer.task
        export_model(lambda v, f: task.apply_eval(v, f), (frames,),
                     variables, export_dir, meta={"kind": kind})
    log(f"exported to {export_dir}", "green")


def run_video(kind: str, spec: Spec, args):
    """Streaming inference (reference video nodes). ``--devices N`` (N>1)
    shards the stream batch over an N-device mesh (ShardedVideoNode)."""
    from yolo_tpu.serve.video import (FrameSource, ShardedVideoNode,
                                      VideoNode, make_ocr_text_sink)
    trainer = build_trainer(kind, spec, args)
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    sinks = []
    if kind in ("carlp", "lp"):
        ocr_spec = builtin_spec("ocr_v1")
        ocr_task = make_task("ocr", ocr_spec, dtype=trainer.task.dtype)
        ov, _ = _restore_ocr_variables(ocr_task, args)
        if kind == "carlp":
            pipe = JointPipeline(trainer.task, ocr_task,
                                 topk=int(getattr(args, "topk", 0) or 0))
        else:
            pipe = ALPRPipeline(trainer.task, ocr_task)
        raw_fn = lambda f: pipe(variables, ov, f)   # noqa: E731
        sinks.append(make_ocr_text_sink(print_valid_only=False))
    else:
        from yolo_tpu.decode import decode_car, decode_car_topk
        from yolo_tpu.ops.boxes import make_grid_tables
        grids = make_grid_tables(spec.size, spec.steps, spec.all_anchors)
        task = trainer.task
        topk = int(getattr(args, "topk", 0) or 0)

        def raw_fn(f):
            out = task.apply_eval(variables, f)
            if topk:    # every vehicle in frame, not just the argmax box
                return decode_car_topk(out, grids, spec.slice_point,
                                       spec.size, k=topk)
            return decode_car(out, grids, spec.slice_point, spec.size)

    if args.dev == "ros":
        from yolo_tpu.serve.ros_bridge import RosPublisher
        sinks.append(RosPublisher(spec))

    source = FrameSource(args.dev, tuple(spec.size),
                         clip=(args.clip_h, args.clip_w), flip=args.flip,
                         max_frames=getattr(args, "max_frames", 64),
                         topic=getattr(args, "topic",
                                       "/usb_cam/image_raw"))
    n_dev = int(getattr(args, "devices", 1) or 1)
    if n_dev > 1:
        from yolo_tpu.parallel import make_mesh
        node = ShardedVideoNode(raw_fn, make_mesh(n_devices=n_dev),
                                per_device_batch=max(args.batch, 1)
                                if args.batch else 1, sinks=sinks)
    else:
        node = VideoNode(jax.jit(raw_fn), batch=1, sinks=sinks)
    stats = node.run(source)
    log(f"video done: {stats}", "green")
    return stats


def run_kmean(spec: Spec, args, k: int = 9, samples: int = 1000):
    """Anchor prior search: render labels, k-means with IoU distance
    (reference car/YOLO.py:599-638 + yolo_modules/iou_kmeans.py)."""
    from yolo_tpu.tools.iou_kmeans import iou_kmeans
    from yolo_tpu.render import CarRenderer, procedural_backgrounds
    from yolo_tpu.render.car import CarAssetPool as Pool
    pool = Pool.from_directory(args.car_assets) if args.car_assets else None
    r = CarRenderer(*spec.size, spec.classes, pool=pool)
    key = jax.random.PRNGKey(0)
    hw = []
    bs = 50
    for i in range(samples // bs):
        key, k1, k2 = jax.random.split(key, 3)
        bg = jnp.zeros((bs, spec.size[0], spec.size[1], 3))
        _, labels = r.render(k2, bg, render_rate=1.0)
        hw.append(np.asarray(labels[:, 0, 3:5]))
    hw = np.concatenate(hw, 0)
    centres = iou_kmeans(jnp.asarray(hw), k)
    order = np.argsort([c[0] * c[1] for c in np.asarray(centres)])
    for c in np.asarray(centres)[order]:
        print("[h, w] = [%.4f, %.4f], area = %.4f" % (c[0], c[1],
                                                      c[0] * c[1]))
    return np.asarray(centres)[order]


def _save(img: np.ndarray, path: str):
    from PIL import Image
    Image.fromarray(img).save(path)
