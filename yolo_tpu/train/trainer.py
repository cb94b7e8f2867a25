"""The generic trainer: fused synth->forward->backward->update device step.

The reference ran a producer thread rendering batches and a consumer
thread training on them, handshaking with sleep-loops
(car/YOLO.py:283-348). On TPU the renderer is jax, so synthesis is simply
*part of the jitted train step* — zero host round-trips, no threads, no
copies. Scale-out is a sharding annotation on the batch axis
(yolo_tpu.parallel.mesh); gradients allreduce over ICI via XLA.

Loop bookkeeping keeps the reference contract: loss scalars every 10
steps, validation IoU every ``valid_step``, checkpoint every
``record_step`` (car/YOLO.py:536-549).
"""
from __future__ import annotations

import datetime
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from yolo_tpu.config import Spec
from yolo_tpu.decode import decode_car
from yolo_tpu.ops.boxes import iou_ltrb, make_grid_tables, yxhw_to_ltrb
from yolo_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                    model_axis_size, replicated_sharding,
                                    state_sharding_tree)
from yolo_tpu.render import BackgroundPool, CarRenderer, LPRenderer
from yolo_tpu.train.checkpoint import (latest_checkpoint, restore_checkpoint,
                                       save_checkpoint)
from yolo_tpu.train.metrics import MetricWriter
from yolo_tpu.train.tasks import TrainState, _TaskBase, make_task


class Trainer:
    def __init__(self, task: _TaskBase, workdir: str,
                 mesh=None, seed: int = 0,
                 background_dir: Optional[str] = None,
                 batch_size: Optional[int] = None,
                 car_assets=None,
                 record: bool = True):
        self.task = task
        self.spec: Spec = task.spec
        self.workdir = workdir
        self.mesh = mesh if mesh is not None else make_mesh()
        self.batch_size = batch_size or self.spec.get("batch_size", 8)
        h, w = self.spec.size

        # ---- data synthesis engines (all on-device) ----
        self.backgrounds = BackgroundPool(background_dir, h, w)
        kind = task.kind
        self.lp_renderer = None
        self.car_renderer = None
        if kind in ("lp", "ocr", "carlp"):
            self.lp_renderer = LPRenderer(h, w)
        if kind in ("car", "car_dense", "carlp"):
            self.car_renderer = CarRenderer(
                h, w, self.spec.classes, pool=car_assets)

        # ---- optimizer (adam, reference learning rates) ----
        # optional schedule: spec lr_schedule: cosine + total_steps /
        # warmup_steps (the reference ran fixed-LR adam)
        lr = self.spec.get("learning_rate", 1e-3)
        if self.spec.get("lr_schedule") == "cosine":
            lr = optax.warmup_cosine_decay_schedule(
                init_value=0.0, peak_value=lr,
                warmup_steps=self.spec.get("warmup_steps", 500),
                decay_steps=self.spec.get("total_steps", 100_000),
                end_value=lr * 0.01)
        self.optimizer = optax.adam(lr)

        # ---- state ----
        key = jax.random.PRNGKey(seed)
        variables = task.init_variables(key)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        self.state = TrainState(
            params=params, batch_stats=batch_stats,
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), jnp.int32))
        self.backup_dir = os.path.join(workdir, "backup")
        ckpt_step = latest_checkpoint(self.backup_dir)
        if ckpt_step is not None:
            self.state = restore_checkpoint(self.backup_dir, self.state)

        exp = datetime.datetime.now().strftime("%m-%dx%H-%M")
        self.record = record
        self.writer = MetricWriter(os.path.join(workdir, "logs"), exp=exp) \
            if record else None

        self._step_fn = None
        self._rngkey = jax.random.PRNGKey(seed + 1)

    # ------------------------------------------------------------------
    # batch synthesis (traced inside the train step)
    # ------------------------------------------------------------------
    def _scene_aug(self, key, imgs):
        """Scene-level photometric augmentation (spec keys
        ``scene_noise_std`` / ``scene_brightness``, both default 0 = off).

        The per-plate jitter in LPRenderer.add noises only the plate
        window; a real sensor noises the WHOLE frame — the real-image
        stress eval showed scene noise at std 0.03 collapsing LPD corner
        IoU (reports/real_image.json). Detection legs opt in via spec."""
        std = float(self.spec.get("scene_noise_std", 0.0))
        bright = float(self.spec.get("scene_brightness", 0.0))
        if not (std or bright):
            return imgs
        k1, k2 = jax.random.split(key)
        if bright:
            f = jax.random.uniform(k1, (imgs.shape[0], 1, 1, 1),
                                   minval=1.0 - bright, maxval=1.0 + bright)
            imgs = imgs * f
        if std:
            imgs = imgs + std * jax.random.normal(k2, imgs.shape)
        return jnp.clip(imgs, 0.0, 1.0)

    def synthesize(self, key, bg):
        kind = self.task.kind
        k1, k2 = jax.random.split(key)
        if kind == "lp":
            imgs, labels = self.lp_renderer.add(
                k1, bg, tuple(self.spec.LP_r_max),
                add_rate=self.spec.get("lp_add_rate", 0.5))
            return self._scene_aug(k2, imgs), labels
        if kind == "ocr":
            # mix fronto-parallel strips with cascade-matched noisy-pose
            # crops (spec cascade_rate in [0,1]; 0 = pure reference mode)
            rate = self.spec.get("cascade_rate", 0.0)
            if not rate:
                return self.lp_renderer.render(k1, bg)
            ka, kb, kc = jax.random.split(k2, 3)
            imgs_a, lab_a = self.lp_renderer.render(k1, bg)
            imgs_b, lab_b = self.lp_renderer.render_cascade(
                ka, bg, tuple(self.spec.get("LP_r_max", (45., 60., 45.))),
                pose_noise=self.spec.get("cascade_pose_noise", 1.0))
            pick = (jax.random.uniform(kb, (bg.shape[0],)) < rate)
            imgs = jnp.where(pick[:, None, None, None], imgs_b, imgs_a)
            labels = jnp.where(pick[:, None, None], lab_b, lab_a)
            return imgs, labels
        if kind in ("car", "car_dense"):
            imgs, labels = self.car_renderer.render(
                k1, bg,
                render_rate=self.spec.get("car_render_rate", 0.5),
                pascal_rate=self.spec.get("pascal_rate", 0.2),
                num_obj=self.spec.get("max_objects", 1))
            return self._scene_aug(k2, imgs), labels
        if kind == "carlp":
            imgs, car_labels = self.car_renderer.render(
                k1, bg,
                render_rate=self.spec.get("car_render_rate", 0.5),
                pascal_rate=self.spec.get("pascal_rate", 0.2),
                num_obj=self.spec.get("max_objects", 1))
            imgs, lp_labels = self.lp_renderer.add(
                k2, imgs, tuple(self.spec.LP_r_max),
                add_rate=self.spec.get("lp_add_rate", 0.5))
            imgs = self._scene_aug(jax.random.fold_in(k2, 1), imgs)
            return imgs, (car_labels, lp_labels)
        raise ValueError(kind)

    # ------------------------------------------------------------------
    # jitted step
    # ------------------------------------------------------------------
    def make_step(self) -> Callable:
        task = self.task
        optimizer = self.optimizer

        def step_fn(state: TrainState, key, bg):
            k_synth, _ = jax.random.split(jax.random.fold_in(key, state.step))
            images, labels = self.synthesize(k_synth, bg)

            def loss_fn(params):
                return task.loss(params, state.batch_stats, images, labels)

            (total, (losses, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = optimizer.update(grads, state.opt_state,
                                                state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                params=new_params, batch_stats=new_stats,
                opt_state=new_opt, step=state.step + 1)
            losses = dict(losses)
            losses["total"] = total
            return new_state, losses

        repl = replicated_sharding(self.mesh)
        bsh = batch_sharding(self.mesh)
        # 2-D (data, model) mesh: wide conv kernels + their adam moments
        # shard their output channels over 'model' (tensor parallelism);
        # on a 1-D mesh this is exactly the replicated tree.
        if model_axis_size(self.mesh) > 1:
            st_sh = state_sharding_tree(
                self.mesh, self.state,
                min_features=self.spec.get("tp_min_features", 256))
        else:
            st_sh = repl
        return jax.jit(
            step_fn,
            in_shardings=(st_sh, repl, bsh),
            out_shardings=(st_sh, repl),
            donate_argnums=(0,))

    # ------------------------------------------------------------------
    # loop
    # ------------------------------------------------------------------
    def next_backgrounds(self, key):
        bg = self.backgrounds.sample(key, self.batch_size)
        sh = batch_sharding(self.mesh)
        if jax.process_count() > 1:
            # multi-host (DCN) feed: every host samples the same global
            # batch (same key), keeps its own rows, and assembles the
            # global sharded array — device_put cannot address another
            # host's devices
            from yolo_tpu.parallel.distributed import local_batch_slice
            import numpy as np
            local = np.asarray(bg[local_batch_slice(self.batch_size)])
            return jax.make_array_from_process_local_data(
                sh, local, bg.shape)
        return jax.device_put(bg, sh)

    def train(self, num_steps: int,
              log_every: int = 10,
              valid_fn: Optional[Callable] = None):
        if self._step_fn is None:
            self._step_fn = self.make_step()
        record_step = self.spec.get("record_step", 1000)
        valid_step = self.spec.get("valid_step", 0)
        state = self.state
        bg = None
        # the step counter is derived on host: int(state.step) every
        # iteration would be a full device sync per step, serializing
        # dispatch over the high-latency remote transport
        step0 = int(jax.device_get(self.state.step))
        for i in range(num_steps):
            self._rngkey, k_bg, k_step = jax.random.split(self._rngkey, 3)
            # refresh backgrounds every 10 steps (reference cadence,
            # car/YOLO.py:323-325); the pool gather itself is on-device
            if bg is None or i % 10 == 0:
                bg = self.next_backgrounds(k_bg)
            state, losses = self._step_fn(state, k_step, bg)
            step = step0 + i + 1
            if self.writer and step % log_every == 0:
                self.writer.scalars(losses, step)
            if valid_fn and valid_step and step % valid_step == 0:
                metrics = valid_fn(state)
                if self.writer:
                    self.writer.scalars(metrics, step)
            if self.record and record_step and step % record_step == 0:
                save_checkpoint(self.backup_dir, state, step)
        self.state = state
        # always checkpoint the final step (a run whose length is not a
        # multiple of record_step must not lose its tail). record=False
        # (--record 0 debug runs, non-primary hosts) must write NOTHING:
        # checkpoint rotation would destroy up to max_to_keep real
        # backups from the run being debugged.
        step = step0 + num_steps
        if self.record and record_step and step % record_step != 0:
            save_checkpoint(self.backup_dir, state, step)
        return state

    # ------------------------------------------------------------------
    # validation: mean IoU over freshly rendered scenes
    # (reference _valid_iou, car/YOLO.py:501-534)
    # ------------------------------------------------------------------
    def valid_iou(self, state: TrainState, batches: int = 4) -> dict:
        assert self.task.kind in ("car", "car_dense", "carlp")
        spec = self.spec
        grids = make_grid_tables(spec.size, spec.steps, spec.all_anchors)

        @jax.jit
        def run(state, key):
            k_bg, k_r = jax.random.split(key)
            bg = self.backgrounds.sample(k_bg, self.batch_size)
            imgs, labels = self.car_renderer.render(k_r, bg,
                                                    render_rate=1.0)
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            out = self.task.apply_eval(variables, imgs)
            if self.task.kind == "carlp":
                out = out[0]
            pred = decode_car(out, grids, spec.slice_point, spec.size)
            pred_ltrb = yxhw_to_ltrb(pred[:, 1:5])
            ious = jax.vmap(iou_ltrb)(pred_ltrb, labels[:, 0, 1:5])
            return jnp.mean(ious)

        total = 0.0
        for b in range(batches):
            self._rngkey, k = jax.random.split(self._rngkey)
            total += float(run(state, k))
        return {"mean_iou": total / batches}


def build_trainer(kind: str, spec: Spec, workdir: str, **kw) -> Trainer:
    task = make_task(kind, spec, dtype=kw.pop("dtype", jnp.float32))
    return Trainer(task, workdir, **kw)
