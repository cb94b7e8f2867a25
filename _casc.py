import jax, jax.numpy as jnp, optax, json
from yolo_tpu.config import builtin_spec
from yolo_tpu.train import make_task
from yolo_tpu.train.checkpoint import restore_checkpoint
from yolo_tpu.train.tasks import TrainState
from yolo_tpu.tools.evaluate import eval_cascade

lp_task = make_task("lp", builtin_spec("lp_v2"))
ocr_task = make_task("ocr", builtin_spec("ocr_v1"))
k = jax.random.PRNGKey(0)
lv = lp_task.init_variables(k); ov = ocr_task.init_variables(k)
st = TrainState(params=lv["params"], batch_stats=lv.get("batch_stats", {}),
                opt_state=optax.adam(1e-3).init(lv["params"]), step=jnp.zeros((), jnp.int32))
st = restore_checkpoint("runs/lp_v2/backup", st)
lp_vars = {"params": st.params, "batch_stats": st.batch_stats}
ov = restore_checkpoint("trained/ocr_v1", {"params": ov["params"], "batch_stats": ov.get("batch_stats", {})})
m = eval_cascade(lp_task, lp_vars, ocr_task, ov, batches=4, batch=32)
m["lpd_step"] = int(st.step)
print(json.dumps(m))
