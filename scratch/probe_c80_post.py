import sys, numpy as np, cv2, jax, jax.numpy as jnp
sys.path.insert(0, '/root/repo')
from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.ops.postprocess import postprocess_from_raws
from yolo_v3_tpu.train.checkpoint import load_checkpoint
from yolo_v3_tpu.ops.letterbox import letterbox_host
from yolo_v3_tpu.utils import chiplock
from yolo_v3_tpu.utils.config import YoloConfig
chiplock.acquire("probe_c80_post")
ck = load_checkpoint('/tmp/c80_run/cocosim80/yolov3_cocosim80_checkpoint_001999.npz')
params, state = ck['params'], ck['state']
img = cv2.cvtColor(cv2.imread('/tmp/cocosim80/images/im00003.jpg'), cv2.COLOR_BGR2RGB)
x = jnp.asarray(letterbox_host(img, (416,416))[None])
raws, _ = jax.jit(lambda p,s,v: D.apply_yolonet(p,s,v,training=False))(params, state, x)

for name, cfg, ev in (
    ("display", YoloConfig(num_classes=80), False),
    ("eval-grid", YoloConfig(num_classes=80), True),
    ("eval-trunc", YoloConfig(num_classes=80, eval_grid_nms=False), True),
):
    out = jax.jit(lambda r, c=cfg, e=ev: postprocess_from_raws(
        r, c, 416, 0.25 if not e else 0.005, 0.45, is_eval=e))(raws)
    # normalize output to host rows
    rows = [np.asarray(t) for t in out] if isinstance(out, (tuple, list)) else [np.asarray(out)]
    print(name, [r.shape for r in rows])
    # print top few by score: find score-like array
    b, c_, s, v = rows[:4] if len(rows) >= 4 else (None,)*4
    if v is not None:
        valid = np.asarray(v[0]).astype(bool)
        sc = np.asarray(s[0])[valid]; cl = np.asarray(c_[0])[valid]
        order = np.argsort(-sc)[:6]
        print("  cls:", cl[order], " score:", np.round(sc[order], 3))
chiplock.release()
