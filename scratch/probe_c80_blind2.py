"""Distinguish stale-running-stats vs fold bug, and measure stat drift."""
import sys, numpy as np, cv2, jax, jax.numpy as jnp
sys.path.insert(0, '/root/repo')
from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.train.checkpoint import load_checkpoint
from yolo_v3_tpu.ops.letterbox import letterbox_host
from yolo_v3_tpu.utils import chiplock
from yolo_v3_tpu.utils.config import YoloConfig

chiplock.acquire("probe_c80_blind2")
cfg = YoloConfig(num_classes=80)
ck = load_checkpoint('/tmp/c80_run/cocosim80/yolov3_cocosim80_checkpoint_001999.npz')
params, state = ck['params'], ck['state']

paths = [l.strip() for l in open('/tmp/cocosim80/list.txt')][:32]
imgs = np.stack([letterbox_host(
    cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB), (416, 416))
    for p in paths]).astype(np.float32) / 255.0
x = jnp.asarray(imgs)

# 1) eval-mode UNFOLDED forward (running stats)
raws_eval, _ = jax.jit(lambda p, s, v: D.apply_yolonet(p, s, v, training=False))(params, state, x)
# 2) train-mode forward at bs32 (batch stats) + captured new state
raws_tr, new_state = jax.jit(lambda p, s, v: D.apply_yolonet(p, s, v, training=True))(params, state, x)

def maxobj(raws):
    outs = []
    for r in raws:
        na = r.shape[-1] // (5 + cfg.num_classes)
        rr = np.asarray(r, np.float32).reshape(*r.shape[:3], na, 5 + cfg.num_classes)
        outs.append(float(jax.nn.sigmoid(rr[..., 4]).max()))
    return [f"{o:.4f}" for o in outs]

print("eval/unfolded+running:", maxobj(raws_eval), flush=True)
print("train/batch bs32     :", maxobj(raws_tr), flush=True)

# 3) stat drift: stored running stats vs the fresh bs32 batch stats the
# train forward just computed (new_state ~= 0.9*stored + 0.1*batch)
def walk(s1, s2, prefix=""):
    if isinstance(s1, dict) and "mean" in s1:
        bm = (np.asarray(s2["mean"]) - 0.9 * np.asarray(s1["mean"])) / 0.1
        bv = (np.asarray(s2["var"]) - 0.9 * np.asarray(s1["var"])) / 0.1
        sm, sv = np.asarray(s1["mean"]), np.asarray(s1["var"])
        return [(prefix, float(np.abs(sm - bm).mean()), float(np.abs(sv - bv).mean()),
                 float(np.abs(bm).mean()), float(bv.mean()))]
    out = []
    if isinstance(s1, dict):
        for k in s1:
            out.extend(walk(s1[k], s2[k], prefix + "/" + k))
    return out

rows = walk(state, jax.tree.map(np.asarray, new_state))
print(f"{'layer':44s} |dmean| |dvar|  |batch_mean| batch_var")
for i, (n, dm, dv, bm, bv) in enumerate(rows):
    if i % 9 == 0 or dm > 1:
        print(f"{n:44s} {dm:7.3f} {dv:7.3f} {bm:9.3f} {bv:9.3f}")
chiplock.release()
