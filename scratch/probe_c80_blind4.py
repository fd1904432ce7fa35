import sys, numpy as np, cv2, jax, jax.numpy as jnp
sys.path.insert(0, '/root/repo')
from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.train.checkpoint import load_checkpoint
from yolo_v3_tpu.ops.letterbox import letterbox_host
from yolo_v3_tpu.utils import chiplock
from yolo_v3_tpu.utils.config import YoloConfig
chiplock.acquire("probe_c80_blind4")
cfg = YoloConfig(num_classes=80)
ck = load_checkpoint('/tmp/c80_run/cocosim80/yolov3_cocosim80_checkpoint_001999.npz')
params, state = ck['params'], ck['state']
paths = [l.strip() for l in open('/tmp/cocosim80/list.txt')][:32]
imgs = np.stack([letterbox_host(cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB), (416,416))
                 for p in paths])   # ALREADY [0,1] float32
x = jnp.asarray(imgs)
def maxobj(raws):
    outs=[]
    for r in raws:
        na = r.shape[-1]//(5+cfg.num_classes)
        rr = np.asarray(r, np.float32).reshape(*r.shape[:3], na, 5+cfg.num_classes)
        outs.append(float(jax.nn.sigmoid(rr[...,4]).max()))
    return [f"{o:.4f}" for o in outs]
re_, _ = jax.jit(lambda p,s,v: D.apply_yolonet(p,s,v,training=False))(params, state, x)
rt, ns = jax.jit(lambda p,s,v: D.apply_yolonet(p,s,v,training=True))(params, state, x)
print("eval/unfolded+running:", maxobj(re_), flush=True)
print("train/batch bs32     :", maxobj(rt), flush=True)
def walk(s1, s2, prefix=""):
    if isinstance(s1, dict) and "mean" in s1:
        bm=(np.asarray(s2["mean"])-0.9*np.asarray(s1["mean"]))/0.1
        bv=(np.asarray(s2["var"])-0.9*np.asarray(s1["var"]))/0.1
        sv=np.asarray(s1["var"]); sm=np.asarray(s1["mean"])
        rel=float(np.abs(sv-bv).mean()/(np.abs(bv).mean()+1e-6))
        return [(rel, prefix, float(sm.mean()), float(bm.mean()), float(sv.mean()), float(bv.mean()))]
    out=[]
    if isinstance(s1, dict):
        for k in sorted(s1): out.extend(walk(s1[k], s2[k], prefix+"/"+k))
    return out
rows = sorted(walk(state, jax.tree.map(np.asarray, ns)), reverse=True)
print(f"{'rel_var_err':>11s} {'layer':40s} {'st_mean':>8s} {'bt_mean':>8s} {'st_var':>8s} {'bt_var':>8s}")
for rel,n,sm,bm,sv,bv in rows[:10]:
    print(f"{rel:11.2f} {n:40s} {sm:8.3f} {bm:8.3f} {sv:8.3f} {bv:8.3f}")
chiplock.release()
