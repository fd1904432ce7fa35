"""Numpy oracle decode on the checkpoint's raws: are the raw head outputs
consistent with the GT (raws good, postprocess broken) or not (loss/decode
layout mismatch)?"""
import sys, numpy as np, cv2, jax, jax.numpy as jnp
sys.path.insert(0, '/root/repo')
from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.train.checkpoint import load_checkpoint
from yolo_v3_tpu.ops.letterbox import letterbox_host, letterbox_params
from yolo_v3_tpu.utils import chiplock
from yolo_v3_tpu.utils.config import YoloConfig
chiplock.acquire("probe_c80_oracle")
cfg = YoloConfig(num_classes=80)
C = 80
ck = load_checkpoint('/tmp/c80_run/cocosim80/yolov3_cocosim80_checkpoint_001999.npz')
params, state = ck['params'], ck['state']
img = cv2.cvtColor(cv2.imread('/tmp/cocosim80/images/im00003.jpg'), cv2.COLOR_BGR2RGB)
H0, W0 = img.shape[:2]
x = jnp.asarray(letterbox_host(img, (416,416))[None])
raws, _ = jax.jit(lambda p,s,v: D.apply_yolonet(p,s,v,training=False))(params, state, x)
chiplock.release()

print("anchors cfg:", cfg.anchors if hasattr(cfg, 'anchors') else "?")
sig = lambda v: 1/(1+np.exp(-v))
# anchor tables: reference yolov3 anchors by scale (large->small strides?)
ANCH = np.array(cfg.anchors, np.float32).reshape(-1, 2) if hasattr(cfg, 'anchors') else None
print("raw shapes:", [r.shape for r in raws])
for si, r in enumerate(raws):
    r = np.asarray(r, np.float32)[0]
    Hc, Wc = r.shape[:2]
    stride = 416 // Hc
    rr = r.reshape(Hc, Wc, 3, 5 + C)
    obj = sig(rr[..., 4])
    top = np.unravel_index(np.argsort(-obj.ravel())[:5], obj.shape)
    for gy, gx, a in zip(*top):
        o = obj[gy, gx, a]
        if o < 0.3: continue
        cell = rr[gy, gx, a]
        cls = int(np.argmax(cell[5:])); cp = sig(cell[5 + cls])
        bx = (sig(cell[0]) + gx) * stride; by = (sig(cell[1]) + gy) * stride
        print(f"scale{si} stride{stride} cell({gy},{gx},a{a}): obj {o:.3f} "
              f"cls {cls} p {cp:.3f} center ({bx:.0f},{by:.0f})", flush=True)
# GT in letterbox coords
rw, rh, xp, yp, _ = letterbox_params(W0, H0, 416, 416)
print("GT (letterboxed center, class):")
for ln in open('/tmp/cocosim80/labels/im00003.txt').read().strip().splitlines()[:8]:
    c, xc, yc, w, h = map(float, ln.split())
    print(f"  cls {int(c)} center ({xc*rw+xp:.0f},{yc*rh+yp:.0f}) size ({w*rw:.0f}x{h*rh:.0f})")
