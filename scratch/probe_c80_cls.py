import sys, numpy as np, cv2, jax, jax.numpy as jnp
sys.path.insert(0, '/root/repo')
from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.train.checkpoint import load_checkpoint
from yolo_v3_tpu.ops.letterbox import letterbox_host, letterbox_params
from yolo_v3_tpu.utils import chiplock
chiplock.acquire("probe_c80_cls")
C = 80
ck = load_checkpoint('/tmp/c80_pilot/c80pilot/yolov3_c80pilot_checkpoint_000399.npz')
params, state = ck['params'], ck['state']
paths = [l.strip() for l in open('/tmp/cocosim80/list.txt')][:16]
imgs = np.stack([letterbox_host(cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB), (416,416)) for p in paths])
x = jnp.asarray(imgs)
rawsE, _ = jax.jit(lambda p,s,v: D.apply_yolonet(p,s,v,training=False))(params, state, x)
rawsT, _ = jax.jit(lambda p,s,v: D.apply_yolonet(p,s,v,training=True))(params, state, x)
sig = lambda v: 1/(1+np.exp(-np.clip(v, -30, 30)))

for tag, raws in (("eval/running", rawsE), ("train/batch", rawsT)):
    hit = tot = 0; psum = 0.0
    for bi, p in enumerate(paths):
        img = cv2.imread(p); H0, W0 = img.shape[:2]
        rw, rh, xp, yp, _ = letterbox_params(W0, H0, 416, 416)
        for ln in open(p.replace('/images/','/labels/').rsplit('.',1)[0]+'.txt'):
            c, xc, yc, w, h = map(float, ln.split())
            bx, by = xc*rw+xp, yc*rh+yp
            best_p, best_c = 0, -1
            for r in raws:
                rr = np.asarray(r[bi], np.float32)
                Hc = rr.shape[0]; stride = 416//Hc
                gy, gx = min(int(by/stride), Hc-1), min(int(bx/stride), Hc-1)
                cell = rr[gy, gx].reshape(3, 5+C)
                a = int(np.argmax(cell[:,4]))
                cp = sig(cell[a, 5:])
                if cp.max() > best_p: best_p, best_c = float(cp.max()), int(np.argmax(cp))
            tot += 1; hit += (best_c == int(c)); psum += best_p
    print(f"{tag}: GT-cell class top1 acc {hit}/{tot} = {hit/tot:.3f}, mean max clsprob {psum/tot:.3f}", flush=True)
chiplock.release()
