import sys, colorsys, numpy as np
sys.path.insert(0, '/root/repo')
from yolo_v3_tpu.data.datasets import ListDataset
from yolo_v3_tpu.data import transforms as T

def class_colors():
    cols = []
    for i in range(20):
        h = i / 20.0
        for s, v in ((1.0,1.0),(1.0,0.55),(0.45,1.0),(0.7,0.78)):
            r,g,b = colorsys.hsv_to_rgb(h,s,v)
            cols.append((int(r*255),int(g*255),int(b*255)))
    return np.array(cols, np.float32)
COLS = class_colors()
ds = ListDataset('/tmp/cocosim80/list.txt', trans_fn=None, require_labels=True)

def check(tf, tag, n=40):
    rng = np.random.default_rng(7)
    good = bad = 0
    for idx in range(n):
        s = ds.load_raw(idx); s["rng"] = rng
        out = tf(s)
        img, lab = out["img"], out["label"]
        img8 = (img*255).astype(np.uint8) if img.dtype != np.uint8 else img
        H, W = img8.shape[:2]
        for row in lab:
            if row[3] <= 0 or row[4] <= 0: continue
            c = int(row[0]); cx, cy = row[1]*W, row[2]*H
            w, h = row[3]*W, row[4]*H
            x0,x1 = int(cx-w*0.15), int(cx+w*0.15)+1
            y0,y1 = int(cy-h*0.15), int(cy+h*0.15)+1
            patch = img8[max(y0,0):y1, max(x0,0):x1].reshape(-1,3).astype(np.float32)
            if len(patch)==0: continue
            med = np.median(patch, axis=0)
            cc = int(np.argmin(np.abs(COLS-med).sum(1)))
            good += (cc==c); bad += (cc!=c)
    print(f"{tag:34s}: {good} match / {bad} mismatch", flush=True)

mk = lambda steps: T.Compose(steps + [T.ToArray(max_labels=90)])
check(mk([T.Letterbox((416,416))]), "letterbox only")
check(mk([T.RandomHorizontalFlip(0.5), T.Letterbox((416,416))]), "flip+letterbox")
check(mk([T.RandomJitterCrop(0.3), T.Letterbox((416,416))]), "jitter+letterbox")
check(mk([T.HSVAug(0.0,1.0,1.0), T.Letterbox((416,416))]), "neutral-HSV+letterbox")
