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

def isolated_classes(lab):
    """class set of boxes that intersect no other box (relative coords)."""
    n = len(lab); iso = []
    for i in range(n):
        ci, xi, yi, wi, hi = lab[i]
        x0i, x1i = xi-wi/2, xi+wi/2; y0i, y1i = yi-hi/2, yi+hi/2
        ok = True
        for j in range(n):
            if j == i: continue
            cj, xj, yj, wj, hj = lab[j]
            if (min(x1i, xj+wj/2) > max(x0i, xj-wj/2) and
                    min(y1i, yj+hj/2) > max(y0i, yj-hj/2)):
                ok = False; break
        if ok: iso.append(i)
    return iso

def check(tf, tag, n=60):
    rng = np.random.default_rng(7)
    good = bad = 0; mism = []
    for idx in range(n):
        s = ds.load_raw(idx)
        iso = isolated_classes(s["label"])
        iso_cls = set(int(s["label"][i][0]) for i in iso)
        s["rng"] = rng
        out = tf(s)
        img, lab = out["img"], out["label"]
        img8 = (img*255).astype(np.uint8) if img.dtype != np.uint8 else img
        H, W = img8.shape[:2]
        for row in lab:
            if row[3] <= 0 or row[4] <= 0: continue
            c = int(row[0])
            if c not in iso_cls: continue  # only judge isolated boxes
            cx, cy = row[1]*W, row[2]*H; w, h = row[3]*W, row[4]*H
            x0,x1 = int(cx-w*0.15), int(cx+w*0.15)+1
            y0,y1 = int(cy-h*0.15), int(cy+h*0.15)+1
            patch = img8[max(y0,0):y1, max(x0,0):x1].reshape(-1,3).astype(np.float32)
            if len(patch)==0: continue
            med = np.median(patch, axis=0)
            cc = int(np.argmin(np.abs(COLS-med).sum(1)))
            good += (cc==c); bad += (cc!=c)
            if cc != c and len(mism) < 6: mism.append((idx, c, cc))
    print(f"{tag:30s}: {good} match / {bad} mismatch  {mism}", flush=True)

mk = lambda steps: T.Compose(steps + [T.ToArray(max_labels=90)])
check(mk([T.Letterbox((416,416))]), "letterbox only")
check(T.training_transform((416,416), hue=0.0, saturation=1.0, exposure=1.0), "full train tf (neutral HSV)")
