"""Empirical label-integrity check: run the REAL training transform on real
cocosim80 items (HSV neutralized) and verify each emitted label's class
against the image's color-keyed content at the box center."""
import sys, colorsys, numpy as np, cv2
sys.path.insert(0, '/root/repo')
from yolo_v3_tpu.data.datasets import ListDataset
from yolo_v3_tpu.data.transforms import training_transform

def class_colors():
    cols = []
    for i in range(20):
        h = i / 20.0
        for s, v in ((1.0, 1.0), (1.0, 0.55), (0.45, 1.0), (0.7, 0.78)):
            r, g, b = colorsys.hsv_to_rgb(h, s, v)
            cols.append((int(r*255), int(g*255), int(b*255)))
    return np.array(cols, np.float32)

COLS = class_colors()
# neutralize HSV (hue=0, sat=1 range, exp=1 range => no-op draws)
tf = training_transform((416,416), hue=0.0, saturation=1.0, exposure=1.0,
                        jitter=0.3, max_labels=90)
ds = ListDataset('/tmp/cocosim80/list.txt', trans_fn=None, require_labels=True)
rng = np.random.default_rng(7)
good = bad = 0
mism = []
for idx in range(40):
    s = ds.load_raw(idx)
    s["rng"] = rng
    out = tf(s)
    img, lab = out["img"], out["label"]
    if img.dtype != np.uint8: img8 = (img*255).astype(np.uint8)
    else: img8 = img
    for row in lab:
        if row[3] <= 0 or row[4] <= 0: continue
        c = int(row[0]); cx, cy = row[1]*416, row[2]*416
        w, h = row[3]*416, row[4]*416
        x0, x1 = int(cx - w*0.15), int(cx + w*0.15) + 1
        y0, y1 = int(cy - h*0.15), int(cy + h*0.15) + 1
        patch = img8[max(y0,0):y1, max(x0,0):x1].reshape(-1,3).astype(np.float32)
        if len(patch) == 0: continue
        # boxes may overlap: take the mode-ish via median
        med = np.median(patch, axis=0)
        d = np.abs(COLS - med).sum(1)
        cc = int(np.argmin(d))
        if cc == c: good += 1
        else:
            bad += 1
            if len(mism) < 8: mism.append((idx, c, cc, float(d.min())))
print(f"label-class vs pixel-color: {good} match / {bad} mismatch")
print("sample mismatches (idx, label_cls, color_cls, colordist):", mism)
