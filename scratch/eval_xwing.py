"""Post-training validation driver for the x_wing run (round 3).

One process, one TPU client: bf16 mAP on the training set, detections
drawn from the trained checkpoint, int8 quantization of the same
checkpoint (calibrated on real training images), int8 mAP + detections.
Artifacts land in runs/xwing_r3/.
"""

import json
import os
import sys

import cv2
import numpy as np

CKPT = sys.argv[1]
LIST = "/tmp/xwing_eval/list.txt"
OUT = "/root/repo/runs/xwing_r3"
NAMES = ["x_wing", "tie"]
DEMO_IMG = None  # first image of the list

from yolo_v3_tpu.detector import Detector
from yolo_v3_tpu.eval.pipeline import evaluate_detector
from yolo_v3_tpu.utils.config import YoloConfig
from yolo_v3_tpu.utils.profiling import enable_compilation_cache
from yolo_v3_tpu.viz.draw import save_detections_image

enable_compilation_cache()

cfg = YoloConfig(num_classes=2)
with open(LIST) as f:
    paths = [ln.strip() for ln in f if ln.strip()]
DEMO_IMG = paths[0]
demo = cv2.cvtColor(cv2.imread(DEMO_IMG), cv2.COLOR_BGR2RGB)


def run(det, tag):
    # From-scratch nets (no pretrained backbone) calibrate conf slowly;
    # draw at 0.25 and report the raw score distribution for the record.
    res = det.detect([demo], conf_thr=0.25, nms_thr=0.4, dim=416)[0]
    save_detections_image(demo, res, f"{OUT}/det_{tag}.png", NAMES)
    demo_rows = [(NAMES[int(r[0])], round(float(r[5]), 3)) for r in res]
    print(f"[{tag}] demo {os.path.basename(DEMO_IMG)} (conf 0.25): "
          f"{demo_rows}", flush=True)
    low = det.detect([demo], conf_thr=0.01, nms_thr=0.4, dim=416)[0]
    top = sorted(low, key=lambda r: -float(r[5]))[:5]
    top_rows = [(NAMES[int(r[0])], round(float(r[5]), 3)) for r in top]
    print(f"[{tag}] top-5 raw: {top_rows}", flush=True)
    os.makedirs(f"/tmp/xwing_eval/wd_{tag}", exist_ok=True)
    mAP = evaluate_detector(det, LIST, NAMES, f"/tmp/xwing_eval/wd_{tag}",
                            batch_size=8, dim=416, is_letterbox=True)
    with open(f"{OUT}/eval_{tag}.json", "w") as f:
        json.dump({"mAP@0.5": mAP, "checkpoint": CKPT, "precision": tag,
                   "n_images": len(paths),
                   "demo_image": os.path.basename(DEMO_IMG),
                   "demo_detections_conf_0.25": demo_rows,
                   "demo_top5_raw_conf": top_rows}, f, indent=1)
    print(f"[{tag}] mAP@0.5 = {mAP:.4f} on {len(paths)} training images",
          flush=True)
    return mAP


det16 = Detector.from_checkpoint(CKPT, cfg, precision="bf16")
m16 = run(det16, "bf16")

# int8: calibrate activation scales on real training images (the first 8)
calib = [cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB) for p in paths[:8]]
det8 = Detector.from_checkpoint(CKPT, cfg, precision="int8",
                                calib_images=calib)
det8.save_quantized("/tmp/xwing_full/xwing_int8.npz")
print("quantized artifact written", flush=True)
m8 = run(det8, "int8")
print(json.dumps({"mAP_bf16": m16, "mAP_int8": m8,
                  "delta": m16 - m8}), flush=True)
