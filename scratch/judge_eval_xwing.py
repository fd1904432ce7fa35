"""Judge verification (round 3): validate the converged x_wing checkpoint.

Uses the repo's own exporter + eval pipeline + Detector, on the real chip:
bf16 mAP@0.5 on the training set, demo detections, int8 of the same
checkpoint, int8 mAP.  Ground truth comes from export_cvat_to_list (the
symlinked images/ + labels/ layout the eval pipeline's label-path
convention requires).
"""

import json
import os
import sys

import cv2
import numpy as np

CKPT = sys.argv[1]
OUT_DIR = "/tmp/judge_xwing_eval"
NAMES = ["x_wing", "tie"]

from yolo_v3_tpu.data.datasets import export_cvat_to_list
from yolo_v3_tpu.detector import Detector
from yolo_v3_tpu.eval.pipeline import evaluate_detector
from yolo_v3_tpu.utils.config import YoloConfig
from yolo_v3_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

LIST = export_cvat_to_list(
    "/root/reference/custom_data/x_wing",
    "/root/reference/custom_data/5_x_wing.xml",
    OUT_DIR,
)
with open(LIST) as f:
    paths = [ln.strip() for ln in f if ln.strip()]
print(f"[judge] {len(paths)} images exported", flush=True)

cfg = YoloConfig(num_classes=2)
demo = cv2.cvtColor(cv2.imread(paths[0]), cv2.COLOR_BGR2RGB)

results = {}


def run(det, tag):
    res = det.detect([demo], conf_thr=0.25, nms_thr=0.4, dim=416)[0]
    rows = [(NAMES[int(r[0])], round(float(r[5]), 3)) for r in res]
    print(f"[judge:{tag}] demo detections (conf 0.25): {rows}", flush=True)
    wd = f"{OUT_DIR}/wd_{tag}"
    os.makedirs(wd, exist_ok=True)
    mAP = evaluate_detector(det, LIST, NAMES, wd, batch_size=8, dim=416,
                            is_letterbox=True)
    print(f"[judge:{tag}] mAP@0.5 = {mAP:.4f}", flush=True)
    results[tag] = {"mAP": mAP, "demo": rows}
    return mAP


det16 = Detector.from_checkpoint(CKPT, cfg, precision="bf16")
run(det16, "bf16")

calib = [cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB) for p in paths[:8]]
det8 = Detector.from_checkpoint(CKPT, cfg, precision="int8",
                                calib_images=calib)
run(det8, "int8")

print("[judge] " + json.dumps(results), flush=True)
