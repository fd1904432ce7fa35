"""Full-config demo validation: mAP + detections from the trained
checkpoint on the synthetic cocosim training set (same overfit sanity
metric as runs/xwing_r4; reference README.md:101).

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python runs/fullcfg_r4/validate.py \
        <checkpoint.npz> runs/fullcfg_r4
"""

import json
import os
import os.path as osp
import sys

import cv2

from yolo_v3_tpu.detector import Detector
from yolo_v3_tpu.eval.pipeline import evaluate_detector
from yolo_v3_tpu.utils.config import YoloConfig
from yolo_v3_tpu.utils.profiling import enable_compilation_cache
from yolo_v3_tpu.viz.draw import save_detections_image

LIST = "/tmp/cocosim/list.txt"
NAMES = ["red", "green", "blue"]
DEMOS = ["/tmp/cocosim/images/im00003.jpg", "/tmp/cocosim/images/im00017.jpg"]

enable_compilation_cache()


def main(ckpt: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    cfg = YoloConfig(num_classes=3)
    det = Detector.from_checkpoint(ckpt, cfg, precision="bf16")

    demo_rows = {}
    for p in DEMOS:
        img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        res = det.detect([img], conf_thr=0.25, nms_thr=0.4, dim=416)[0]
        name = osp.basename(p)
        demo_rows[name] = [
            {"cls": NAMES[int(r[0])], "prob": round(float(r[5]), 3)}
            for r in res
        ]
        png = osp.join(out_dir, f"det_{osp.splitext(name)[0]}.png")
        save_detections_image(img, res, png, classes=NAMES)
        print(f"[validate] {name}: {len(res)} detections -> {png}", flush=True)

    wd = "/tmp/cocosim_eval_wd"
    os.makedirs(wd, exist_ok=True)
    mAP = evaluate_detector(det, LIST, NAMES, wd, batch_size=8, dim=416,
                            is_letterbox=True)
    print(f"[validate] mAP@0.5 = {mAP:.4f}", flush=True)
    with open(osp.join(out_dir, "eval.json"), "w") as f:
        json.dump({
            "mAP@0.5": mAP,
            "checkpoint": ckpt,
            "n_images": 512,
            "eval": "training-set overfit metric, synthetic cocosim",
            "demo_detections_conf0.25": demo_rows,
        }, f, indent=1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "runs/fullcfg_r4")
