"""Round-5 flagship validation: mAP (bf16 + int8) + eval-pipeline timing
on the 5k-image / 80-class synthetic set (VERDICT r4 missing #4 / next #5).

Runs the FULL eval pipeline (`evaluate_detector`: native loader,
letterbox, device postprocess, COCO-json writer, AP scorer) at the
reference's bs8/416 eval configuration (reference evaluate.py:208-219),
records wall time per stage, and renders two demo detections.

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python runs/fullcfg_r5/validate.py \
        <checkpoint.npz> runs/fullcfg_r5
"""

import json
import os
import os.path as osp
import sys
import time

import cv2

from yolo_v3_tpu.detector import Detector
from yolo_v3_tpu.eval.pipeline import evaluate_detector
from yolo_v3_tpu.utils import chiplock
from yolo_v3_tpu.utils.config import YoloConfig
from yolo_v3_tpu.utils.profiling import enable_compilation_cache
from yolo_v3_tpu.viz.draw import save_detections_image

LIST = "/tmp/cocosim80/list.txt"
NAMES = [f"c{i:02d}" for i in range(80)]
DEMOS = ["/tmp/cocosim80/images/im00003.jpg",
         "/tmp/cocosim80/images/im00017.jpg"]
# eval on the first 1000 images: the overfit sanity metric doesn't need
# all 5k, and bs8 eval of 5k at one image/dispatch-batch is chip-hours
EVAL_N = 1000

enable_compilation_cache()


def main(ckpt: str, out_dir: str) -> None:
    chiplock.acquire("fullcfg_r5_validate")
    os.makedirs(out_dir, exist_ok=True)
    cfg = YoloConfig(num_classes=80)

    eval_list = "/tmp/cocosim80/eval1k.txt"
    with open(LIST) as f:
        paths = [ln.strip() for ln in f if ln.strip()][:EVAL_N]
    with open(eval_list, "w") as f:
        f.write("\n".join(paths) + "\n")

    out = {"checkpoint": ckpt, "n_images_eval": len(paths),
           "eval": "training-set overfit metric, synthetic cocosim80"}

    for prec in ("bf16", "int8"):
        if prec == "int8":
            # calibrate on 8 real training images (r4 protocol)
            calib = [cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
                     for p in paths[:8]]
            det = Detector.from_checkpoint(ckpt, cfg, precision="int8",
                                           calib_images=calib)
        else:
            det = Detector.from_checkpoint(ckpt, cfg, precision="bf16")

        if prec == "bf16":
            demo_rows = {}
            for p in DEMOS:
                img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
                res = det.detect([img], conf_thr=0.25, nms_thr=0.4,
                                 dim=416)[0]
                name = osp.basename(p)
                demo_rows[name] = [
                    {"cls": NAMES[int(r[0])], "prob": round(float(r[5]), 3)}
                    for r in res
                ]
                png = osp.join(out_dir, f"det_{osp.splitext(name)[0]}.png")
                save_detections_image(img, res, png, classes=NAMES)
                print(f"[validate] {name}: {len(res)} det -> {png}",
                      flush=True)
            out["demo_detections_conf0.25"] = demo_rows

        wd = f"/tmp/c80_eval_wd_{prec}"
        os.makedirs(wd, exist_ok=True)
        t0 = time.time()
        mAP = evaluate_detector(det, eval_list, NAMES, wd, batch_size=8,
                                dim=416, is_letterbox=True)
        dt = time.time() - t0
        out[f"mAP@0.5_{prec}"] = mAP
        out[f"eval_pipeline_wall_s_{prec}"] = round(dt, 1)
        out[f"eval_imgs_per_sec_wall_{prec}"] = round(len(paths) / dt, 1)
        print(f"[validate] {prec}: mAP@0.5 = {mAP:.4f} "
              f"({dt:.0f}s wall, {len(paths) / dt:.1f} imgs/s incl. "
              "host loader on 1 core)", flush=True)

    with open(osp.join(out_dir, "eval.json"), "w") as f:
        json.dump(out, f, indent=1)
    chiplock.release()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "runs/fullcfg_r5")
