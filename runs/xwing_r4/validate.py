"""Round-4 x_wing validation: mAP + detections from a trained checkpoint.

Usage (on the real chip, after the training command in README.md):

    PYTHONPATH=/root/repo:$PYTHONPATH python runs/xwing_r4/validate.py \
        <checkpoint.npz> runs/xwing_r4

Produces, in the output directory:
- eval_bf16.json / eval_int8.json — mAP@0.5 on the 272-image training set
  (the reference's own overfit sanity metric, reference README.md:101),
  checkpoint path, per-demo-image detection scores, and for int8 the
  calibration recipe.  Each JSON names the exact inputs that produced it.
- det_bf16_<img>.png / det_int8_<img>.png — Detector.detect boxes drawn on
  two training images (conf 0.25), bf16 vs int8 serving paths.
- eval_bf16_recal.json — the same bf16 eval after recalibrate_bn on 4
  training batches (BN re-estimation; see models/darknet.py), reported
  separately so the plain-checkpoint number stays the headline.
"""

import json
import os
import os.path as osp
import sys

import cv2
import numpy as np

from yolo_v3_tpu.data.datasets import CVATDataset, export_cvat_to_list
from yolo_v3_tpu.detector import Detector
from yolo_v3_tpu.eval.pipeline import evaluate_detector
from yolo_v3_tpu.utils.config import YoloConfig
from yolo_v3_tpu.utils.profiling import enable_compilation_cache
from yolo_v3_tpu.viz.draw import save_detections_image

IMG_DIR = "/root/reference/custom_data/x_wing"
XML = "/root/reference/custom_data/5_x_wing.xml"
NAMES = ["x_wing", "tie"]
DEMO_IMAGES = ["x_wing_0051.jpg", "x_wing_0294.jpg"]

enable_compilation_cache()


def main(ckpt: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    export_dir = "/tmp/xwing_r4_eval"
    list_path = export_cvat_to_list(IMG_DIR, XML, export_dir)
    with open(list_path) as f:
        paths = [ln.strip() for ln in f if ln.strip()]
    print(f"[validate] {len(paths)} images", flush=True)

    cfg = YoloConfig(num_classes=2)
    demos = {
        name: cv2.cvtColor(cv2.imread(osp.join(IMG_DIR, name)),
                           cv2.COLOR_BGR2RGB)
        for name in DEMO_IMAGES
    }

    def run(det, tag, extra=None):
        demo_rows = {}
        for name, img in demos.items():
            res = det.detect([img], conf_thr=0.25, nms_thr=0.4, dim=416)[0]
            demo_rows[name] = [
                {"cls": NAMES[int(r[0])], "prob": round(float(r[5]), 3),
                 "xywh": [round(float(v), 1) for v in r[1:5]]}
                for r in res
            ]
            png = osp.join(out_dir, f"det_{tag}_{osp.splitext(name)[0]}.png")
            save_detections_image(img, res, png, classes=NAMES)
            print(f"[validate:{tag}] {name}: {len(res)} detections -> {png}",
                  flush=True)
        wd = f"/tmp/xwing_r4_eval/wd_{tag}"
        os.makedirs(wd, exist_ok=True)
        mAP = evaluate_detector(det, list_path, NAMES, wd, batch_size=8,
                                dim=416, is_letterbox=True)
        print(f"[validate:{tag}] mAP@0.5 = {mAP:.4f}", flush=True)
        out = {
            "mAP@0.5": mAP,
            "checkpoint": ckpt,
            "precision": tag.split("_")[0],
            "n_images": len(paths),
            "eval": "training-set overfit metric (reference README.md:101)",
            "demo_detections_conf0.25": demo_rows,
        }
        if extra:
            out.update(extra)
        with open(osp.join(out_dir, f"eval_{tag}.json"), "w") as f:
            json.dump(out, f, indent=1)
        return mAP

    det16 = Detector.from_checkpoint(ckpt, cfg, precision="bf16")
    run(det16, "bf16")

    calib = [cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
             for p in paths[:8]]
    det8 = Detector.from_checkpoint(ckpt, cfg, precision="int8",
                                    calib_images=calib)
    run(det8, "int8",
        extra={"calibration": "first 8 training images, letterboxed 416"})

    # BN re-estimation variant: running stats replaced by measured batch
    # stats over 4 training batches (models/darknet.py::recalibrate_bn)
    import jax.numpy as jnp
    from yolo_v3_tpu.models import darknet as D
    from yolo_v3_tpu.train.checkpoint import load_checkpoint

    composite = load_checkpoint(ckpt if ckpt.endswith(".npz")
                                else ckpt + ".npz")
    params, state = composite["params"], composite["state"]
    ds = CVATDataset(IMG_DIR, XML)
    from yolo_v3_tpu.ops.letterbox import letterbox_host

    batches = []
    for start in range(0, 32, 8):
        ims = []
        for i in range(start, start + 8):
            raw = ds.load_raw(i)["img"]
            ims.append(letterbox_host(raw, (416, 416)))
        batches.append(jnp.asarray(np.stack(ims)))
    state_recal = D.recalibrate_bn(params, state, batches)
    det16r = Detector(params, state_recal, cfg, precision="bf16")
    run(det16r, "bf16_recal",
        extra={"bn": "recalibrate_bn on 4x8 letterboxed training images"})


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "runs/xwing_r4")
