"""Evaluation pipeline: batched inference -> COCO results json -> mAP.

Equivalent of the reference's eval flow (reference evaluate.py:197-219 +
evaluate.ipynb): iterate the validation list in batches, run the detector in
eval mode (conf 0.005 / NMS 0.45, all (box, class) pairs — evaluate.py:203),
map boxes back to original-image pixels, stream a results json, score with
pycocotools or the in-repo evaluator.
"""

from __future__ import annotations

import sys
from typing import Optional, Sequence

import numpy as np

from yolo_v3_tpu.data.datasets import ListDataset
from yolo_v3_tpu.eval.coco_json import (
    JsonPredictionWriter,
    generate_annotations_file,
    get_image_id_from_path,
)
from yolo_v3_tpu.eval.cocoeval import evaluate_map


def generate_results_file(
    detector,
    target_txt: str,
    class_names: Sequence[str],
    out: str,
    batch_size: int = 8,
    dim: Optional[int] = None,
    is_letterbox: bool = False,
    conf_thr: Optional[float] = None,
    nms_thr: Optional[float] = None,
    progress: bool = True,
) -> str:
    """Run eval-mode detection over an image-list file and write the COCO
    results json (reference generate_results_file, evaluate.py:208-219)."""
    ds = ListDataset(target_txt)
    detector.letterbox = is_letterbox

    with JsonPredictionWriter(out, class_names, is_letterbox) as writer:
        batch_imgs, batch_ids = [], []

        def flush():
            if not batch_imgs:
                return
            preds = detector.detect(
                batch_imgs, conf_thr=conf_thr, nms_thr=nms_thr,
                is_eval=True, dim=dim,
            )
            for image_id, rows in zip(batch_ids, preds):
                writer.add(image_id, rows)
            batch_imgs.clear()
            batch_ids.clear()

        for i in range(len(ds)):
            sample = ds.load_raw(i)
            batch_imgs.append(sample["img"])
            batch_ids.append(get_image_id_from_path(sample["img_path"]))
            if len(batch_imgs) == batch_size:
                flush()
                if progress:
                    print(f"\reval {i + 1}/{len(ds)}", end="", file=sys.stderr)
        flush()
        if progress:
            print(file=sys.stderr)
    return out


def evaluate_detector(
    detector,
    target_txt: str,
    class_names: Sequence[str],
    workdir: str,
    batch_size: int = 8,
    dim: Optional[int] = None,
    is_letterbox: bool = False,
) -> float:
    """Full mAP@0.5 evaluation: GT json + results json + scoring."""
    import os.path as osp

    gt_path = osp.join(workdir, "annotations.json")
    res_path = osp.join(workdir, "results.json")
    generate_annotations_file(target_txt, class_names, gt_path)
    generate_results_file(
        detector, target_txt, class_names, res_path,
        batch_size=batch_size, dim=dim, is_letterbox=is_letterbox,
    )
    return evaluate_map(gt_path, res_path)
