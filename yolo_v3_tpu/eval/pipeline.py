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
    use_native_loader: Optional[bool] = None,
) -> str:
    """Run eval-mode detection over an image-list file and write the COCO
    results json (reference generate_results_file, evaluate.py:208-219).

    When the native C++ loader is available and ``is_letterbox`` is on, the
    decode+letterbox stage runs in the native thread pool
    (data/native_loader.py) and images bypass Python entirely; failures
    (non-JPEG files) fall back to the cv2 path per image.
    """
    ds = ListDataset(target_txt)
    detector.letterbox = is_letterbox
    eff_dim = dim or detector.config.img_dim

    native = None
    if use_native_loader is None:
        use_native_loader = is_letterbox
    # int8 detectors with host preprocessing consume uint8 images directly
    # (models/quantized.py u8 entry): keep the native loader in uint8 too —
    # same cv2 pixel semantics, 4x less host->device transfer
    u8_feed = bool(getattr(detector, "_u8_feed", False))
    if use_native_loader and is_letterbox:
        from yolo_v3_tpu.data.native_loader import NativePrefetcher, native_available

        if native_available():
            native = NativePrefetcher(
                n_threads=2, dtype="uint8" if u8_feed else "float32"
            )

    def detect_device(imgs_np, orgs_np, preprocessed: bool = False):
        """Launch eval-mode detection; returns the device-side [B, M, 8]
        result WITHOUT forcing a host readback (pipelined by the caller)."""
        import jax.numpy as jnp

        pipeline = detector._pipeline(
            conf_thr if conf_thr is not None else detector.config.eval_conf_thr,
            nms_thr if nms_thr is not None else detector.config.eval_nms_thr,
            True, True,
        )
        x = imgs_np if preprocessed else jnp.asarray(imgs_np)
        org = orgs_np if preprocessed else jnp.asarray(orgs_np)
        return pipeline(detector.params, x, org)

    from yolo_v3_tpu.ops.postprocess import detections_to_lists

    def to_rows(res):
        return [rows[:, [6, 0, 1, 2, 3, 5, 4]] for rows in detections_to_lists(res)]

    try:
        with JsonPredictionWriter(out, class_names, is_letterbox) as writer:
            paths = ds.img_list
            pending = None  # (ids, device_result) — 1-deep pipeline so the
            # host readback of batch k overlaps device compute of batch k+1
            for start in range(0, len(paths), batch_size):
                chunk = paths[start:start + batch_size]
                ids = [get_image_id_from_path(p) for p in chunk]

                if native is not None:
                    imgs_np, orgs_np, ok = native.load_letterboxed(
                        chunk, (eff_dim, eff_dim)
                    )
                    for j, good in enumerate(ok):
                        if not good:  # cv2 fallback per image
                            raw = ds.load_raw(start + j)["img"]
                            from yolo_v3_tpu.ops.letterbox import (
                                letterbox_host, letterbox_host_u8)

                            lb = letterbox_host_u8 if u8_feed else letterbox_host
                            imgs_np[j] = lb(raw, (eff_dim, eff_dim))
                            orgs_np[j] = (raw.shape[1], raw.shape[0])
                    res = detect_device(imgs_np, orgs_np)
                else:
                    imgs = [ds.load_raw(start + j)["img"] for j in range(len(chunk))]
                    x, org = detector.preprocess(imgs, dim)
                    res = detect_device(x, org, preprocessed=True)

                if pending is not None:
                    for image_id, rows in zip(pending[0], to_rows(pending[1])):
                        writer.add(image_id, rows)
                pending = (ids, res)
                if progress:
                    print(f"\reval {min(start + batch_size, len(paths))}/"
                          f"{len(paths)}", end="", file=sys.stderr)
            if pending is not None:
                for image_id, rows in zip(pending[0], to_rows(pending[1])):
                    writer.add(image_id, rows)
            if progress:
                print(file=sys.stderr)
    finally:
        if native is not None:
            native.close()
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
