"""Eval pipeline tests: JSON builders, AP@0.5 evaluator, end-to-end mAP."""

import json

import numpy as np
import pytest

from yolo_v3_tpu.eval.coco_json import (
    JsonPredictionWriter,
    create_annotations_dict,
    generate_annotations_file,
    get_image_id_from_path,
)
from yolo_v3_tpu.eval.cocoeval import average_precision_at_iou, evaluate_map


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("cocoeval")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(3)
    paths = []
    for i in range(6):
        img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
        p = root / "images" / f"val_{i:06d}.jpg"
        cv2.imwrite(str(p), img)
        n = int(rng.integers(1, 4))
        rows = np.zeros((n, 5), np.float32)
        rows[:, 0] = rng.integers(0, 3, n)
        rows[:, 1:3] = rng.uniform(0.3, 0.7, (n, 2))
        rows[:, 3:5] = rng.uniform(0.15, 0.3, (n, 2))
        np.savetxt(str(root / "labels" / f"val_{i:06d}.txt"), rows, fmt="%.6f")
        paths.append(str(p))
    (root / "val.txt").write_text("\n".join(paths) + "\n")
    return root


class TestJsonBuilders:
    def test_image_id_parsing(self):
        assert get_image_id_from_path("/x/COCO_val2014_000000397133.jpg") == 397133
        assert get_image_id_from_path("val_000005.jpg") == 5

    def test_annotations_dict(self, coco_dir):
        d = create_annotations_dict(str(coco_dir / "val.txt"), ["a", "b", "c"])
        assert len(d["images"]) == 6
        assert d["categories"] == [{"id": 0, "name": "a"}, {"id": 1, "name": "b"},
                                   {"id": 2, "name": "c"}]
        assert all(a["bbox"][2] > 0 and a["bbox"][3] > 0 for a in d["annotations"])
        # bbox in original pixels
        img0 = d["images"][0]
        for a in d["annotations"]:
            if a["image_id"] == img0["id"]:
                assert a["bbox"][0] + a["bbox"][2] <= img0["width"] + 1e-6

    def test_writer_roundtrip(self, tmp_path):
        p = str(tmp_path / "res.json")
        with JsonPredictionWriter(p, ["a"]) as w:
            w.add(42, np.array([[0, 10, 20, 30, 40, 0.9, 0.8]]))
            w.add(43, np.zeros((0, 7)))
        data = json.load(open(p))
        assert data == [{"image_id": 42, "category_id": 0,
                         "bbox": [10.0, 20.0, 30.0, 40.0], "score": 0.9}]


class TestAPEvaluator:
    def _gt(self):
        return {
            "categories": [{"id": 0, "name": "a"}, {"id": 1, "name": "b"}],
            "images": [{"id": 1}, {"id": 2}],
            "annotations": [
                {"id": 0, "image_id": 1, "category_id": 0, "bbox": [10, 10, 50, 50],
                 "iscrowd": 0, "area": 2500},
                {"id": 1, "image_id": 2, "category_id": 0, "bbox": [30, 30, 40, 40],
                 "iscrowd": 0, "area": 1600},
                {"id": 2, "image_id": 2, "category_id": 1, "bbox": [100, 100, 30, 30],
                 "iscrowd": 0, "area": 900},
            ],
        }

    def test_perfect_detections_ap1(self):
        gt = self._gt()
        results = [
            {"image_id": a["image_id"], "category_id": a["category_id"],
             "bbox": a["bbox"], "score": 0.9}
            for a in gt["annotations"]
        ]
        mAP, per_cat = average_precision_at_iou(gt, results)
        assert mAP == pytest.approx(1.0, abs=1e-6)

    def test_no_detections_ap0(self):
        mAP, per_cat = average_precision_at_iou(self._gt(), [])
        assert mAP == 0.0

    def test_half_matched(self):
        gt = self._gt()
        # only one of two cat-0 GTs found, perfect cat-1
        results = [
            {"image_id": 1, "category_id": 0, "bbox": [10, 10, 50, 50], "score": 0.9},
            {"image_id": 2, "category_id": 1, "bbox": [100, 100, 30, 30], "score": 0.9},
        ]
        mAP, per_cat = average_precision_at_iou(gt, results)
        # cat0: recall caps at 0.5 with precision 1 -> AP ~= 0.5 (51/101 grid)
        assert per_cat[0] == pytest.approx(51 / 101, abs=1e-6)
        assert per_cat[1] == pytest.approx(1.0, abs=1e-6)

    def test_false_positive_ranking_matters(self):
        gt = self._gt()
        results = [
            {"image_id": 1, "category_id": 0, "bbox": [10, 10, 50, 50], "score": 0.9},
            {"image_id": 2, "category_id": 0, "bbox": [30, 30, 40, 40], "score": 0.8},
            # high-scoring FP above the TPs hurts more
            {"image_id": 1, "category_id": 0, "bbox": [300, 300, 20, 20], "score": 0.95},
        ]
        mAP_fp_high, _ = average_precision_at_iou(gt, results)
        results[2]["score"] = 0.1
        mAP_fp_low, _ = average_precision_at_iou(gt, results)
        assert mAP_fp_low > mAP_fp_high

    def test_duplicate_detection_is_fp(self):
        gt = self._gt()
        results = [
            {"image_id": 1, "category_id": 0, "bbox": [10, 10, 50, 50], "score": 0.9},
            {"image_id": 1, "category_id": 0, "bbox": [11, 11, 50, 50], "score": 0.85},
            {"image_id": 2, "category_id": 0, "bbox": [30, 30, 40, 40], "score": 0.8},
        ]
        _, per_cat = average_precision_at_iou(gt, results)
        assert per_cat[0] < 1.0  # duplicate counted as FP


class TestEndToEndEval:
    def test_synthetic_perfect_detector_gets_high_map(self, coco_dir, tmp_path):
        """Feed GT back as detections through the full file pipeline."""
        gt_path = str(tmp_path / "gt.json")
        res_path = str(tmp_path / "res.json")
        generate_annotations_file(str(coco_dir / "val.txt"), ["a", "b", "c"], gt_path)
        gt = json.load(open(gt_path))
        results = [
            {"image_id": a["image_id"], "category_id": a["category_id"],
             "bbox": a["bbox"], "score": 0.99}
            for a in gt["annotations"]
        ]
        json.dump(results, open(res_path, "w"))
        assert evaluate_map(gt_path, res_path) == pytest.approx(1.0, abs=1e-6)

    @pytest.mark.slow
    def test_detector_plumbing(self, coco_dir, tmp_path):
        """Random-weight detector through evaluate_detector: runs, returns
        a float, writes valid json."""
        import jax

        from yolo_v3_tpu.detector import Detector
        from yolo_v3_tpu.eval.pipeline import evaluate_detector
        from yolo_v3_tpu.models import darknet as D
        from yolo_v3_tpu.utils.config import YoloConfig

        cfg = YoloConfig(num_classes=3, img_dim=64, pre_nms_topk=64,
                         max_detections=16)
        params, state = D.init_yolonet(jax.random.PRNGKey(0), 3, blocks=(1, 1, 1, 1, 1))
        det = Detector(params, state, cfg, precision="fp32")
        mAP = evaluate_detector(det, str(coco_dir / "val.txt"), ["a", "b", "c"],
                                str(tmp_path), batch_size=3, dim=64,
                                is_letterbox=True)
        assert 0.0 <= mAP <= 1.0
        assert json.load(open(str(tmp_path / "results.json"))) is not None
