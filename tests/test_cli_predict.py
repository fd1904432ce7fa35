"""CLI + predict/compare harness tests (CPU mesh)."""

import json
import os

import numpy as np
import jax
import pytest

from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.models import weights as W


@pytest.fixture(scope="module")
def tiny_weights(tmp_path_factory):
    root = tmp_path_factory.mktemp("w")
    params, state = D.init_yolonet(jax.random.PRNGKey(0), num_classes=3, blocks=(1, 1, 1, 1, 1))
    wpath = str(root / "model.weights")
    W.save_darknet_weights(params, state, wpath, seen=5)
    npath = str(root / "model.npz")
    W.save_pytree({"params": params, "state": state}, npath)
    return wpath, npath


@pytest.fixture(scope="module")
def names_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("n") / "names.txt"
    p.write_text("aaa\nbbb\nccc\n")
    return str(p)


@pytest.fixture(scope="module")
def image_file(tmp_path_factory):
    import cv2

    p = tmp_path_factory.mktemp("i") / "img_0001.jpg"
    rng = np.random.default_rng(0)
    cv2.imwrite(str(p), rng.integers(0, 255, (96, 128, 3), dtype=np.uint8))
    return str(p)


class TestCLI:
    def test_weights_inspect(self, tiny_weights, capsys):
        from yolo_v3_tpu.cli import main

        wpath, _ = tiny_weights
        main(["weights", "inspect", wpath])
        out = json.loads(capsys.readouterr().out)
        assert out["seen"] == 5 and out["n_floats"] > 1e6

    def test_weights_convert(self, tiny_weights, tmp_path, capsys):
        from yolo_v3_tpu.cli import main

        wpath, _ = tiny_weights
        out = str(tmp_path / "conv.npz")
        main(["weights", "convert", wpath, "--out", out, "--num-classes", "3",
              "--blocks", "1,1,1,1,1"])
        tree, meta = W.load_pytree(out)
        assert meta["seen"] == 5
        assert "params" in tree and "state" in tree

    def test_detect_command(self, tiny_weights, names_file, image_file,
                            tmp_path, capsys):
        from yolo_v3_tpu.cli import main

        _, npath = tiny_weights
        out_img = str(tmp_path / "out.png")
        main([
            "detect", "--image", image_file, "--weights", npath,
            "--names", names_file, "--dim", "96", "--precision", "fp32",
            "--conf-thr", "0.2", "--out", out_img,
        ])
        assert os.path.getsize(out_img) > 0

    def test_detect_command_int8(self, tiny_weights, names_file, image_file,
                                 tmp_path):
        """The int8 serving path is reachable from the CLI."""
        from yolo_v3_tpu.cli import main

        _, npath = tiny_weights
        out_img = str(tmp_path / "out_i8.png")
        main([
            "detect", "--image", image_file, "--weights", npath,
            "--names", names_file, "--dim", "96", "--precision", "int8",
            "--conf-thr", "0.2", "--out", out_img,
        ])
        assert os.path.getsize(out_img) > 0

    def test_parser_covers_reference_train_knobs(self):
        """All reference notebook hyper-parameters are expressible."""
        from yolo_v3_tpu.cli import build_parser

        p = build_parser()
        args = p.parse_args([
            "train", "--train-list", "x.txt", "--names", "n.txt",
            "--batch-size", "64", "--subdivisions", "4", "--lr", "1e-3",
            "--backbone-lr", "1e-4", "--weight-decay", "5e-4",
            "--momentum", "0.9", "--multi-scale", "--freeze-backbone",
            "--backbone-weights", "darknet53.conv.74", "--resume",
            "--data-parallel", "--jitter", "0.3", "--hue", "0.1",
        ])
        assert args.batch_size == 64 and args.multi_scale and args.resume


class TestPredictHarness:
    def test_predict_and_compare(self, tmp_path):
        from yolo_v3_tpu.detector import Detector
        from yolo_v3_tpu.predict import (
            predict,
            predict_multiple,
            show_detections_comparisons,
        )
        from yolo_v3_tpu.utils.config import YoloConfig

        rng = np.random.default_rng(0)
        cfg = YoloConfig(num_classes=3, img_dim=64, pre_nms_topk=64,
                         max_detections=16)
        p1, s1 = D.init_yolonet(jax.random.PRNGKey(0), 3, blocks=(1, 1, 1, 1, 1))
        p2, s2 = D.init_yolonet(jax.random.PRNGKey(1), 3, blocks=(1, 1, 1, 1, 1))
        det1 = Detector(p1, s1, cfg, precision="fp32")
        det2 = Detector(p2, s2, cfg, precision="fp32")

        samples = [
            {"img": rng.integers(0, 255, (80, 100, 3), dtype=np.uint8),
             "org_img": rng.integers(0, 255, (80, 100, 3), dtype=np.uint8),
             "label": np.array([[1, 0.5, 0.5, 0.4, 0.4]], np.float32)}
            for _ in range(2)
        ]
        imgs, preds = predict(samples, det1, conf_thr=0.2)
        assert len(imgs) == len(preds) == 2

        imgs, per_model, labels = predict_multiple(samples, [det1, det2],
                                                   conf_thr=0.2)
        assert len(per_model) == 2 and len(labels) == 2
        # GT label mapped to absolute xywh
        assert labels[0][0][3] == pytest.approx(40.0)  # 0.4 * 100

        out = str(tmp_path / "cmp.png")
        show_detections_comparisons([det1, det2], samples, ["a", "b", "c"],
                                    conf_thr=0.2, save_path=out)
        assert os.path.getsize(out) > 0


class TestCLITrainEval:
    @pytest.fixture(scope="class")
    def coco_dir(self, tmp_path_factory):
        import cv2

        root = tmp_path_factory.mktemp("clicoco")
        (root / "images").mkdir()
        (root / "labels").mkdir()
        rng = np.random.default_rng(9)
        paths = []
        for i in range(4):
            img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
            p = root / "images" / f"img_{i:04d}.jpg"
            cv2.imwrite(str(p), img)
            np.savetxt(str(root / "labels" / f"img_{i:04d}.txt"),
                       np.array([[1, 0.5, 0.5, 0.4, 0.4]], np.float32),
                       fmt="%.6f")
            paths.append(str(p))
        (root / "list.txt").write_text("\n".join(paths) + "\n")
        return root

    def test_cli_train_then_eval(self, coco_dir, names_file, tmp_path):
        from yolo_v3_tpu.cli import main
        from yolo_v3_tpu.train.checkpoint import get_latest_checkpoint

        wdir = str(tmp_path / "weights")
        main([
            "train", "--train-list", str(coco_dir / "list.txt"),
            "--names", names_file, "--model-id", "clitest",
            "--weight-dir", wdir, "--dim", "64", "--batch-size", "2",
            "--subdivisions", "1", "--max-net-batches", "2",
        ])
        path, it = get_latest_checkpoint("clitest", wdir)
        assert path is not None and it >= 1

        import json

        workdir = str(tmp_path / "evalout")
        main([
            "eval", "--val-list", str(coco_dir / "list.txt"),
            "--weights", "random", "--names", names_file, "--dim", "64",
            "--batch-size", "2", "--letterbox", "--precision", "fp32",
            "--workdir", workdir,
        ])
        res = json.load(open(workdir + "/results.json"))
        assert isinstance(res, list)

    def test_cli_eval_int8(self, coco_dir, names_file, tmp_path):
        """int8 eval from the CLI: uint8 feed through the eval pipeline."""
        import json

        from yolo_v3_tpu.cli import main

        workdir = str(tmp_path / "evalout_i8")
        main([
            "eval", "--val-list", str(coco_dir / "list.txt"),
            "--weights", "random", "--names", names_file, "--dim", "64",
            "--batch-size", "2", "--letterbox", "--precision", "int8",
            "--workdir", workdir,
        ])
        res = json.load(open(workdir + "/results.json"))
        assert isinstance(res, list)

    def test_detector_from_training_checkpoint(self, coco_dir, names_file,
                                               tmp_path):
        """Composite training checkpoints load directly into a Detector."""
        from yolo_v3_tpu.detector import Detector
        from yolo_v3_tpu.train.checkpoint import get_latest_checkpoint
        from yolo_v3_tpu.utils.config import YoloConfig

        wdir = str(tmp_path / "w2")
        from yolo_v3_tpu.cli import main

        main([
            "train", "--train-list", str(coco_dir / "list.txt"),
            "--names", names_file, "--model-id", "ck",
            "--weight-dir", wdir, "--dim", "64", "--batch-size", "2",
            "--subdivisions", "1", "--max-net-batches", "1",
        ])
        path, _ = get_latest_checkpoint("ck", wdir)
        det = Detector.from_checkpoint(
            path, YoloConfig(num_classes=3, img_dim=64, pre_nms_topk=64,
                             max_detections=16), precision="fp32",
        )
        img = np.random.default_rng(0).integers(0, 255, (80, 100, 3),
                                                dtype=np.uint8)
        out = det.detect([img], conf_thr=0.3)
        assert out[0].shape[1] == 7


class TestCLITrainNoAug:
    def test_cli_train_no_aug_cache_metrics(self, coco_dir, names_file,
                                            tmp_path):
        """--no-aug --cache --metrics-jsonl: letterbox-only cached training
        writes one raw-stats JSON line per net-batch."""
        import json

        from yolo_v3_tpu.cli import main
        from yolo_v3_tpu.train.checkpoint import get_latest_checkpoint

        wdir = str(tmp_path / "weights")
        mpath = str(tmp_path / "metrics.jsonl")
        main([
            "train", "--train-list", coco_dir,
            "--names", names_file, "--model-id", "noaug",
            "--weight-dir", wdir, "--dim", "64", "--batch-size", "2",
            "--subdivisions", "1", "--max-net-batches", "3",
            "--no-aug", "--cache", "--metrics-jsonl", mpath,
            "--burn-in", "2",
        ])
        path, it = get_latest_checkpoint("noaug", wdir)
        assert path is not None and it >= 1
        rows = [json.loads(ln) for ln in open(mpath)]
        assert [r["net_batch"] for r in rows] == [1, 2, 3]
        assert all("loss" in r and "recall" in r for r in rows)

    def test_cli_train_cache_requires_no_aug(self, coco_dir, names_file,
                                             tmp_path):
        import pytest

        from yolo_v3_tpu.cli import main

        with pytest.raises(SystemExit):
            main([
                "train", "--train-list", coco_dir,
                "--names", names_file, "--weight-dir",
                str(tmp_path / "w"), "--dim", "64", "--batch-size", "2",
                "--subdivisions", "1", "--max-net-batches", "1", "--cache",
            ])


class TestCLIFullConfigTrain:
    def test_cli_train_multiscale_aug_u8(self, tmp_path):
        """The flagship full-COCO configuration shape from the CLI:
        augmentation ON + --multi-scale + --feed-u8 (+ native threads when
        the extension is built) — the runs/fullcfg_r4 on-chip demo's
        composition, locked at the CLI level on the CPU mesh."""
        import cv2

        from yolo_v3_tpu.cli import main
        from yolo_v3_tpu.train.checkpoint import get_latest_checkpoint

        root = tmp_path / "ds"
        (root / "images").mkdir(parents=True)
        (root / "labels").mkdir()
        rng = np.random.default_rng(3)
        paths = []
        for i in range(4):
            img = rng.integers(0, 255, (80, 112, 3), dtype=np.uint8)
            p = root / "images" / f"img_{i:04d}.jpg"
            cv2.imwrite(str(p), img)
            np.savetxt(str(root / "labels" / f"img_{i:04d}.txt"),
                       np.array([[1, 0.5, 0.5, 0.4, 0.4]], np.float32),
                       fmt="%.6f")
            paths.append(str(p))
        (root / "list.txt").write_text("\n".join(paths) + "\n")
        names = str(tmp_path / "n.names")
        with open(names, "w") as f:
            f.write("a\nb\nc\n")

        wdir = str(tmp_path / "weights")
        main([
            "train", "--train-list", str(root / "list.txt"),
            "--names", names, "--model-id", "fullcfg",
            "--weight-dir", wdir, "--dim", "64", "--batch-size", "2",
            "--subdivisions", "1", "--max-net-batches", "3",
            "--multi-scale", "--dim-range", "64,96",
            "--feed-u8", "--native-threads", "2",
        ])
        path, it = get_latest_checkpoint("fullcfg", wdir)
        assert path is not None and it >= 2
