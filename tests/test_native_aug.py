"""Native C++ training-augmentation parity vs the Python pipeline.

The native path (data/native_aug.py + native/yolodata.cc) must reproduce
transforms.py's training chain bit-for-bit on labels/reverters/randomness
and pixel-for-pixel on images up to cv2 5.x's HSV2RGB 1-ulp float
boundary cases (<0.1% of pixels, off by exactly one u8 level).
"""

import os.path as osp

import numpy as np
import pytest

from yolo_v3_tpu.data import transforms as T
from yolo_v3_tpu.data.loader import DataHelper
from yolo_v3_tpu.data.native_loader import native_available
from yolo_v3_tpu.data.sampler import CyclicSampler

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain/libjpeg unavailable"
)


def _rand_img(rng, h, w):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


LABEL = np.array(
    [[1, 0.5, 0.5, 0.4, 0.3], [7, 0.2, 0.3, 0.15, 0.2],
     [3, 0.9, 0.85, 0.3, 0.4], [0, 0.05, 0.95, 0.08, 0.09]],
    np.float32,
)


class TestAugmentBufferParity:
    def _both(self, img, label, seed, dim, trans=None, spec=None):
        from yolo_v3_tpu.data import native_aug as NA

        trans = trans or T.training_transform(dim)
        spec = spec or NA.compile_transform(trans)
        assert spec is not None
        s = {"img": img.copy(),
             "label": None if label is None else label.copy(),
             "rng": np.random.default_rng(seed)}
        py = trans(s)
        h, w = img.shape[:2]
        p = NA.draw_aug_params(np.random.default_rng(seed), w, h, spec)
        nimg = NA.augment_buffer(img, p, dim, dtype="uint8")
        nimg = nimg.astype(np.float32) / 255.0
        nlab, nrev = NA.transform_labels(
            None if label is None else label.copy(), w, h, p, dim, spec)
        return py, nimg, nlab, nrev

    def test_training_chain_parity_sweep(self):
        """30 seeds: labels/reverter bit-exact; pixels within one u8 level
        on <0.1% of pixels (cv2 HSV2RGB float-order boundaries)."""
        img = _rand_img(np.random.default_rng(7), 240, 320)
        for seed in range(30):
            py, nimg, nlab, nrev = self._both(img, LABEL, seed, (416, 416))
            np.testing.assert_array_equal(nlab, py["label"])
            np.testing.assert_array_equal(nrev, py["lb_reverter"])
            diff = np.abs(nimg - py["img"])
            assert diff.max() <= 1.0 / 255 + 1e-6
            assert (diff > 0.5 / 255).mean() < 1e-3

    def test_no_labels(self):
        img = _rand_img(np.random.default_rng(3), 97, 215)
        py, nimg, nlab, nrev = self._both(img, None, 11, (320, 320))
        np.testing.assert_array_equal(nlab, py["label"])  # all-zero fill
        np.testing.assert_array_equal(nrev, py["lb_reverter"])
        assert np.abs(nimg - py["img"]).max() <= 1.0 / 255 + 1e-6

    def test_geometry_exact_without_hsv(self):
        """Crop/pad + flip + identity-size letterbox is bit-exact when the
        HSV stage is disabled (isolates the one tolerated stage)."""
        from yolo_v3_tpu.data import native_aug as NA

        rng = np.random.default_rng(5)
        img = _rand_img(rng, 64, 80)
        p = NA.AugParams(left=7, right=-5, top=-3, bottom=6, flip=True)
        cw, ch = 80 - 7 + 5, 64 + 3 - 6
        out = NA.augment_buffer(img, p, (cw, ch), do_hsv=False, dtype="uint8")
        canvas = np.full((ch, cw, 3), 128, np.uint8)
        canvas[3:3 + (64 - 6), 0:0 + (80 - 7)] = img[0:64 - 6, 7:80]
        canvas = canvas[:, ::-1]
        np.testing.assert_array_equal(out, canvas)

    def test_degenerate_crop_draw_skips_label_clip(self):
        """jitter large enough that some draws collapse (new dim < 1): the
        Python path skips the whole crop INCLUDING label clipping; the
        native param draw must reproduce that."""
        trans = T.Compose([
            T.HSVAug(0.1, 1.5, 1.5), T.RandomJitterCrop(jitter=0.6),
            T.RandomHorizontalFlip(0.5), T.Letterbox((64, 64)), T.ToArray(90),
        ])
        from yolo_v3_tpu.data import native_aug as NA

        spec = NA.compile_transform(trans)
        img = _rand_img(np.random.default_rng(1), 10, 10)
        hit = 0
        for seed in range(400):
            p = NA.draw_aug_params(np.random.default_rng(seed), 10, 10, spec)
            if not p.crop_applied:
                hit += 1
                py, nimg, nlab, nrev = self._both(
                    img, LABEL, seed, (64, 64), trans=trans, spec=spec)
                np.testing.assert_array_equal(nlab, py["label"])
                np.testing.assert_array_equal(nrev, py["lb_reverter"])
                # 6.4x cubic upscale amplifies the HSV 1-ulp cases ~2x
                assert np.abs(nimg - py["img"]).max() <= 2.0 / 255 + 1e-6
        assert hit > 0, "sweep never produced a degenerate draw"

    def test_compile_transform_rejects_non_native_chains(self):
        from yolo_v3_tpu.data import native_aug as NA

        assert NA.compile_transform(T.eval_transform((416, 416))) is None
        assert NA.compile_transform(
            T.training_transform((416, 416), extra_aug=True)) is None
        custom_pad = T.training_transform((416, 416))
        custom_pad.transforms[1].pad_value = 0
        assert NA.compile_transform(custom_pad) is None
        assert NA.compile_transform(T.training_transform((416, 416))) is not None


@pytest.fixture(scope="module")
def jpeg_dataset(tmp_path_factory):
    """A tiny COCO-convention dataset (images/ + labels/ + list txt)."""
    import cv2

    root = tmp_path_factory.mktemp("ds")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(120, 160), (97, 215), (200, 150), (64, 64)]):
        base = rng.integers(40, 220, (6, 8, 3), dtype=np.uint8)
        img = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
        p = str(root / "images" / f"im{i}.jpg")
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 98])
        rows = LABEL[: i + 1]
        np.savetxt(str(root / "labels" / f"im{i}.txt"), rows, fmt="%.6f")
        paths.append(p)
    list_txt = str(root / "list.txt")
    with open(list_txt, "w") as f:
        f.write("\n".join(paths) + "\n")
    return list_txt


class TestDataHelperNativePath:
    def _helpers(self, jpeg_dataset, native_threads, **kw):
        from yolo_v3_tpu.data.datasets import ListDataset

        ds = ListDataset(jpeg_dataset,
                         trans_fn=lambda dim: T.training_transform(dim, **kw))
        sampler = CyclicSampler(len(ds), batch_size=4, seed=3,
                                dim=(416, 416))
        return DataHelper(ds, sampler, max_batches=2, prefetch=0,
                          native_threads=native_threads)

    def test_native_batches_match_python_batches(self, jpeg_dataset):
        py = self._helpers(jpeg_dataset, 0)
        nat = self._helpers(jpeg_dataset, 2)
        try:
            for bp, bn in zip(py, nat):
                assert bn["img"].shape == bp["img"].shape
                # seeds/dims identical -> labels bit-exact; pixels differ
                # only by decoder rounding + HSV 1-ulp cases
                np.testing.assert_array_equal(bn["label"], bp["label"])
                np.testing.assert_array_equal(
                    bn["lb_reverter"], bp["lb_reverter"])
                assert bn["img_path"] == bp["img_path"]
                diff = np.abs(bn["img"] - bp["img"])
                assert diff.mean() < 0.01 and diff.max() < 0.13
            assert nat._native is not None, "native path never engaged"
        finally:
            py.close()
            nat.close()

    def test_non_jpeg_falls_back_per_sample(self, jpeg_dataset, tmp_path):
        import cv2

        from yolo_v3_tpu.data.datasets import ListDataset

        # one PNG (native decoder is JPEG-only) among JPEGs
        png = str(tmp_path / "images" / "im9.png")
        (tmp_path / "images").mkdir()
        (tmp_path / "labels").mkdir()
        img = np.random.default_rng(2).integers(
            0, 256, (50, 70, 3), dtype=np.uint8)
        cv2.imwrite(png, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        np.savetxt(str(tmp_path / "labels" / "im9.txt"), LABEL, fmt="%.6f")
        with open(jpeg_dataset) as f:
            paths = [ln.strip() for ln in f if ln.strip()]
        mixed = str(tmp_path / "list.txt")
        with open(mixed, "w") as f:
            f.write("\n".join(paths[:3] + [png]) + "\n")

        ds = ListDataset(mixed, trans_fn=T.training_transform)
        sampler = CyclicSampler(len(ds), batch_size=4, seed=5,
                                dim=(128, 128))
        helper = DataHelper(ds, sampler, max_batches=1, prefetch=0,
                            native_threads=2)
        try:
            batch = next(iter(helper))
        finally:
            helper.close()
        assert batch["img"].shape == (4, 128, 128, 3)
        assert batch["label"].shape == (4, 90, 5)
        # the PNG sample went through the Python path: reproduce directly
        i = batch["img_path"].index(png)
        base, dim, seed = sampler.schedule(i)
        want = ds.get(base, dim, seed)
        np.testing.assert_array_equal(batch["label"][i], want["label"])
        np.testing.assert_allclose(batch["img"][i], want["img"], atol=1e-6)

    def test_incompatible_transform_disables_native(self, jpeg_dataset):
        helper = self._helpers(jpeg_dataset, 2, extra_aug=True)
        try:
            batch = next(iter(helper))
        finally:
            helper.close()
        assert helper._native_disabled and helper._native is None
        assert batch["img"].shape == (4, 416, 416, 3)


class TestNativeU8AugFeed:
    def test_native_chain_emits_u8_matching_python(self, jpeg_dataset):
        """DataHelper's native path under training_transform(feed_u8=True)
        yields uint8 batches matching the Python f32 path under the
        native-JPEG-parity contract (labels bit-exact; pixels within the
        libjpeg-vs-cv2 decoder rounding envelope, see
        TestDataHelperNativePath)."""
        from yolo_v3_tpu.data.datasets import ListDataset

        def run(feed_u8, native):
            ds = ListDataset(
                jpeg_dataset,
                trans_fn=lambda d: T.training_transform(d, feed_u8=feed_u8))
            dh = DataHelper(ds, CyclicSampler(len(ds), 2, seed=3,
                                              dim=(96, 96)),
                            max_net_batches=2, net_subdivisions=1,
                            prefetch=0, native_threads=2 if native else 0)
            try:
                return [
                    {"img": b["img"].copy(), "label": b["label"].copy()}
                    for b in dh
                ]
            finally:
                dh.close()

        f32 = run(False, native=False)
        u8n = run(True, native=True)
        assert len(f32) == len(u8n) == 2
        for a, b in zip(f32, u8n):
            assert b["img"].dtype == np.uint8
            diff = np.abs(b["img"].astype(np.float32) / 255.0 - a["img"])
            # JPEG-decoder rounding tolerance, as in
            # TestDataHelperNativePath.test_native_batches_match_python;
            # u8-vs-f32 exactness is proven by the next test
            assert diff.mean() < 0.01 and diff.max() < 0.13
            np.testing.assert_array_equal(b["label"], a["label"])

    def test_native_u8_equals_native_f32(self, jpeg_dataset):
        """The u8 output mode is exactly the native f32 mode minus the
        /255: same chain, same pixels, bit-identical after normalize."""
        from yolo_v3_tpu.data.datasets import ListDataset

        def run(feed_u8):
            ds = ListDataset(
                jpeg_dataset,
                trans_fn=lambda d: T.training_transform(d, feed_u8=feed_u8))
            dh = DataHelper(ds, CyclicSampler(len(ds), 2, seed=3,
                                              dim=(96, 96)),
                            max_net_batches=2, net_subdivisions=1,
                            prefetch=0, native_threads=2)
            try:
                return [{"img": b["img"].copy(), "label": b["label"].copy()}
                        for b in dh]
            finally:
                dh.close()

        f32 = run(False)
        u8 = run(True)
        for a, b in zip(f32, u8):
            assert b["img"].dtype == np.uint8
            np.testing.assert_array_equal(
                b["img"].astype(np.float32) / 255.0, a["img"])
            np.testing.assert_array_equal(b["label"], a["label"])
