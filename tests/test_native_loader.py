"""Native C++ loader tests: build, decode parity vs cv2, error handling."""

import numpy as np
import pytest

from yolo_v3_tpu.data.native_loader import NativePrefetcher, native_available
from yolo_v3_tpu.ops.letterbox import letterbox_host

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain/libjpeg unavailable"
)


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("jpg")
    rng = np.random.default_rng(0)
    paths, imgs = [], []
    for i, (h, w) in enumerate([(120, 160), (97, 215), (416, 416)]):
        # smooth images so JPEG loss stays small
        base = rng.integers(60, 200, (6, 8, 3), dtype=np.uint8)
        img = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
        p = str(root / f"im{i}.jpg")
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 98])
        paths.append(p)
        imgs.append(img)
    return paths, imgs


class TestNativeLoader:
    def test_batch_matches_cv2_letterbox(self, jpegs):
        import cv2

        paths, _ = jpegs
        with NativePrefetcher(n_threads=2) as pf:
            out, orgs, ok = pf.load_letterboxed(paths, (416, 416))
        assert all(ok)
        for i, p in enumerate(paths):
            img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
            assert tuple(orgs[i]) == (img.shape[1], img.shape[0])
            want = letterbox_host(img, (416, 416))
            # independent decoders + float-vs-fixed-point cubic: allow a
            # small tolerance; pad region must be exactly gray
            assert np.abs(out[i] - want).mean() < 0.01
            assert np.all(np.abs(out[i] - want) < 0.12)

    def test_u8_mode_matches_float_mode(self, jpegs):
        """uint8 output (the int8 serving feed) is the float output's pixel
        values rounded to the u8 grid; pad region exactly 128."""
        paths, _ = jpegs
        with NativePrefetcher(n_threads=2, dtype="uint8") as pf:
            out8, orgs8, ok8 = pf.load_letterboxed(paths, (416, 416))
        with NativePrefetcher(n_threads=2) as pf:
            outf, orgsf, okf = pf.load_letterboxed(paths, (416, 416))
        assert all(ok8) and all(okf)
        assert out8.dtype == np.uint8
        np.testing.assert_array_equal(orgs8, orgsf)
        # same cubic math, one extra rounding step
        diff = np.abs(out8.astype(np.float32) - outf * 255.0)
        assert diff.max() <= 0.5 + 1e-3
        # letterbox pad rows are exactly gray-128 (im0 is 120x160 ->
        # rh=312, yp=52)
        assert np.all(out8[0][:52] == 128)

    def test_missing_and_invalid_files(self, jpegs, tmp_path):
        paths, _ = jpegs
        bad = str(tmp_path / "not_a_jpeg.jpg")
        with open(bad, "wb") as f:
            f.write(b"hello world")
        with NativePrefetcher(n_threads=1) as pf:
            out, orgs, ok = pf.load_letterboxed(
                [paths[0], bad, str(tmp_path / "missing.jpg")], (64, 64)
            )
        assert ok == [True, False, False]
        assert np.all(out[1] == 0) and np.all(out[2] == 0)

    def test_many_submissions_ordered_by_tag(self, jpegs):
        paths, _ = jpegs
        many = paths * 7  # 21 jobs across 2 threads
        with NativePrefetcher(n_threads=2) as pf:
            out, orgs, ok = pf.load_letterboxed(many, (96, 96))
        assert all(ok)
        # identical path -> identical output regardless of completion order
        for i in range(3, len(many)):
            np.testing.assert_array_equal(out[i], out[i % 3])
