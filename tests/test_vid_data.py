"""ImageNet VID dataset (synthetic ILSVRC tree) + native decode tests."""

import os

import numpy as np
import pytest

from tdrn_tpu.data.vid import VIDDetection, collate_clips, parse_vid_xml


@pytest.fixture(scope="module")
def vid_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("ilsvrc")
    rng = np.random.RandomState(0)
    for snip in ("a/snip0", "a/snip1"):
        ddir = root / "Data" / "VID" / "train" / snip
        adir = root / "Annotations" / "VID" / "train" / snip
        ddir.mkdir(parents=True)
        adir.mkdir(parents=True)
        n = 10 if snip.endswith("0") else 3  # one short snippet
        for t in range(n):
            img = rng.randint(0, 255, (120, 160, 3), np.uint8)
            cv2.imwrite(str(ddir / f"{t:06d}.JPEG"), img)
            xml = f"""<annotation><object><trackid>0</trackid>
            <name>n02958343</name>
            <bndbox><xmax>{60 + t}</xmax><xmin>{20 + t}</xmin><ymax>90</ymax><ymin>30</ymin></bndbox>
            </object></annotation>"""
            (adir / f"{t:06d}.xml").write_text(xml)
    return str(root)


class TestParse:
    def test_parse_vid_xml(self, vid_root):
        p = os.path.join(
            vid_root, "Annotations", "VID", "train", "a/snip0", "000000.xml"
        )
        boxes, labels, tracks = parse_vid_xml(p)
        assert boxes.shape == (1, 4)
        np.testing.assert_allclose(boxes[0], [20, 30, 60, 90])
        assert labels[0] == 6  # n02958343 = car
        assert tracks[0] == 0


class TestFrameMode:
    def test_len_and_sample(self, vid_root):
        ds = VIDDetection(vid_root, "train", mode="frame", max_gt=5)
        assert len(ds) == 13
        img, boxes, labels, valid = ds[0]
        assert img.shape[2] == 3
        assert boxes.shape == (5, 4) and valid.sum() == 1
        assert 0 <= boxes[valid].min() and boxes[valid].max() <= 1


class TestClipMode:
    def test_clip_shapes(self, vid_root):
        ds = VIDDetection(vid_root, "train", mode="clip", seq_len=4, max_gt=5)
        assert len(ds) == 2
        imgs, boxes, labels, valid = ds[0]
        assert imgs.shape[0] == 4
        assert boxes.shape == (4, 5, 4)

    def test_short_snippet_fill(self, vid_root):
        ds = VIDDetection(vid_root, "train", mode="clip", seq_len=8, max_gt=5)
        imgs, *_ = ds[1]  # snip1 has only 3 frames
        assert imgs.shape[0] == 8
        np.testing.assert_array_equal(imgs[3], imgs[7])  # filled with last frame

    def test_collate_clips(self, vid_root):
        ds = VIDDetection(vid_root, "train", mode="clip", seq_len=3, max_gt=5)
        batch = collate_clips([ds[0], ds[1]])
        imgs, boxes, labels, valid = batch
        assert imgs.shape[:2] == (3, 2)  # (T, B, ...)
        assert boxes.shape[:2] == (3, 2)


class TestNativeDecode:
    def test_native_matches_cv2(self, vid_root, tmp_path):
        from tdrn_tpu.data import native

        if not native.available():
            pytest.skip("native lib not built")
        import cv2

        p = os.path.join(vid_root, "Data", "VID", "train", "a/snip0", "000000.JPEG")
        ref = cv2.resize(
            cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB).astype(np.float32), (64, 64)
        )
        got = native.decode_resize(p, 64)
        np.testing.assert_allclose(got, ref, atol=1.0)  # identical resize path
        assert native.jpeg_dims(p) == (120, 160)

    def test_batch_decode(self, vid_root):
        from tdrn_tpu.data import native

        if not native.available():
            pytest.skip("native lib not built")
        base = os.path.join(vid_root, "Data", "VID", "train", "a/snip0")
        paths = [os.path.join(base, f"{t:06d}.JPEG") for t in range(4)]
        out = native.decode_resize_batch(paths, 32, mean=(123, 117, 104), num_threads=2)
        assert out.shape == (4, 32, 32, 3)
        assert np.isfinite(out).all()
