"""TensorBoard event-writer tests: files must be readable by the stock
TensorBoard/TF record reader with correct tags, steps, values and images."""

import glob
import os

import numpy as np
import pytest

from selectivenet_for_semantic_segmentation_binary_tpu.utils.tb_writer import (
    SummaryWriter,
    crc32c,
    masked_crc32c,
)


class TestCRC32C:
    def test_known_vectors(self):
        # RFC 3720 / kernel test vectors for CRC32C (Castagnoli)
        assert crc32c(b"") == 0x00000000
        assert crc32c(b"a") == 0xC1D04330
        assert crc32c(b"123456789") == 0xE3069283
        assert crc32c(b"\x00" * 32) == 0x8A9136AA

    def test_masking_is_invertible_shape(self):
        m = masked_crc32c(b"123456789")
        assert 0 <= m <= 0xFFFFFFFF


def _read_events(log_dir):
    """Parse events back with TF's reader (the stock TensorBoard loader)."""
    tf = pytest.importorskip("tensorflow")
    files = glob.glob(os.path.join(log_dir, "events.out.tfevents.*"))
    assert len(files) == 1
    events = []
    for rec in tf.data.TFRecordDataset(files[0]):
        ev = tf.compat.v1.Event()
        ev.ParseFromString(rec.numpy())
        events.append(ev)
    return events


class TestSummaryWriter:
    def test_scalars_roundtrip(self, tmp_path):
        d = str(tmp_path / "train")
        with SummaryWriter(d) as w:
            w.add_scalar("loss", 0.5, 1)
            w.add_scalar("loss", 0.25, 2)
            w.add_scalar("accuracy", 0.9, 2)
        events = _read_events(d)
        assert events[0].file_version == "brain.Event:2"
        scalars = [
            (e.step, v.tag, v.simple_value)
            for e in events[1:]
            for v in e.summary.value
        ]
        assert (1, "loss", 0.5) in [(s, t, round(v, 6)) for s, t, v in scalars]
        assert (2, "loss", 0.25) in [(s, t, round(v, 6)) for s, t, v in scalars]
        assert (2, "accuracy", pytest.approx(0.9)) in scalars

    def test_images_roundtrip(self, tmp_path):
        d = str(tmp_path / "imgs")
        imgs = np.zeros((2, 8, 8, 3), np.float32)
        imgs[0, :, :, 0] = 1.0
        with SummaryWriter(d) as w:
            w.add_images("input", imgs, 3)
        events = _read_events(d)
        vals = [v for e in events[1:] for v in e.summary.value]
        assert {v.tag for v in vals} == {"input/0", "input/1"}
        im = vals[0].image
        assert im.height == 8 and im.width == 8 and im.colorspace == 3
        from PIL import Image
        import io

        arr = np.asarray(Image.open(io.BytesIO(im.encoded_image_string)))
        assert arr[0, 0, 0] == 255  # red channel of panel 0

    def test_grayscale_image(self, tmp_path):
        d = str(tmp_path / "gray")
        imgs = np.ones((1, 4, 4, 1), np.uint8) * 128
        with SummaryWriter(d) as w:
            w.add_images("label", imgs, 1)
        events = _read_events(d)
        im = events[1].summary.value[0].image
        assert im.colorspace == 1

    def test_reference_log_layout(self, tmp_path):
        """Reference layout: {model_dir}/{fold}-fold/log/{train,valid}."""
        log_dir = tmp_path / "model" / "1-fold" / "log"
        for sub in ("train", "valid"):
            with SummaryWriter(str(log_dir / sub)) as w:
                w.add_scalar("lr", 1e-3, 1)
        assert (log_dir / "train").is_dir() and (log_dir / "valid").is_dir()


class TestTwoChannelPanels:
    def test_gh_input_panels(self, tmp_path):
        """(N, H, W, 2) GH inputs (gray + hematoxylin) must log without
        crashing — PIL has no 2-band mode; the writer renders the channels
        side by side as one grayscale strip."""
        d = str(tmp_path / "gh")
        imgs = np.zeros((1, 4, 6, 2), np.float32)
        imgs[0, :, :, 0] = 1.0  # gray plane all-white, H plane all-black
        with SummaryWriter(d) as w:
            w.add_images("input", imgs, 1)
        events = _read_events(d)
        im = events[1].summary.value[0].image
        assert im.colorspace == 1
        assert im.height == 4 and im.width == 12  # channels side by side
        from PIL import Image
        import io

        arr = np.asarray(Image.open(io.BytesIO(im.encoded_image_string)))
        assert arr[0, 0] == 255 and arr[0, 11] == 0


class TestTBReader:
    """utils/tb_reader.py: the dependency-free scalar reader used by the
    long-horizon analysis drivers (scripts/canonical_200ep.py)."""

    def test_scalar_roundtrip(self, tmp_path):
        from selectivenet_for_semantic_segmentation_binary_tpu.utils.tb_reader import (
            read_scalars,
        )

        w = SummaryWriter(str(tmp_path))
        for step in range(1, 6):
            w.add_scalar("loss", 1.0 / step, step)
            w.add_scalar("accuracy", step / 10.0, step)
        w.close()
        scalars = read_scalars(str(tmp_path))
        assert set(scalars) == {"loss", "accuracy"}
        assert [s for s, _ in scalars["loss"]] == [1, 2, 3, 4, 5]
        np.testing.assert_allclose([v for _, v in scalars["loss"]],
                                   [1.0 / s for s in range(1, 6)], rtol=1e-6)

    def test_skips_image_summaries_and_concatenates_files(self, tmp_path):
        from selectivenet_for_semantic_segmentation_binary_tpu.utils.tb_reader import (
            read_scalars,
        )

        w1 = SummaryWriter(str(tmp_path))
        w1.add_scalar("loss", 0.5, 1)
        w1.add_images("panel", np.zeros((2, 8, 8, 3), np.uint8), 1)
        w1.close()
        import time as _time

        _time.sleep(1.1)  # distinct filename timestamp (writer names by s)
        w2 = SummaryWriter(str(tmp_path))  # restart appends a second file
        w2.add_scalar("loss", 0.25, 2)
        w2.close()
        scalars = read_scalars(str(tmp_path))
        assert [s for s, _ in scalars["loss"]] == [1, 2]
        assert "panel" not in scalars
