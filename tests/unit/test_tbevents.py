"""The in-repo tfevents writer must produce files a stock TensorBoard
install can read (reference analog: Lightning TensorBoardLogger scalars,
``chemprop/cli/train.py:1843-1851``)."""

import pytest

from chemprop_tpu.utils.tbevents import ScalarEventWriter, _crc32c


class TestCRC32C:
    def test_known_vectors(self):
        # published CRC-32C check values
        assert _crc32c(b"123456789") == 0xE3069283
        assert _crc32c(b"") == 0x0


class TestWriterRoundTrip:
    def test_tensorboard_reads_back(self, tmp_path):
        ea_mod = pytest.importorskip(
            "tensorboard.backend.event_processing.event_accumulator"
        )
        with ScalarEventWriter(tmp_path) as w:
            for step in range(5):
                w.add_scalar("train_loss", 1.0 / (step + 1), step)
            w.add_scalars({"epoch": 4, "val_loss": 0.25, "note": "str"}, 4)

        acc = ea_mod.EventAccumulator(str(tmp_path))
        acc.Reload()
        assert "train_loss" in acc.Tags()["scalars"]
        events = acc.Scalars("train_loss")
        assert [e.step for e in events] == [0, 1, 2, 3, 4]
        assert events[0].value == pytest.approx(1.0)
        assert events[4].value == pytest.approx(0.2)
        # dict helper skipped "epoch" and the non-numeric entry
        assert acc.Scalars("val_loss")[0].value == pytest.approx(0.25)
        assert "note" not in acc.Tags()["scalars"]
