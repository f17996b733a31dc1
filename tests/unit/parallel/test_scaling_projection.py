"""The multi-host scaling projection's HLO accounting
(experiments/scaling_projection.py; BASELINE.md north star ≥85% at 2+
hosts). The heavy compile path is exercised by bench.py / standalone runs;
these tests pin the byte accounting and the efficiency model."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[3] / "experiments"))

from scaling_projection import collective_bytes_from_hlo, project, shape_bytes


class TestShapeBytes:
    def test_simple(self):
        assert shape_bytes("f32[300,300]{1,0}") == 360000
        assert shape_bytes("bf16[128]{0}") == 256
        assert shape_bytes("f32[]") == 4

    def test_tuple(self):
        s = "(f32[300,300]{1,0}, f32[86,300]{1,0}, f32[300]{0})"
        assert shape_bytes(s) == 360000 + 103200 + 1200


class TestCollectiveParsing:
    def test_tuple_all_reduce(self):
        hlo = """
  %psum.70 = f32[] all-reduce(%x), channel_id=1, replica_groups={{0,1}}
  %all-reduce.9 = (f32[300,300]{1,0}, f32[300]{0}) all-reduce(%a, %b), channel_id=2
  %gte = f32[300,300]{1,0} get-tuple-element(%all-reduce.9), index=0
"""
        out = collective_bytes_from_hlo(hlo)
        assert out == {"all-reduce": 4 + 360000 + 1200}

    def test_async_start_counted_once(self):
        hlo = """
  %ar = f32[100]{0} all-reduce-start(%x), channel_id=1
  %cp = f32[7,384]{1,0} collective-permute-start(%y), channel_id=2
"""
        out = collective_bytes_from_hlo(hlo)
        assert out["all-reduce"] == 400
        assert out["collective-permute"] == 7 * 384 * 4

    def test_non_collective_lines_ignored(self):
        assert collective_bytes_from_hlo("%f = f32[8]{0} add(%a, %b)") == {}


class TestProjection:
    def test_efficiency_bar(self):
        # the measured program: 1.27 MB/step gradient sync
        out = project(4.78, {"all-reduce": 1_273_212}, n_hosts=2)
        assert out["projected_scaling_efficiency"] >= 0.95
        assert out["dp_sync_bytes_per_step"] == 1_273_212

    def test_monotone_in_hosts(self):
        e2 = project(4.78, {"all-reduce": 1_273_212}, n_hosts=2)
        e8 = project(4.78, {"all-reduce": 1_273_212}, n_hosts=8)
        assert e8["projected_scaling_efficiency"] <= e2["projected_scaling_efficiency"]
        # and stays over the bar even at many hosts
        assert e8["projected_scaling_efficiency"] >= 0.85

    def test_degrades_with_bytes(self):
        small = project(4.78, {"all-reduce": 1_000_000}, 2)
        big = project(4.78, {"all-reduce": 500_000_000}, 2)
        assert big["projected_scaling_efficiency"] < small["projected_scaling_efficiency"] < 1.0
