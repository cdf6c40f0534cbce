"""Tests for utility layers: device prefetch, profiling, metrics."""

import time

import numpy as np
import pytest

from pyannote_video_tpu.io.batch import prefetch_to_device
from pyannote_video_tpu.utils.metrics import boundary_f1, cluster_purity
from pyannote_video_tpu.utils.profiling import PipelineStats, StageStats


class TestPrefetch:
    def test_order_and_completeness(self):
        items = [(np.full((4,), i), i) for i in range(7)]
        out = list(prefetch_to_device(iter(items), size=3))
        assert len(out) == 7
        for i, (arr, tag) in enumerate(out):
            assert tag == i
            np.testing.assert_array_equal(np.asarray(arr), np.full((4,), i))

    def test_empty_iterator(self):
        assert list(prefetch_to_device(iter([]), size=2)) == []


class TestProfiling:
    def test_stage_stats(self):
        stats = PipelineStats()
        with stats.stage("detect") as st:
            st.add(n=10, detections=3)
            time.sleep(0.01)
        d = stats.stages["detect"].to_dict()
        assert d["items"] == 10
        assert d["detections"] == 3.0
        assert d["wall_s"] > 0
        assert "detect" in stats.report()


class TestMetrics:
    def test_boundary_f1_tolerance(self):
        m = boundary_f1([1.0, 2.04, 5.0], [1.0, 2.0], tolerance=0.05)
        assert m["recall"] == 1.0
        assert m["precision"] == pytest.approx(2 / 3)

    def test_boundary_f1_empty(self):
        assert boundary_f1([], [], tolerance=0.1)["f1"] == 1.0
        assert boundary_f1([1.0], [], tolerance=0.1)["precision"] == 0.0

    def test_cluster_purity(self):
        assignment = {0: "a", 1: "a", 2: "b"}
        truth = {0: 7, 1: 7, 2: 8}
        assert cluster_purity(assignment, truth) == 1.0
        truth_bad = {0: 7, 1: 8, 2: 9}
        assert cluster_purity(assignment, truth_bad) == pytest.approx(2 / 3)
