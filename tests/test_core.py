"""Tests for core temporal structures, JSON codec, graph, Hungarian."""

import io
import itertools

import numpy as np
import pytest

from pyannote_video_tpu.core import (
    Annotation,
    Graph,
    Segment,
    Timeline,
    UnionFind,
    dumps,
    hungarian,
    loads,
    string_generator,
)
from pyannote_video_tpu.core import formats
from pyannote_video_tpu.core.assignment import associate_by_overlap


class TestSegment:
    def test_ordering_and_truthiness(self):
        assert Segment(0, 1) < Segment(0, 2) < Segment(1, 2)
        assert Segment(0, 1)
        assert not Segment(1, 1)
        assert not Segment(2, 1)

    def test_intersection(self):
        assert (Segment(0, 2) & Segment(1, 3)) == Segment(1, 2)
        assert not (Segment(0, 1) & Segment(2, 3))

    def test_json_roundtrip(self):
        s = Segment(1.25, 3.5)
        assert loads(dumps(s)) == s
        assert dumps(s) == '{"pyannote": "Segment", "start": 1.25, "end": 3.5}'


class TestTimeline:
    def test_sorted_dedup(self):
        t = Timeline([Segment(2, 3), Segment(0, 1), Segment(2, 3)])
        assert list(t) == [Segment(0, 1), Segment(2, 3)]

    def test_support(self):
        t = Timeline([Segment(0, 2), Segment(1, 3), Segment(5, 6)])
        assert list(t.support()) == [Segment(0, 3), Segment(5, 6)]

    def test_json_roundtrip(self):
        t = Timeline([Segment(0, 1), Segment(2, 3)], uri="video.mp4")
        t2 = loads(dumps(t))
        assert t2 == t and t2.uri == "video.mp4"

    def test_json_schema(self):
        t = Timeline([Segment(0, 1)])
        assert dumps(t) == (
            '{"pyannote": "Timeline", "content": '
            '[{"pyannote": "Segment", "start": 0, "end": 1}]}'
        )


class TestAnnotation:
    def test_default_track_setitem(self):
        a = Annotation()
        a[Segment(0, 1)] = "A"
        assert a[Segment(0, 1)] == "A"
        assert a.labels() == ["A"]

    def test_two_arg_setitem(self):
        a = Annotation(modality="face")
        a[Segment(0, 1), 7] = 7
        assert a[Segment(0, 1), 7] == 7

    def test_smooth_merges_contiguous_same_label(self):
        a = Annotation()
        a[Segment(0, 1)] = "A"
        a[Segment(1, 2)] = "A"
        a[Segment(2, 3)] = "B"
        a[Segment(3, 4)] = "A"
        sm = a.smooth()
        assert list(sm.itertracks(yield_label=True)) == [
            (Segment(0, 2), "_", "A"),
            (Segment(2, 3), "_", "B"),
            (Segment(3, 4), "_", "A"),
        ]

    def test_subset_and_timeline(self):
        a = Annotation()
        a[Segment(0, 1)] = "A"
        a[Segment(1, 2)] = "B"
        assert list(a.subset(["B"]).itersegments()) == [Segment(1, 2)]
        assert list(a.get_timeline()) == [Segment(0, 1), Segment(1, 2)]

    def test_json_roundtrip(self):
        a = Annotation(uri="v", modality="face")
        a[Segment(0, 1), "t0"] = "A"
        a[Segment(1, 2), "t1"] = "B"
        assert loads(dumps(a)) == a


def test_string_generator():
    g = string_generator()
    first = list(itertools.islice(g, 28))
    assert first[:3] == ["A", "B", "C"]
    assert first[25] == "Z"
    assert first[26] == "AA"
    assert first[27] == "AB"


class TestGraph:
    def test_connected_components(self):
        g = Graph()
        g.add_nodes_from(range(6))
        g.add_edge(0, 1)
        g.add_edge(1, 2)
        g.add_edge(4, 5)
        ccs = sorted(map(sorted, g.connected_components()))
        assert ccs == [[0, 1, 2], [3], [4, 5]]

    def test_biconnected_components_cycle_plus_bridge(self):
        # 0-1-2-0 triangle plus bridge 2-3
        g = Graph()
        for a, b in [(0, 1), (1, 2), (2, 0), (2, 3)]:
            g.add_edge(a, b)
        bcs = sorted(map(sorted, g.biconnected_components()))
        assert bcs == [[0, 1, 2], [2, 3]]

    def test_biconnected_matches_networkx(self):
        nx = pytest.importorskip("networkx")
        rng = np.random.default_rng(42)
        for _ in range(20):
            n = 12
            edges = set()
            for _ in range(18):
                a, b = rng.integers(0, n, 2)
                if a != b:
                    edges.add((min(a, b), max(a, b)))
            g = Graph()
            ng = nx.Graph()
            g.add_nodes_from(range(n))
            ng.add_nodes_from(range(n))
            for a, b in edges:
                g.add_edge(int(a), int(b))
                ng.add_edge(int(a), int(b))
            ours = sorted(map(sorted, g.biconnected_components()))
            theirs = sorted(map(sorted, nx.biconnected_components(ng)))
            assert ours == theirs

    def test_union_find(self):
        uf = UnionFind()
        for i in range(5):
            uf.add(i)
        uf.union(0, 1)
        uf.union(3, 4)
        groups = sorted(map(sorted, uf.groups()))
        assert groups == [[0, 1], [2], [3, 4]]


class TestHungarian:
    def test_simple(self):
        cost = np.array([[4.0, 1.0, 3.0], [2.0, 0.0, 5.0], [3.0, 2.0, 2.0]])
        pairs = hungarian(cost)
        total = sum(cost[r, c] for r, c in pairs)
        assert total == 5.0  # (0,1)+(1,0)+(2,2) = 1+2+2

    def test_matches_scipy_random(self):
        from scipy.optimize import linear_sum_assignment

        rng = np.random.default_rng(7)
        for n in [1, 2, 3, 5, 8, 12]:
            for _ in range(10):
                cost = rng.random((n, n))
                ours = hungarian(cost)
                rows, cols = linear_sum_assignment(cost)
                ours_total = sum(cost[r, c] for r, c in ours)
                scipy_total = cost[rows, cols].sum()
                assert abs(ours_total - scipy_total) < 1e-9

    def test_associate_by_overlap_reference_semantics(self):
        # 2 trackers, 3 detections -> padded 3x3; zero overlap never matches
        overlap = np.zeros((3, 3))
        overlap[0, 1] = 5.0
        overlap[1, 0] = 2.0
        overlap[1, 2] = 3.0
        pairs = associate_by_overlap(overlap, n_rows=2, n_cols=3)
        assert set(pairs) == {(0, 1), (1, 2)}


class TestFormats:
    def test_track_template_exact(self):
        buf = io.StringIO()
        formats.write_track_point(
            buf,
            formats.TrackPoint(
                t=1.23456, identifier=3, left=0.1, top=0.2,
                right=0.30006, bottom=0.4, status="detection",
            ),
        )
        assert buf.getvalue() == "1.235 3 0.100 0.200 0.300 0.400 detection\n"

    def test_tracking_roundtrip(self, tmp_path):
        path = tmp_path / "tracking.txt"
        with open(path, "w") as fp:
            for i in range(5):
                formats.write_track_point(
                    fp,
                    formats.TrackPoint(
                        t=i * 0.04, identifier=i % 2, left=0.1, top=0.2,
                        right=0.3, bottom=0.4, status="forward+detection",
                    ),
                )
        points = formats.read_tracking(str(path))
        assert len(points) == 5
        assert points[2].identifier == 0
        assert points[1].status == "forward+detection"

    def test_group_by_time(self):
        pts = [
            formats.TrackPoint(0.0, 0, 0, 0, 1, 1, "d"),
            formats.TrackPoint(0.04, 1, 0, 0, 1, 1, "d"),
            formats.TrackPoint(0.0, 1, 0, 0, 1, 1, "d"),
        ]
        grouped = list(formats.iter_tracking_by_time(pts))
        assert [t for t, _ in grouped] == [0.0, 0.04]
        assert len(grouped[0][1]) == 2

    def test_embeddings_roundtrip(self, tmp_path):
        path = tmp_path / "emb.txt"
        emb = np.linspace(-1, 1, 128)
        with open(path, "w") as fp:
            formats.write_embedding_line(fp, 0.04, 2, emb)
        times, tracks, X = formats.read_embeddings(str(path))
        assert times[0] == pytest.approx(0.04)
        assert tracks[0] == 2
        assert X.shape == (1, 128)
        np.testing.assert_allclose(X[0], emb, atol=1e-5)

    def test_landmarks_roundtrip(self, tmp_path):
        path = tmp_path / "lmk.txt"
        pts = np.random.default_rng(0).random((68, 2))
        with open(path, "w") as fp:
            formats.write_landmarks_line(fp, 1.0, 0, pts)
        rows = formats.read_landmarks(str(path))
        assert rows[0][2].shape == (68, 2)
        np.testing.assert_allclose(rows[0][2], pts, atol=1e-5)
