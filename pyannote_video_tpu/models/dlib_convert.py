"""dlib ``.dat`` model-file conversion (parser + topology mapping).

The reference loads three dlib model files at runtime
(`face/face.py:54-62`): ``mmod_human_face_detector.dat``,
``shape_predictor_68_face_landmarks.dat`` and
``dlib_face_recognition_resnet_model_v1.dat``.  None are present in this
environment (zero egress, SURVEY §2.2), so conversion cannot be exercised
here; this module provides (a) a working parser for dlib's primitive
serialization layer and (b) the documented topology mapping each converter
must walk, so an environment WITH the files can complete the port and
validate the ≤1e-3 embedding-parity target (BASELINE.md).

dlib primitive wire format (dlib/serialize.h):

* unsigned integers — one control byte whose low 4 bits give the number of
  payload bytes ``n``, followed by ``n`` little-endian bytes;
* signed integers — same, with the sign carried in control-byte bit 0x10;
* ``float``/``double`` — serialized via ``float_details``: three signed
  integers (mantissa, exponent, sign embedded in mantissa), value =
  mantissa · 2^exponent;
* ``matrix<T>`` — long rows, long cols, then row-major elements;
* ``std::vector<T>`` — size then elements;
* ``std::string`` — size then raw bytes.
"""

from __future__ import annotations

from typing import BinaryIO

import numpy as np


class DlibReader:
    """Reader for dlib's primitive serialization layer."""

    def __init__(self, fp: BinaryIO):
        self.fp = fp

    def read_bytes(self, n: int) -> bytes:
        data = self.fp.read(n)
        if len(data) != n:
            raise EOFError(f"expected {n} bytes, got {len(data)}")
        return data

    def read_uint(self) -> int:
        """Unsigned integer: control byte (low nibble = payload size) +
        little-endian payload."""
        control = self.read_bytes(1)[0]
        size = control & 0x0F
        if size > 8:
            raise ValueError(f"invalid dlib integer control byte: {control:#x}")
        value = 0
        for i, b in enumerate(self.read_bytes(size)):
            value |= b << (8 * i)
        return value

    def read_int(self) -> int:
        """Signed integer: sign in control-byte bit 0x10."""
        control = self.read_bytes(1)[0]
        size = control & 0x0F
        negative = bool(control & 0x10)
        if size > 8:
            raise ValueError(f"invalid dlib integer control byte: {control:#x}")
        value = 0
        for i, b in enumerate(self.read_bytes(size)):
            value |= b << (8 * i)
        return -value if negative else value

    def read_float(self) -> float:
        """float_details: mantissa and exponent as signed integers."""
        mantissa = self.read_int()
        exponent = self.read_int()
        return float(mantissa) * (2.0 ** exponent)

    def read_string(self) -> str:
        n = self.read_uint()
        return self.read_bytes(n).decode("utf-8", errors="replace")

    def read_matrix(self, dtype=np.float32) -> np.ndarray:
        rows = self.read_int()
        cols = self.read_int()
        out = np.empty((rows, cols), dtype=np.float64)
        flat = out.reshape(-1)
        for i in range(rows * cols):
            flat[i] = self.read_float()
        return out.astype(dtype)


# ---------------------------------------------------------------------------
# Topology maps each converter must walk (kept in code so the mapping is
# testable the moment the files exist).
# ---------------------------------------------------------------------------

#: dlib shape_predictor_68 layout (dlib/image_processing/shape_predictor.h):
#: version string, initial_shape matrix [136, 1], forests
#: (cascade_depth=10 × num_trees=500 regression trees: 15 splits
#: (idx1 uint, idx2 uint, thresh float) + 16 leaf matrices [136, 1]),
#: anchor_idx (vector<vector<uint>>), deltas (vector<vector<vector2>>).
SHAPE_PREDICTOR_LAYOUT = {
    "cascade_depth": 10,
    "trees_per_cascade": 500,
    "tree_depth": 4,
    "landmarks": 68,
    "target": "models/landmarks.py params dict "
              "(mean_shape, s{k}/anchor, s{k}/offset, s{k}/i1, s{k}/i2, "
              "s{k}/thresh, s{k}/leaves)",
}

#: dlib ResNet-29 (face_recognition_model_v1) layer stack, outermost-first
#: in the file (dlib serializes the network from the loss inward).  Our
#: embedder (models/embedder.py) uses the same stack; map conv filters to
#: HWIO and fold each affine layer into bn {scale, bias} with
#: mean=0/var=1.
RESNET29_LAYER_STACK = [
    "loss_metric", "fc_no_bias<128>", "avg_pool_everything",
    "ares_down<256>",                           # alevel0
    "ares<256>", "ares<256>", "ares_down<256>",  # alevel1
    "ares<128>", "ares<128>", "ares_down<128>",  # alevel2
    "ares<64>", "ares<64>", "ares<64>", "ares_down<64>",  # alevel3
    "ares<32>", "ares<32>", "ares<32>",          # alevel4
    "max_pool<3,3,2,2>", "relu", "affine", "con<32,7,7,2,2>",
    "input_rgb_image_sized<150>",
]


def convert_shape_predictor(path: str):
    """shape_predictor_68_face_landmarks.dat → models/landmarks.py params.

    Raises FileNotFoundError in environments without the file.  The
    primitive layer (DlibReader) is implemented; walking the layout above
    and validating against dlib outputs requires the actual file.
    """
    with open(path, "rb") as fp:
        reader = DlibReader(fp)
        version = reader.read_string()
        raise NotImplementedError(
            f"shape_predictor container walk not yet validated "
            f"(file version: {version!r}); see SHAPE_PREDICTOR_LAYOUT"
        )


def convert_face_recognition(path: str):
    """dlib_face_recognition_resnet_model_v1.dat → embedder params."""
    with open(path, "rb") as fp:
        reader = DlibReader(fp)
        version = reader.read_string()
        raise NotImplementedError(
            f"ResNet-29 container walk not yet validated "
            f"(file version: {version!r}); see RESNET29_LAYER_STACK"
        )
