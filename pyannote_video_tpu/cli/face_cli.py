"""pyannote-face CLI: track / extract / demo.

Same commands, flags, defaults, file schemas as the reference
(`scripts/pyannote-face.py:35-89`):

* ``track``  — shot JSON + video → tracking file (one line per
  (t, track-id, normalized bbox, status), `pyannote-face.py:116-118`);
* ``extract`` — tracking file + models → landmarks + embeddings files
  (`pyannote-face.py:271-314`), batched on TPU per timestamp group;
* ``demo``   — overlay video with boxes/ids/labels/nose lines
  (`pyannote-face.py:317-413`); host-side drawing + OpenCV encode
  (ffmpeg/moviepy-free).
"""

from __future__ import annotations

import colorsys
import sys
from typing import Dict, List

import numpy as np

USAGE = """Face detection and tracking

The standard pipeline is the following

      face tracking => feature extraction => face clustering

Usage:
  pyannote-face track [options] <video> <shot.json> <tracking>
  pyannote-face extract [options] <video> <tracking> <landmark_model> <embedding_model> <landmarks> <embeddings>
  pyannote-face demo [options] <video> <tracking> <output>
  pyannote-face (-h | --help)
  pyannote-face --version

General options:

  --ffmpeg=<ffmpeg>         Specify which `ffmpeg` to use.
  -h --help                 Show this screen.
  --version                 Show version.
  --verbose                 Show processing progress.

Face tracking options (track):

  <video>                   Path to video file.
  <shot.json>               Path to shot segmentation result file.
  <tracking>                Path to tracking result file.

  --min-size=<ratio>        Approximate size (in video height ratio) of the
                            smallest face that should be detected. Default is
                            to try and detect any object [default: 0.0].
  --every=<seconds>         Only apply detection every <seconds> seconds.
                            Default is to process every frame [default: 0.0].
  --min-overlap=<ratio>     Associates face with tracker if overlap is greater
                            than <ratio> [default: 0.5].
  --min-confidence=<float>  Reset trackers with confidence lower than <float>
                            [default: 10.].
  --max-gap=<float>         Bridge gaps with duration shorter than <float>
                            [default: 1.].
  --resume                  Resume an interrupted run from the last fully
                            tracked shot in <tracking> (extension; shots are
                            independent work units so per-shot restart is
                            exact).
  --rank=<r>                Multi-worker mode (extension): this worker's
                            rank; processes shots where index mod world ==
                            rank and writes <tracking>.part<r> [default: 0].
  --world=<w>               Total number of workers; rank 0 merges the
                            part files into <tracking> once all workers
                            have finished [default: 1].
  --coordinator=<addr>      host:port of the jax.distributed coordinator
                            (only needed on multi-host TPU slices).

Feature extraction options (extract):

  <video>                   Path to video file.
  <tracking>                Path to tracking result file.
  <landmark_model>          Path to facial landmark detection model (.npz).
  <embedding_model>         Path to feature extraction model (.npz).
  <landmarks>               Path to facial landmarks detection result file.
  <embeddings>              Path to feature extraction result file.
  --exact-chips             Use exact rotated chip sampling (dlib
                            get_face_chip parity, including face roll) for
                            the embedding alignment instead of the fast
                            axis-aligned path (extension).

Visualization options (demo):

  <video>                   Path to video file.
  <tracking>                Path to tracking result file.
  <output>                  Path to demo video file.

  --height=<pixels>         Height of demo video file [default: 400].
  --from=<sec>              Encode demo from <sec> seconds [default: 0].
  --until=<sec>             Encode demo until <sec> seconds.
  --shift=<sec>             Shift result files by <sec> seconds [default: 0].
  --landmark=<path>         Path to facial landmarks detection result file.
  --label=<path>            Path to track identification result file.
"""

MIN_OVERLAP_RATIO = 0.5
MIN_CONFIDENCE = 10.0
MAX_GAP = 1.0


def track(video, shot_path, output,
          detect_min_size=0.0, detect_every=0.0,
          track_min_overlap_ratio=MIN_OVERLAP_RATIO,
          track_min_confidence=MIN_CONFIDENCE,
          track_max_gap=MAX_GAP, resume=False, verbose=False,
          rank=0, world=1, coordinator=None, legs=None):
    """Tracking by detection (reference `pyannote-face.py:239-269`).

    With ``resume=True``, restarts from the shot containing the last
    written timestamp: shots are independent work units
    (`tracking.py:408-417`), so completed shots are kept verbatim and the
    interrupted shot is re-tracked.

    With ``world > 1`` (extension), this process is worker ``rank`` of a
    shot-sharded multi-worker run: it tracks shots ``rank, rank+world, …``
    into ``<output>.part<rank>``; rank 0 then waits for the other parts
    and merges them deterministically (`parallel/multihost.py`).
    """
    import os

    from ..core import Annotation, load, formats
    from ..pipeline.face_tracking import FaceTracking
    from ..parallel.multihost import (
        init_distributed, merge_tracking_parts, part_path,
    )

    init_distributed(coordinator, rank, world)

    tracking = FaceTracking(detect_min_size=detect_min_size,
                            detect_every=detect_every,
                            track_min_overlap_ratio=track_min_overlap_ratio,
                            track_min_confidence=track_min_confidence,
                            track_max_gap=track_max_gap)

    with open(shot_path, "r") as fp:
        shot = load(fp)
    if isinstance(shot, Annotation):
        shot = shot.get_timeline()
    shots = list(shot)

    next_id = 0
    if resume and os.path.exists(output):
        points = formats.read_tracking(output)
        if points:
            t_last = max(p.t for p in points)
            start_idx = len(shots)
            for i, seg in enumerate(shots):
                if seg.start <= t_last < seg.end:
                    start_idx = i
                    break
            restart_t = (shots[start_idx].start
                         if start_idx < len(shots) else float("inf"))
            keep = [p for p in points if p.t < restart_t]
            with open(output, "w") as fp:
                for p in keep:
                    formats.write_track_point(fp, p)
            next_id = max((p.identifier for p in keep), default=-1) + 1
            shots = shots[start_idx:]
            if shots:
                video.start = max(video.start, shots[0].start)

    from ..utils.profiling import StageStats

    stats = StageStats("track")

    if world > 1:
        # shot-sharded worker: segments with index mod world == rank.
        # The streaming path plans over the FULL frame grid (decode is
        # sequential anyway and overlaps compute) and drops unassigned
        # shots before any device work — so every worker's frame
        # partition, detections and scans are bit-identical to the
        # single-worker streaming run, and the merged parts reproduce it
        # exactly.  The legacy per-shot seek loop remains for custom
        # detectors and PYV_NO_STREAM=1.
        use_stream = (os.environ.get("PYV_NO_STREAM") != "1"
                      and tracking.detect_func is None)
        if use_stream:
            from ..pipeline.streaming import StreamLegs, stream_tracks

            legs = StreamLegs() if legs is None else legs

            def _my_tracks():
                return stream_tracks(
                    tracking, video, shots, legs=legs,
                    segment_filter=lambda i: i % world == rank)
        else:
            def _my_tracks():
                my_shots = [s for i, s in enumerate(shots)
                            if i % world == rank]
                old_start, old_end = video.start, video.end
                try:
                    for seg in my_shots:
                        video.start, video.end = seg.start, seg.end
                        yield from tracking(video, [seg])
                finally:
                    video.start, video.end = old_start, old_end

        with open(part_path(output, rank), "w") as foutput:
            for identifier, trk in enumerate(_my_tracks()):
                for t, (left, top, right, bottom), status in trk:
                    foutput.write(formats.FACE_TEMPLATE.format(
                        t=t, identifier=identifier, status=status,
                        left=left, right=right, top=top, bottom=bottom))
                stats.add(n=len(trk), tracks=1)
                foutput.flush()
        if rank == 0:
            # include_existing folds the pre-restart tracks kept by
            # --resume into the merge (the merge rewrites `output`)
            merge_tracking_parts(output, world, wait_s=3600.0,
                                 include_existing=resume)
    else:
        # the hot path: streaming architecture (overlapped decode →
        # YUV420 transfer → device compute, `pipeline/streaming.py`) —
        # same track semantics as the per-shot legacy loop (which
        # remains for custom detectors; PYV_NO_STREAM=1 forces it for
        # A/B comparison) with gray taken from the packed YUV420 luma
        # plane rather than a decoded-RGB conversion
        use_stream = os.environ.get("PYV_NO_STREAM") != "1"
        if use_stream:
            from ..pipeline.streaming import StreamLegs, stream_tracks

            legs = StreamLegs() if legs is None else legs
            track_iter = stream_tracks(tracking, video, shots, legs=legs)
        else:
            track_iter = tracking(video, shots)
        with open(output, "a" if resume else "w") as foutput:
            for offset, trk in enumerate(track_iter):
                identifier = next_id + offset
                for t, (left, top, right, bottom), status in trk:
                    foutput.write(formats.FACE_TEMPLATE.format(
                        t=t, identifier=identifier, status=status,
                        left=left, right=right, top=top, bottom=bottom))
                stats.add(n=len(trk), tracks=1)
                foutput.flush()
        if verbose and legs is not None:
            print("stream legs:", legs.as_dict(), file=sys.stderr)
    if verbose:
        print(stats.finish(), file=sys.stderr)


EXTRACT_FACES_PER_BATCH = 64  # padded face slots per device dispatch


def extract(video, landmark_model, embedding_model, tracking_path,
            landmark_output, embedding_output, exact_chips=False,
            verbose=False, legs=None):
    """Landmarks + embeddings for tracked faces (reference
    `pyannote-face.py:271-314`).

    TPU execution model (`pipeline/streaming.py:stream_extract`): ONE
    sequential decode pass pipelined against YUV420 transfer and device
    compute; landmarks + chip warp + ResNet-29 run as one jitted program
    per batch with chips sampled straight from the YUV planes — the
    reference's per-face dlib loop (`pyannote-face.py:294-311`) is
    latency-bound on an accelerator, and the pre-r5 per-chunk random
    access (`video(T)` seeks + synchronous RGB uploads) was
    transfer-bound.  ``PYV_NO_STREAM=1`` selects the legacy chunked
    random-access path.
    """
    import os

    from ..core import formats
    from ..models.embedder import FaceEmbedder
    from ..models.landmarks import LandmarkPredictor

    frame_width, frame_height = video.frame_size
    points = formats.read_tracking(tracking_path)
    predictor = LandmarkPredictor(landmark_model or None)
    embedder = FaceEmbedder(embedding_model or None)

    if os.environ.get("PYV_NO_STREAM") == "1":
        return _extract_legacy(video, predictor, embedder, points,
                               landmark_output, embedding_output,
                               exact_chips)

    from ..pipeline.streaming import StreamLegs, stream_extract

    legs = StreamLegs() if legs is None else legs
    with open(landmark_output, "w") as flandmark, \
         open(embedding_output, "w") as fembedding:
        for T, p, lm, emb in stream_extract(
                video, points, predictor, embedder,
                exact_chips=exact_chips, legs=legs):
            norm = lm / np.asarray([frame_width, frame_height])
            formats.write_landmarks_line(flandmark, T, p.identifier, norm)
            formats.write_embedding_line(fembedding, T, p.identifier, emb)
            flandmark.flush()
            fembedding.flush()
    if verbose:
        print("stream legs:", legs.as_dict(), file=sys.stderr)


def _extract_legacy(video, predictor, embedder, points,
                    landmark_output, embedding_output, exact_chips):
    """Pre-r5 extract: chunked random access (``video(T)`` per unique
    timestamp) + synchronous RGB uploads.  Kept as the A/B reference for
    the streaming path and for non-seekable custom sources."""
    import jax.numpy as jnp

    from ..core import formats
    from ..models.chip import extract_chips, extract_chips_exact

    frame_width, frame_height = video.frame_size
    grouped = list(formats.iter_tracking_by_time(points))
    # flatten to (T, point) preserving group order
    flat = [(T, p) for T, group in grouped for p in group]

    with open(landmark_output, "w") as flandmark, \
         open(embedding_output, "w") as fembedding:

        for start in range(0, len(flat), EXTRACT_FACES_PER_BATCH):
            chunk = flat[start : start + EXTRACT_FACES_PER_BATCH]
            n = len(chunk)
            # gather the chunk's unique frames once; pad the frame axis to a
            # power of two so chunks reuse a handful of compiled shapes
            times = sorted({T for T, _ in chunk})
            t_index = {T: i for i, T in enumerate(times)}
            frames = np.stack([video(T) for T in times])
            n_pow2 = 1 << (len(times) - 1).bit_length()
            if n_pow2 > len(times):
                frames = np.concatenate(
                    [frames, np.repeat(frames[:1], n_pow2 - len(times), 0)]
                )

            pad = EXTRACT_FACES_PER_BATCH - n
            fidx = np.asarray(
                [t_index[T] for T, _ in chunk] + [0] * pad, dtype=np.int32
            )
            boxes = np.asarray(
                [[p.left * frame_width, p.top * frame_height,
                  p.right * frame_width, p.bottom * frame_height]
                 for _, p in chunk]
                + [[0.0, 0.0, 10.0, 10.0]] * pad, dtype=np.float32)

            landmarks = predictor.predict_batch(frames, fidx, boxes)
            chip_fn = extract_chips_exact if exact_chips else extract_chips
            chips = chip_fn(
                jnp.asarray(frames), jnp.asarray(fidx),
                jnp.asarray(landmarks))
            embeddings = embedder(chips)

            for (T, p), lm, emb in zip(chunk, landmarks[:n], embeddings[:n]):
                norm = lm / np.asarray([frame_width, frame_height])
                formats.write_landmarks_line(flandmark, T, p.identifier, norm)
                formats.write_embedding_line(fembedding, T, p.identifier, emb)
            flandmark.flush()
            fembedding.flush()


# The reference's fixed track-color table (behavioral constant, same
# category as its ffmpeg flags: `pyannote-face.py:320-328` — itself the
# public Green-Armytage 26-color alphabet), so demo frames are
# pixel-comparable with reference output.
REFERENCE_COLORS: List[tuple] = [
    (240, 163, 255), (0, 117, 220), (153, 63, 0), (76, 0, 92),
    (25, 25, 25), (0, 92, 49), (43, 206, 72), (255, 204, 153),
    (128, 128, 128), (148, 255, 181), (143, 124, 0), (157, 204, 0),
    (194, 0, 136), (0, 51, 128), (255, 164, 5), (255, 168, 187),
    (66, 102, 0), (255, 0, 16), (94, 241, 242), (0, 153, 143),
    (224, 255, 102), (116, 10, 255), (153, 0, 0), (255, 255, 128),
    (255, 255, 0), (255, 80, 5),
]


def _palette(n: int = 26) -> List[tuple]:
    """Track colors: the reference's fixed 26-color table, extended with
    golden-ratio HSV colors when more are requested."""
    colors = list(REFERENCE_COLORS[:n])
    for i in range(len(colors), n):
        h = (i * 0.618033988749895) % 1.0
        v = 0.85 if i % 2 == 0 else 0.6
        r, g, b = colorsys.hsv_to_rgb(h, 0.85, v)
        colors.append((int(r * 255), int(g * 255), int(b * 255)))
    return colors


def demo(filename, tracking_path, output, t_start=0.0, t_end=None, shift=0.0,
         labels_path=None, landmark_path=None, height=200, ffmpeg=None):
    """Overlay video (reference `pyannote-face.py:317-413`): colored face
    boxes, #track-id, optional labels and nose lines, timestamp."""
    import cv2

    from ..core import formats
    from ..io.video import Video

    labels: Dict[int, str] = (
        formats.read_labels(labels_path) if labels_path else {}
    )

    video = Video(filename, ffmpeg=ffmpeg)
    video_width, video_height = video.size
    ratio = height / video_height
    width = int(ratio * video_width)
    video.frame_size = (width, height)

    points = formats.read_tracking(tracking_path)
    by_time = list(formats.iter_tracking_by_time(points))
    landmark_rows = (
        formats.read_landmarks(landmark_path) if landmark_path else []
    )
    lm_by_time: Dict[float, List] = {}
    for (t, identifier, pts) in landmark_rows:
        lm_by_time.setdefault(t, []).append((identifier, pts))

    colors = _palette()
    t_end = video.duration if t_end is None else t_end

    writer = cv2.VideoWriter(
        output, cv2.VideoWriter_fourcc(*"MJPG"), video.frame_rate,
        (width, height),
    )
    if not writer.isOpened():
        raise IOError(f"could not open video writer for {output}")

    face_idx = 0
    for t in np.arange(t_start, t_end, 1.0 / video.frame_rate):
        frame = np.ascontiguousarray(video(t))
        t_query = t - shift
        # reference timing semantics (`pyannote-face.py:159-172`): each
        # frame query consumes AT MOST ONE timestamp group, and a group is
        # drawn only on the first frame at/after its timestamp — faces are
        # not held over later frames.  (Deviation: the reference's
        # generator drops the final group entirely when its for-loop ends,
        # `pyannote-face.py:174-175`; we display it.)
        current_faces: List = []
        if face_idx < len(by_time) and by_time[face_idx][0] <= t_query:
            current_faces = by_time[face_idx][1]
            face_idx += 1

        cv2.putText(frame, f"{t:.3f}", (10, height - 10),
                    cv2.FONT_HERSHEY_DUPLEX, 0.5, (255, 0, 0), 1, 8, False)

        for p in current_faces:
            color = colors[p.identifier % len(colors)]
            pt1 = (int(p.left * width), int(p.top * height))
            pt2 = (int(p.right * width), int(p.bottom * height))
            cv2.rectangle(frame, pt1, pt2, color, 2)
            cv2.putText(frame, f"#{p.identifier:d}", (pt1[0], pt2[1] + 15),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 0, 0), 1, 8,
                        False)
            label = labels.get(p.identifier, "")
            cv2.putText(frame, f"{label:s}", (pt1[0], pt1[1] - 7),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 0, 0), 1, 8,
                        False)
            # nose line (landmarks 27 -> 33) when landmarks are available
            for identifier, pts in lm_by_time.get(p.t, []):
                if identifier != p.identifier:
                    continue
                # reference rounds landmark pixels (`pyannote-face.py:206`)
                n1 = (int(round(pts[27, 0] * width)),
                      int(round(pts[27, 1] * height)))
                n2 = (int(round(pts[33, 0] * width)),
                      int(round(pts[33, 1] * height)))
                cv2.line(frame, n1, n2, color, 1)

        writer.write(frame[:, :, ::-1])  # RGB -> BGR
    writer.release()
    _mux_audio(filename, output, t_start, t_end, ffmpeg=ffmpeg)


def _mux_audio(source, output, t_start, t_end, ffmpeg=None):
    """Copy the source's audio track into the rendered demo.

    The reference gets audio passthrough for free from moviepy's ffmpeg
    writer (`pyannote-face.py:408-413`); cv2.VideoWriter is video-only, so
    when an ffmpeg binary is available the demo is re-muxed in place.
    Without one (e.g. this image) the demo stays silent with a warning —
    same pixels either way.
    """
    import shutil
    import subprocess
    import tempfile
    import warnings

    import os

    ffmpeg_bin = ffmpeg or shutil.which("ffmpeg")
    if not ffmpeg_bin or not shutil.which(ffmpeg_bin):
        warnings.warn("no ffmpeg binary found - demo has no audio track")
        return
    dot = output.rfind(".")
    suffix = output[dot:] if dot > 0 else ".avi"
    fd, tmp = tempfile.mkstemp(suffix=suffix)
    os.close(fd)
    cmd = [ffmpeg_bin, "-y", "-i", output, "-ss", f"{t_start:.3f}",
           "-to", f"{t_end:.3f}", "-i", source,
           "-map", "0:v", "-map", "1:a?", "-c:v", "copy", "-c:a", "aac",
           "-shortest", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        shutil.move(tmp, output)
    except (subprocess.CalledProcessError, OSError) as exc:
        warnings.warn(f"audio mux failed ({exc}); demo has no audio track")
        try:
            os.remove(tmp)
        except OSError:
            pass


def main(argv=None):
    from .. import __version__
    from ..io.video import Video
    from .args import parse

    arguments = parse(
        USAGE,
        version=f"pyannote-face {__version__}",
        argv=argv,
        commands=["track", "extract", "demo"],
        positionals={
            "track": ["<video>", "<shot.json>", "<tracking>"],
            "extract": ["<video>", "<tracking>", "<landmark_model>",
                        "<embedding_model>", "<landmarks>", "<embeddings>"],
            "demo": ["<video>", "<tracking>", "<output>"],
        },
        defaults={
            "--ffmpeg": "",
            "--verbose": None,
            "--min-size": "0.0",
            "--every": "0.0",
            "--min-overlap": "0.5",
            "--min-confidence": "10.",
            "--max-gap": "1.",
            "--resume": None,
            "--exact-chips": None,
            "--rank": "0",
            "--world": "1",
            "--coordinator": "",
            "--height": "400",
            "--from": "0",
            "--until": "",
            "--shift": "0",
            "--landmark": "",
            "--label": "",
        },
    )

    filename = arguments["<video>"]
    ffmpeg = arguments["--ffmpeg"] or None
    verbose = bool(arguments["--verbose"])

    if arguments["track"]:
        video = Video(filename, ffmpeg=ffmpeg, verbose=verbose)
        track(video, arguments["<shot.json>"], arguments["<tracking>"],
              detect_min_size=float(arguments["--min-size"]),
              detect_every=float(arguments["--every"]),
              track_min_overlap_ratio=float(arguments["--min-overlap"]),
              track_min_confidence=float(arguments["--min-confidence"]),
              track_max_gap=float(arguments["--max-gap"]),
              resume=bool(arguments["--resume"]), verbose=verbose,
              rank=int(arguments["--rank"]), world=int(arguments["--world"]),
              coordinator=arguments["--coordinator"] or None)

    if arguments["extract"]:
        video = Video(filename, ffmpeg=ffmpeg, verbose=verbose)
        extract(video, arguments["<landmark_model>"],
                arguments["<embedding_model>"], arguments["<tracking>"],
                arguments["<landmarks>"], arguments["<embeddings>"],
                exact_chips=bool(arguments["--exact-chips"]),
                verbose=verbose)

    if arguments["demo"]:
        t_end = arguments["--until"]
        demo(filename, arguments["<tracking>"], arguments["<output>"],
             t_start=float(arguments["--from"]),
             t_end=float(t_end) if t_end else None,
             shift=float(arguments["--shift"]),
             labels_path=arguments["--label"] or None,
             landmark_path=arguments["--landmark"] or None,
             height=int(arguments["--height"]),
             ffmpeg=ffmpeg)


if __name__ == "__main__":
    main()
