"""pyannote-structure CLI: shot / thread / scene.

Same commands, flags, defaults and output schemas as the reference
(`scripts/pyannote-structure.py:36-53`); the ``scene`` command — left
``NotImplementedError`` in the reference (`pyannote-structure.py:86`) — is
implemented here via thread biconnected-component grouping
(`structure/thread.py:224-249` semantics).
"""

from __future__ import annotations

USAGE = """Video structure

The standard pipeline for is the following:

    shot boundary detection ==> shot threading ==> segmentation into scenes

Usage:
  pyannote-structure.py shot [options] <video> <output.json>
  pyannote-structure.py thread [options] <video> <shot.json> <output.json>
  pyannote-structure.py scene [options] <video> <thread.json> <output.json>
  pyannote-structure.py (-h | --help)
  pyannote-structure.py --version

Options:
  --ffmpeg=<ffmpeg>      Specify which `ffmpeg` to use.
  --height=<n_pixels>    Resize video frame to height <n_pixels> [default: 50].
  --window=<n_seconds>   Apply median filtering on <n_seconds> window [default: 2.0].
  --threshold=<value>    Set threshold to <value> [default: 1.0].
  --noise-floor=<value>  Additive denominator floor for shot DFD peak
                         normalisation; 0 restores the reference's bare
                         (y - median)/median rule [default: 1.0].
  --min-match=<n_match>  Set minimum number of matches to <n_match> [default: 20].
  --lookahead=<n_shots>  Look at up to <n_shots> following shots [default: 24].
  -h --help              Show this screen.
  --version              Show version.
  --verbose              Show progress.
"""


def do_shot(video, output, height=50, window=2.0, threshold=1.0,
            noise_floor=1.0):
    from ..core import Timeline, dump
    from ..pipeline.shot import Shot

    shots = Shot(video, height=height, context=window, threshold=threshold,
                 noise_floor=noise_floor)
    shots = Timeline(shots)
    with open(output, "w") as fp:
        dump(shots, fp)


def do_thread(video, shots_path, output, min_match=20, lookahead=24,
              verbose=False):
    from ..core import load, dump
    from ..pipeline.thread import Thread

    with open(shots_path, "r") as fp:
        shots = load(fp)
    threads = Thread(video, shot=shots, lookahead=lookahead,
                     min_match=min_match, verbose=verbose)
    with open(output, "w") as fp:
        dump(threads(), fp)


def do_scene(video, threads_path, output, verbose=False):
    """Scene segmentation from threads — the extension the reference left
    unimplemented (`pyannote-structure.py:82-89`)."""
    from ..core import load, dump
    from ..pipeline.thread import scenes_from_threads

    with open(threads_path, "r") as fp:
        threads = load(fp)
    with open(output, "w") as fp:
        dump(scenes_from_threads(threads), fp)


def main(argv=None):
    from .. import __version__
    from ..io.video import Video
    from .args import parse

    arguments = parse(
        USAGE,
        version=f"pyannote-structure {__version__}",
        argv=argv,
        commands=["shot", "thread", "scene"],
        positionals={
            "shot": ["<video>", "<output.json>"],
            "thread": ["<video>", "<shot.json>", "<output.json>"],
            "scene": ["<video>", "<thread.json>", "<output.json>"],
        },
        defaults={
            "--ffmpeg": "",
            "--height": "50",
            "--window": "2.0",
            "--threshold": "1.0",
            "--noise-floor": "1.0",
            "--min-match": "20",
            "--lookahead": "24",
            "--verbose": None,
        },
    )

    verbose = arguments["--verbose"]
    output = arguments["<output.json>"]
    filename = arguments["<video>"]
    ffmpeg = arguments["--ffmpeg"] or None

    video = Video(filename, ffmpeg=ffmpeg, verbose=bool(verbose))

    if arguments["shot"]:
        do_shot(video, output,
                height=int(arguments["--height"]),
                window=float(arguments["--window"]),
                threshold=float(arguments["--threshold"]),
                noise_floor=float(arguments["--noise-floor"]))

    if arguments["thread"]:
        do_thread(video, arguments["<shot.json>"], output,
                  min_match=int(arguments["--min-match"]),
                  lookahead=int(arguments["--lookahead"]),
                  verbose=bool(verbose))

    if arguments["scene"]:
        do_scene(video, arguments["<thread.json>"], output,
                 verbose=bool(verbose))


if __name__ == "__main__":
    main()
