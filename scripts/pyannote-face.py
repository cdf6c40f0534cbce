#!/usr/bin/env python
"""pyannote-face: face tracking / feature extraction / demo overlay.

Entry-point wrapper; see pyannote_video_tpu/cli/face_cli.py.
"""

from pyannote_video_tpu.cli.face_cli import main

if __name__ == "__main__":
    main()
