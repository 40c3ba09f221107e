"""Frame sources (SURVEY.md component D1).

Decode colonoscopy video or read frame directories into fixed-resolution
RGB streams. Host-side (cv2/imageio); the device boundary is
``colvo.data.prefetch`` (SURVEY.md §3.1 ★ host→HBM).
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Sequence

import numpy as np

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp")

# pixel_format options for the sources below:
#   "float" — float32 RGB in [0, 1] (legacy default; 12 B/px on the wire)
#   "rgb8"  — uint8 RGB (4× cheaper host→device; the streaming VO executor
#             normalizes on device — use this for run_vo)
#   "i420"  — planar uint8 YUV 4:2:0, limited-range BT.601 as video
#             decoders emit it (another 2× cheaper; pair with
#             run_vo(input_format="i420"))


def _emit(rgb_resized: np.ndarray, pixel_format: str) -> np.ndarray:
    if pixel_format == "float":
        return _to_float_rgb(rgb_resized)
    if pixel_format == "rgb8":
        return rgb_resized
    if pixel_format == "i420":
        import cv2

        return cv2.cvtColor(rgb_resized, cv2.COLOR_RGB2YUV_I420)
    raise ValueError(f"unknown pixel_format {pixel_format!r}")


def _resize(frame: np.ndarray, width: int, height: int) -> np.ndarray:
    if frame.shape[0] == height and frame.shape[1] == width:
        return frame
    import cv2

    return cv2.resize(frame, (width, height), interpolation=cv2.INTER_AREA)


def _to_float_rgb(frame: np.ndarray) -> np.ndarray:
    if frame.dtype == np.uint8:
        frame = frame.astype(np.float32) / 255.0
    return frame.astype(np.float32)


class FrameDirSource:
    """Reads a directory of image files (sorted lexicographically)."""

    def __init__(self, path: str, width: int, height: int,
                 pixel_format: str = "float"):
        self.path = path
        self.width = width
        self.height = height
        self.pixel_format = pixel_format
        self.files: List[str] = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.lower().endswith(_IMG_EXTS)
        )
        if not self.files:
            raise FileNotFoundError(f"no image files under {path}")

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> np.ndarray:
        import cv2

        bgr = cv2.imread(self.files[idx], cv2.IMREAD_COLOR)
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        return _emit(_resize(rgb, self.width, self.height), self.pixel_format)

    def __iter__(self) -> Iterator[np.ndarray]:
        for i in range(len(self)):
            yield self[i]


class VideoFrameSource:
    """Decodes a video file into frames at fixed resolution (cv2).

    Streaming: holds only the decoder open, O(1) memory — the long-video
    answer for full colonoscopies (SURVEY.md §5.7).
    """

    def __init__(self, path: str, width: int, height: int, stride: int = 1,
                 pixel_format: str = "float"):
        import cv2

        self.path = path
        self.width = width
        self.height = height
        self.stride = stride
        self.pixel_format = pixel_format
        cap = cv2.VideoCapture(path)
        if not cap.isOpened():
            raise FileNotFoundError(f"cannot open video {path}")
        count = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        # ceil: iteration yields indices 0, stride, 2*stride, … < count
        self._n = (count + stride - 1) // stride
        cap.release()

    def __len__(self) -> int:
        return self._n

    def __iter__(self) -> Iterator[np.ndarray]:
        import cv2

        cap = cv2.VideoCapture(self.path)
        idx = 0
        try:
            while True:
                ok, bgr = cap.read()
                if not ok:
                    return
                if idx % self.stride == 0:
                    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
                    yield _emit(_resize(rgb, self.width, self.height),
                                self.pixel_format)
                idx += 1
        finally:
            cap.release()


class ArraySource:
    """Wraps an in-memory (N, H, W, 3) array (synthetic sequences, tests)."""

    def __init__(self, frames: np.ndarray):
        self.frames = frames

    def __len__(self) -> int:
        return len(self.frames)

    def __getitem__(self, idx: int) -> np.ndarray:
        return self.frames[idx]

    def __iter__(self) -> Iterator[np.ndarray]:
        return iter(self.frames)


def open_source(path_or_array, width: int, height: int, stride: int = 1,
                pixel_format: str = "float"):
    """Open a frame source from a path (dir or video file) or array."""
    if isinstance(path_or_array, np.ndarray):
        return ArraySource(path_or_array)
    if os.path.isdir(path_or_array):
        return FrameDirSource(path_or_array, width, height,
                              pixel_format=pixel_format)
    return VideoFrameSource(path_or_array, width, height, stride,
                            pixel_format=pixel_format)
