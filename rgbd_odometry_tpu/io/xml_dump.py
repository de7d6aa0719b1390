"""Reference frame-dump interop: OpenCV-XML pyramid files.

The reference's offline dataset mode dumps each frame's 4-level pyramid to
one cv::FileStorage XML — nodes `mono_0..3` (CV_8U gray) and `depth_0..3`
(CV_16U millimetres) in files named `framemono_%04d.xml`
(writer: /root/reference/src/publisherPyD.cpp:216-256 and
/root/reference/src/camTopic2PublisherPyD.cpp:315-365; reader:
`SolveDVO::loadFromFile`, /root/reference/src/SolveDVO.cpp:154-190; replay
loop plug `__DATA_FROM_XML_FILES__`, include/SolveDVO.h:119-122 with the
`%s/framemono_%04d.xml` pattern at src/SolveDVO.cpp:1961).

This module reads and writes that exact format, which is the one concrete
byte-level bridge between reference runs and this framework: frames dumped by
the reference replay here (`cli dvo --source xml:<dir>`), and frames dumped
here replay in the reference's offline mode.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

_FRAME_RE = re.compile(r"framemono_(\d+)\.xml$")


def frame_path(directory: str, frame_idx: int) -> str:
    """`%s/framemono_%04d.xml` (/root/reference/src/SolveDVO.cpp:1961)."""
    return os.path.join(directory, f"framemono_{frame_idx:04d}.xml")


def write_frame_dump(
    directory: str,
    frame_idx: int,
    gray_pyr: Sequence[np.ndarray],
    depth_mm_pyr: Sequence[np.ndarray],
) -> str:
    """Write one frame's pyramid in the reference's dump format.

    `gray_pyr` entries are 0..255-valued (any float/int dtype, stored CV_8U);
    `depth_mm_pyr` entries are millimetres (stored CV_16U, the converter
    node's depth encoding, /root/reference/src/camTopic2PublisherPyD.cpp:76).
    """
    import cv2

    path = frame_path(directory, frame_idx)
    fs = cv2.FileStorage(path, cv2.FILE_STORAGE_WRITE)
    try:
        for i, (g, d) in enumerate(zip(gray_pyr, depth_mm_pyr)):
            g8 = np.clip(np.round(np.asarray(g, np.float64)), 0, 255).astype(np.uint8)
            d16 = np.clip(np.round(np.asarray(d, np.float64)), 0, 65535).astype(np.uint16)
            fs.write(f"mono_{i}", g8)
            fs.write(f"depth_{i}", d16)
    finally:
        fs.release()
    return path


def read_frame_dump(
    path: str, num_levels: int = 4
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Read one reference dump file -> (gray_pyr float32, depth_mm_pyr float32).

    Matches `loadFromFile`'s semantics (/root/reference/src/SolveDVO.cpp:
    163-185): levels 0..3 loaded into float matrices, no depth sanitize here
    (the reference's 0->1 fix lives in the message callback, :512; sources
    apply it before feeding the solver).
    """
    mats = _read_opencv_xml_mats(path)
    gray, depth = [], []
    for i in range(num_levels):
        if f"mono_{i}" not in mats or f"depth_{i}" not in mats:
            raise ValueError(f"{path}: missing mono_{i}/depth_{i} node")
        gray.append(mats[f"mono_{i}"].astype(np.float32))
        depth.append(mats[f"depth_{i}"].astype(np.float32))
    return gray, depth


def list_dump_frames(directory: str) -> List[Tuple[int, str]]:
    """Sorted (frame_idx, path) of every framemono_NNNN.xml in `directory`."""
    out = []
    for name in os.listdir(directory):
        m = _FRAME_RE.search(name)
        if m:
            out.append((int(m.group(1)), os.path.join(directory, name)))
    out.sort()
    return out


@dataclass
class XmlDumpSource:
    """Replay a directory of reference XML dumps as a FrameSource.

    The `__DATA_FROM_XML_FILES__` offline mode
    (/root/reference/src/SolveDVO.cpp:1953-1969) with START/END controls.
    Yields (gray level-0, depth_mm level-0, timestamp); depth gets the
    0->1 sanitize the reference's callback applies (:512).
    """

    root: str
    start: int = 0
    end: Optional[int] = None
    fps: float = 30.0

    def frames(self):
        entries = list_dump_frames(self.root)
        if self.end is not None:
            entries = [(i, p) for i, p in entries if i <= self.end]
        entries = [(i, p) for i, p in entries if i >= self.start]
        for idx, path in entries:
            gray, depth = read_frame_dump(path)
            d0 = np.where(depth[0] == 0, 1.0, depth[0]).astype(np.float32)
            yield gray[0], d0, idx / self.fps

    def pyramids(self):
        """Full stored pyramids (all levels, no rebuild) — for byte-level
        cross-validation against reference runs on the same dumps."""
        entries = list_dump_frames(self.root)
        if self.end is not None:
            entries = [(i, p) for i, p in entries if i <= self.end]
        entries = [(i, p) for i, p in entries if i >= self.start]
        for idx, path in entries:
            gray, depth = read_frame_dump(path)
            depth = [np.where(d == 0, 1.0, d).astype(np.float32) for d in depth]
            yield gray, depth, idx / self.fps


def _read_opencv_xml_mats(path: str) -> dict:
    """All opencv-matrix nodes of a cv::FileStorage XML, by name."""
    try:
        import cv2

        fs = cv2.FileStorage(path, cv2.FILE_STORAGE_READ)
        if fs.isOpened():
            # FileStorage has no node enumeration for XML in some builds;
            # probe the known names instead
            mats = {}
            for i in range(8):
                for prefix in ("mono", "depth"):
                    node = fs.getNode(f"{prefix}_{i}")
                    if not node.empty():
                        m = node.mat()
                        if m is not None:
                            mats[f"{prefix}_{i}"] = m
            fs.release()
            if mats:
                return mats
    except Exception:
        pass
    # minimal fallback parser (opencv-matrix XML layout)
    text = open(path).read()
    mats = {}
    for m in re.finditer(
        r"<(\w+) type_id=\"opencv-matrix\">\s*<rows>(\d+)</rows>\s*<cols>(\d+)"
        r"</cols>\s*<dt>(\w+)</dt>\s*<data>([^<]+)</data>",
        text,
        re.S,
    ):
        name, rows, cols, dt, data = m.groups()
        vals = np.asarray([float(v) for v in data.split()])
        mats[name] = vals.reshape(int(rows), int(cols))
    if not mats:
        raise ValueError(f"no opencv-matrix nodes in {path}")
    return mats
