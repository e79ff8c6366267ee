"""TUM-format trajectory writing/reading.

The reference's writer (reference outputs/trajectory_writer.py:29-40)
claims TUM order in a comment but writes the state quaternion as-is —
scalar-first — under a scalar-last header; its checked-in
outputs/trajectory.txt line 1 shows the identity as ``1.0 0.0 0.0 0.0``.
We write true TUM (``timestamp x y z qx qy qz qw``) by default and keep
the reference's scalar-first layout behind ``scalar_first=True`` for
byte-compatible comparisons against its outputs.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


class TrajectoryWriter:
    """Context manager writing one pose line per frame."""

    def __init__(self, filename: str | Path,
                 scalar_first: bool = False) -> None:
        self.filename = Path(filename)
        self.scalar_first = scalar_first
        self.file = None

    def __enter__(self) -> "TrajectoryWriter":
        self.filename.parent.mkdir(parents=True, exist_ok=True)
        self.file = self.filename.open("w", encoding="utf-8")
        self.file.write("# timestamp x y z qx qy qz qw\n"
                        if not self.scalar_first else
                        "# timestamp x y z qw qx qy qz\n")
        return self

    def write(self, timestamp_s: float, pose: np.ndarray) -> None:
        """pose: (7+,) = [x y z qw qx qy qz ...] (state layout)."""
        pose = np.asarray(pose, dtype=np.float64)
        t = pose[:3]
        q_wxyz = pose[3:7]
        q = q_wxyz if self.scalar_first else np.roll(q_wxyz, -1)
        vals = " ".join(f"{v:.6f}" for v in (*t, *q))
        self.file.write(f"{timestamp_s:.4f} {vals}\n")

    def __exit__(self, *exc) -> None:
        if self.file is not None:
            self.file.close()
            self.file = None


def write_trajectory(filename, times_s, poses, scalar_first=False) -> None:
    """Batch write: times (T,), poses (T, 7) = [xyz, quat wxyz]."""
    with TrajectoryWriter(filename, scalar_first) as w:
        for t, p in zip(np.asarray(times_s), np.asarray(poses)):
            w.write(float(t), p)


def read_trajectory(filename) -> tuple[np.ndarray, np.ndarray]:
    """Read a TUM file -> (times (T,), poses (T, 7) [xyz, quat wxyz])."""
    rows = []
    for line in Path(filename).read_text(encoding="utf-8").splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        rows.append([float(v) for v in line.split()])
    arr = np.asarray(rows)
    times = arr[:, 0]
    xyz = arr[:, 1:4]
    q_xyzw = arr[:, 4:8]
    q_wxyz = np.roll(q_xyzw, 1, axis=-1)
    return times, np.concatenate([xyz, q_wxyz], axis=-1)
