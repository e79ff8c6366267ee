"""Host-side MP4 export with backend fallback.

The reference writes viewer videos with cv2.VideoWriter (reference
viewers/viewer_2d.py:46-56, viewers/viewer_3d.py:195-198). We prefer
the same (it needs no extra wheels), falling back to imageio/pyav
where OpenCV is absent.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def write_video(path, frames: list[np.ndarray] | np.ndarray,
                fps: int = 20) -> None:
    """frames: iterable of (H, W, 3) RGB uint8, all the same size."""
    frames = np.stack(list(frames))
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    try:
        import cv2
        h, w = frames.shape[1:3]
        vw = cv2.VideoWriter(str(path),
                             cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (w, h))
        if not vw.isOpened():
            raise OSError("cv2.VideoWriter failed to open")
        for f in frames:
            vw.write(f[..., ::-1])  # RGB -> BGR
        vw.release()
        return
    except ImportError:
        pass
    except Exception as e:  # present-but-broken cv2 (no mp4v encoder)
        print(f"cv2 VideoWriter failed ({e}); trying imageio/pyav")
    import imageio.v3 as iio
    iio.imwrite(str(path), frames, fps=fps, plugin="pyav",
                codec="libx264")
