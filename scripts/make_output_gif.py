"""Stack the 3D map render over the 2D overlay and write a GIF.

Pure-Python (imageio/Pillow) equivalent of make_output_gif.sh for
hosts without ffmpeg — same capability as the reference's
outputs/images/create_output_gif.sh (vstack + half-size + reduced fps).

    python scripts/make_output_gif.py --viz-dir outputs/images \
        --out outputs/output.gif [--every 3] [--scale 2]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--viz-dir", default="outputs/images",
                   help="directory with 2d/frame_*.png + 3d/map_*.png")
    p.add_argument("--out", default="outputs/output.gif")
    p.add_argument("--every", type=int, default=3,
                   help="keep every Nth frame")
    p.add_argument("--scale", type=int, default=2,
                   help="downscale factor")
    p.add_argument("--fps", type=float, default=10.0)
    args = p.parse_args(argv)
    import imageio.v3 as iio

    viz = Path(args.viz_dir)
    # pair by the frame index in the filename (both exporters write
    # *_NNNN.png) — the 3D sink may start later or skip frames, and a
    # positional zip would silently pair different timestamps
    index = lambda p: int(p.stem.rsplit("_", 1)[-1])
    f2d = {index(p): p for p in (viz / "2d").glob("frame_*.png")}
    f3d = {index(p): p for p in (viz / "3d").glob("map_*.png")}
    common = sorted(f2d.keys() & f3d.keys())[::args.every]
    assert common, f"no paired frames under {viz}/2d and {viz}/3d"

    s = args.scale
    raw = []
    for i in common:
        pair = []
        for path in (f3d[i], f2d[i]):
            im = iio.imread(path)
            if im.ndim == 2:
                im = np.stack([im] * 3, -1)
            pair.append(im[::s, ::s, :3])
        raw.append(pair)
    # pad every panel to the GLOBAL max size (per-frame sizes can vary
    # e.g. when a live window was resized), centered on white
    wmax = max(im.shape[1] for pair in raw for im in pair)
    hmax = [max(p[j].shape[0] for p in raw) for j in range(2)]

    def pad(im, hm):
        left = (wmax - im.shape[1]) // 2
        return np.pad(im, ((0, hm - im.shape[0]),
                           (left, wmax - im.shape[1] - left), (0, 0)),
                      constant_values=255)

    frames = [np.concatenate([pad(top, hmax[0]), pad(bot, hmax[1])],
                             axis=0) for top, bot in raw]

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    iio.imwrite(out, np.stack(frames), duration=1000.0 / args.fps,
                loop=0)
    print(f"wrote {out}: {len(common)} frames {frames[0].shape[1]}x"
          f"{frames[0].shape[0]}")


if __name__ == "__main__":
    main()
