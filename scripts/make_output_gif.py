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
    f2d = sorted((viz / "2d").glob("frame_*.png"))[::args.every]
    f3d = sorted((viz / "3d").glob("map_*.png"))[::args.every]
    n = min(len(f2d), len(f3d))
    assert n, f"no frames under {viz}/2d and {viz}/3d"

    frames = []
    for a, b in zip(f3d[:n], f2d[:n]):
        top = iio.imread(a)
        bot = iio.imread(b)
        if top.ndim == 2:
            top = np.stack([top] * 3, -1)
        if bot.ndim == 2:
            bot = np.stack([bot] * 3, -1)
        top = top[..., :3]
        bot = bot[..., :3]
        s = args.scale
        top = top[::s, ::s]
        bot = bot[::s, ::s]
        w = max(top.shape[1], bot.shape[1])

        def pad(im):  # center horizontally on white
            left = (w - im.shape[1]) // 2
            return np.pad(im, ((0, 0), (left, w - im.shape[1] - left),
                               (0, 0)), constant_values=255)

        frames.append(np.concatenate([pad(top), pad(bot)], axis=0))

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    iio.imwrite(out, np.stack(frames), duration=1000.0 / args.fps,
                loop=0)
    print(f"wrote {out}: {n} frames {frames[0].shape[1]}x"
          f"{frames[0].shape[0]}")


if __name__ == "__main__":
    main()
