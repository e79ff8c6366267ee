#!/usr/bin/env bash
# Stack the 2D overlay and 3D map export videos and convert to a
# half-size 15 fps GIF (capability of reference
# outputs/images/create_output_gif.sh:1-4).
set -euo pipefail
out_dir="${1:-outputs}"
ffmpeg -y -i "$out_dir/view3d.mp4" -i "$out_dir/view2d.mp4" \
    -filter_complex vstack=inputs=2 "$out_dir/stacked.mp4"
ffmpeg -y -i "$out_dir/stacked.mp4" \
    -vf "fps=15,scale=iw/2:ih/2:flags=lanczos" "$out_dir/output.gif"
