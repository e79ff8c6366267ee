"""Landmark-map persistence in the reference's text format.

Format (reference filters/base_filter.py:227-247): a 4-line header,
then per landmark a 4-line record:

    <id>
    x, y, z[, ...]
    u1, u2, u3[, ...]
    <blank>

The reference's loader is dead code with an attribute bug
(``self.filter.add_marker`` on BaseFilter, reference
filters/base_filter.py:272, and LOAD_MAP hardcoded False in both
drivers) — here load is a first-class, tested path.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

_HEADER = "# landmark_id\n# x y z\n# uncertainty\n\n"


def save_map(filename, ids, positions, uncertainties) -> None:
    """Write landmark records.

    ids: (M,) ints; positions: (M, D); uncertainties: (M, D) (diagonal
    variances, matching the reference's covariance-diagonal export,
    reference extended_kalman_filter.py:91-93).
    """
    path = Path(filename)
    path.parent.mkdir(parents=True, exist_ok=True)
    ids = np.asarray(ids)
    positions = np.asarray(positions, np.float64)
    uncertainties = np.asarray(uncertainties, np.float64)
    with path.open("w", encoding="utf-8") as f:
        f.write(_HEADER)
        for i, pos, unc in zip(ids, positions, uncertainties):
            f.write(f"{int(i)}\n")
            f.write(", ".join(str(v) for v in pos) + "\n")
            f.write(", ".join(str(v) for v in unc[: len(pos)]) + "\n")
            f.write("\n")


def load_map(filename):
    """Read landmark records -> (ids (M,), positions (M, D),
    uncertainties (M, D))."""
    lines = Path(filename).read_text(encoding="utf-8").splitlines()
    lines = lines[4:]  # header
    ids, poss, uncs = [], [], []
    for i in range(0, len(lines) - 2, 4):
        ids.append(int(lines[i].strip()))
        poss.append([float(v) for v in lines[i + 1].split(",")])
        uncs.append([float(v) for v in lines[i + 2].split(",")])
    return (np.asarray(ids, np.int32), np.asarray(poss),
            np.asarray(uncs))
