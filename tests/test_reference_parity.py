"""Pin the reference-vs-ours ATE head-to-head.

`scripts/compare_reference_ate.py` is the one reproducible source of
the headline accuracy claim (README "Estimation quality",
BASELINE_MEASURED.md "Accuracy (ATE) head-to-head"). This slow test
runs it end-to-end — the reference EKF imported read-only from
/root/reference, our MEKF at app-default tuning, identical synthetic
observations — and asserts the documented relationships, so the
numbers in the docs cannot silently drift from what the script
produces.

Documented values (2026-08-19): noiseless 1.850 m vs 0.0027 m
(679x), 1 cm noise 1.835 m vs 0.027 m (69x).
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference checkout not present")
def test_ate_head_to_head_matches_documented():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from compare_reference_ate import run_comparison

    res = run_comparison()
    ref_clean, ours_clean = res["noiseless"]
    ref_noisy, ours_noisy = res["noisy (1 cm)"]

    # the reference EKF as checked out diverges to meter-scale error
    # (its quaternion-order update bug, reference
    # extended_kalman_filter.py:143-149); both docs cite ~1.85 m
    assert 1.0 < ref_clean < 3.0, ref_clean
    assert 1.0 < ref_noisy < 3.0, ref_noisy
    # ours: millimeter-scale noiseless, centimeter-scale at 1 cm noise
    # (documented 0.0027 m / 0.027 m; generous drift margins, but tight
    # enough that a regression past the documented DIGIT fails)
    assert ours_clean < 0.01, ours_clean
    assert ours_noisy < 0.05, ours_noisy
    # the headline ratio claims (>=100x / >=30x documented as 679x/69x)
    assert ref_clean / ours_clean > 100, (ref_clean, ours_clean)
    assert ref_noisy / ours_noisy > 30, (ref_noisy, ours_noisy)
