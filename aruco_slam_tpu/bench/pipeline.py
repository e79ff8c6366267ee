"""Shared corners -> PnP -> fused-MEKF pipeline for the benches.

One definition of the hot path both `bench.py` (repo root) and
`bench/large_map.py` measure, so gating/chunking fixes cannot diverge
between them.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from aruco_slam_tpu.filters import FrameObservations, mekf_scan
from aruco_slam_tpu.ops import pnp


def time_on_device(pipe_fn, state, corners, mask, reps: int) -> float:
    """Seconds per pipeline call, measured with the repetitions ON
    DEVICE in one dispatch — the tunneled executor's per-call RTT
    dominates sub-200ms programs otherwise (the single-stream pipeline
    measured 3.7x slower with Python-side dispatch timing). Each rep's
    input depends on the loop carry so XLA cannot hoist the work."""

    @jax.jit
    def timed(c, m, s):
        def body(_, acc):
            _, tr = pipe_fn(s, c + acc * 1e-20, m)
            return acc + tr.sum()
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    # Two more tunnel-executor hazards beyond the on-device rep loop:
    # (1) identical (executable, args) calls are MEMOIZED — the warm
    # call must use a DIFFERENT input value than the timed call;
    # (2) block_until_ready can return before remote execution
    # finishes — only fetching the (scalar) value synchronizes, so
    # time `float(...)`, never block_until_ready.
    float(timed(corners + 1e-6, mask, state))  # compile+warm
    t0 = time.perf_counter()
    float(timed(corners, mask, state))
    return (time.perf_counter() - t0) / reps


# bf16 dense peak per JAX device (MXU). f32 ("highest" precision)
# matmuls run at ~1/2 to 1/3 of this depending on generation; MFU here
# is reported against the bf16 peak so it is a conservative bound.
_PEAK_BF16 = {
    "TPU v2": 22.5e12,       # per core (jax device = core on v2/v3)
    "TPU v3": 61.25e12,
    "TPU v4": 137.5e12,      # per jax device (megacore chip = 275/2)
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 229.5e12,     # per core
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def chip_peak_flops() -> float | None:
    import jax
    kind = jax.devices()[0].device_kind
    for k, v in _PEAK_BF16.items():
        if kind.lower().startswith(k.lower()):
            return v
    return None


def flops_of(fn, *args) -> float | None:
    """Static FLOP count of one jitted call, from XLA's compiled cost
    analysis — makes every bench's 'fast' auditable as achieved
    FLOP/s vs chip peak."""
    import jax
    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, list):   # some backends: one dict/device
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def flops_metrics(flops: float | None, seconds: float) -> dict:
    """{gflops_per_s, mfu_pct} fields for a bench JSON row."""
    if not flops or seconds <= 0:
        return {}
    out = {"gflops_per_s": round(flops / seconds / 1e9, 2)}
    peak = chip_peak_flops()
    if peak:
        out["mfu_pct"] = round(100.0 * flops / seconds / peak, 3)
    return out


def make_pipeline(cam, marker_size: float, fcfg, chunk: int = 16,
                  reproj_gate: float = 3.0):
    """Returns pipeline(state, corners_seq (T,C,4,2), mask_seq (T,C))
    -> (final_state, trajectory (T,7)).

    The PnP solves are frame-independent so they run outside the
    sequential scan and fill the chip; `lax.map` chunks them over time
    so the solver intermediates stay bounded (vmapping a whole long
    sequence wants tens of GB at serving batch sizes). Frame counts
    that don't divide by `chunk` are zero-padded up to the next
    multiple (padded solves are discarded) — never serialized, so a
    prime T costs at most one extra chunk, not a 16x slowdown.
    """

    def pipeline(state, corners_seq, mask_seq):
        t = corners_seq.shape[0]
        ch = min(chunk, t)
        pad = (-t) % ch
        if pad:
            corners_seq = jnp.concatenate(
                [corners_seq,
                 jnp.zeros((pad,) + corners_seq.shape[1:],
                           corners_seq.dtype)])
        tp = t + pad

        def solve_chunk(c):
            res = pnp.solve_square_pnp(cam, c, marker_size)
            return res.t_cl, res.q_cl, res.err

        t_cl, q_cl, err = jax.lax.map(
            solve_chunk,
            corners_seq.reshape(tp // ch, ch, *corners_seq.shape[1:]))
        merge = lambda a: a.reshape(tp, *a.shape[2:])[:t]
        obs = FrameObservations(
            t_cl=merge(t_cl), q_cl=merge(q_cl),
            mask=mask_seq & (merge(err) < reproj_gate))
        return mekf_scan(fcfg, state, obs)

    return pipeline
