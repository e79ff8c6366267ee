"""Pallas TPU kernel for the connected-component min-label flood.

The detection pipeline's component labeling (ops/detect.py
`_connected_components`, replacing the contour tracing inside OpenCV's
detector, reference filters/base_filter.py:194) runs tens of rounds of
a 3x3 min stencil over the low-res binary image. This kernel performs
ALL rounds in one pallas_call with the label image resident in VMEM.

Kernel-shape notes (measured on TPU v5e):
- A naive 9-slice stencil with unaligned lane offsets compiles but
  runs ~100x slower than XLA's fused pad+stack loop — Mosaic emits a
  full lane-rotation network per unaligned slice.
- The stencil is therefore decomposed as a separable 3x3 box min
  (vertical min of 3, then horizontal min of 3 — identical to the
  8-neighbor+self min) with `pltpu.roll` for the shifts and
  precomputed edge masks replacing the BIG border padding.
- The pointer-jumping rounds (label = label[label]) stay outside the
  kernel: a data-dependent gather over a ~130k-entry table is exactly
  what Mosaic is slow at, and there are only a handful of jump rounds.

Measured (TPU v5e, 1080p, downscale 4, 48 rounds): stage-isolated the
kernel runs 0.11 ms vs 6.5 ms for the jitted XLA stencil loop (~59x);
fused into the full batched detector both variants are transfer-bound
at ~0.095 ms/frame (~10.5k fps/chip), i.e. at parity in the batched
regime because XLA keeps the in-context loop fused. Auto-enabled on
TPU; `DetectorConfig(pallas=False)` opts out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flood_kernel(iters: int, fg_ref, out_ref):
    """One program: `iters` rounds of 8-connected min propagation.

    fg_ref:  (h, w) int32, nonzero = foreground with an EMPTY 1-px
             border (the caller clears it — _connected_components)
    out_ref: (h, w) int32 labels; background = h*w

    The empty border is what keeps this kernel inside the 16 MB scoped
    VMEM budget at fine labeling resolutions: every pltpu.roll wrap
    lands on a background row/column whose output is BIG regardless,
    so no per-edge iota masks need to live across the loop. (The
    masked form held fg + labels + 2 iotas + 4 edge masks resident —
    ~17 MB at 540x960 — and Mosaic refused to compile it.)
    """
    h, w = fg_ref.shape
    big = jnp.int32(h * w)
    fg = fg_ref[:] != 0
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    labels = jnp.where(fg, row * w + col, big)

    def body(_, labels):
        # pltpu.roll only takes non-negative shifts; h-1 == -1 (mod h)
        down = pltpu.roll(labels, 1, 0)
        up = pltpu.roll(labels, h - 1, 0)
        v = jnp.minimum(labels, jnp.minimum(up, down))
        rgt = pltpu.roll(v, 1, 1)
        lft = pltpu.roll(v, w - 1, 1)
        m = jnp.minimum(v, jnp.minimum(lft, rgt))
        return jnp.where(fg, m, big)

    out_ref[:] = jax.lax.fori_loop(0, iters, body, labels)


@functools.partial(jax.jit, static_argnums=(1, 2))
def flood_labels(fg: jnp.ndarray, iters: int,
                 interpret: bool = False) -> jnp.ndarray:
    """min-label flood of a (h, w) bool mask; VMEM-resident on TPU."""
    h, w = fg.shape
    return pl.pallas_call(
        functools.partial(_flood_kernel, iters),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(fg.astype(jnp.int32))
