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


def _flood_scan_kernel(iters: int, scan_rounds: int, label_bits: int,
                       fg_ref, out_ref):
    """The WHOLE `_connected_components` schedule in one VMEM-resident
    program: opening stencil block, then `scan_rounds` alternations of
    segmented row/column min-scans + stencil blocks.

    The segmented scans are the detector's cost center in XLA — each
    `lax.cummax`/`cumsum` is its own log-depth multi-pass HBM kernel,
    measured at ~0.8 ms per scan ROUND at 540x960 (vs ~0.01 ms for a
    whole stencil block in VMEM). Here every scan runs as log2(n)
    masked-roll passes over the VMEM-resident label image: same
    monotonic-key segmented-cummax trick as the XLA path
    (ops/detect._connected_components), bit-identical results, HBM
    touched exactly twice (read fg, write labels).
    """
    h, w = fg_ref.shape
    big = jnp.int32(h * w)
    maxl = jnp.int32((1 << label_bits) - 1)
    # VMEM discipline (the scoped budget is 16 MB and a naive form of
    # this kernel peaked at 21.6 MB at 540x960): the foreground mask is
    # re-read from the input block ref at each use instead of pinned
    # in registers, and every positional mask comes from broadcastable
    # (h, 1)/(1, w) iotas — a persistent (h, w) int32 iota pair alone
    # costs 4 MB.
    row1 = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
    col1 = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)

    def fg():
        # widen BEFORE comparing: an i1 mask born in the int8 (32, 128)
        # tiling cannot relayout to the (8, 128) tiling the int32
        # selects need (Mosaic "invalid relayout"); the i32 widen
        # retiles, and the temporary dies at the select that uses it
        return fg_ref[:].astype(jnp.int32) != 0

    labels = jnp.where(fg(), row1 * w + col1, big)

    def stencil(labels, rounds):
        def body(_, labels):
            down = pltpu.roll(labels, 1, 0)
            up = pltpu.roll(labels, h - 1, 0)
            v = jnp.minimum(labels, jnp.minimum(up, down))
            rgt = pltpu.roll(v, 1, 1)
            lft = pltpu.roll(v, w - 1, 1)
            m = jnp.minimum(v, jnp.minimum(lft, rgt))
            return jnp.where(fg(), m, big)

        return jax.lax.fori_loop(0, rounds, body, labels)

    def cum(x, axis, op, reverse):
        """Inclusive cumsum/cummax by log-doubling masked rolls.
        Identity is 0 (all operands are nonnegative). STATIC unrolled
        shifts: a tpu.dynamic_rotate needs lane-aligned (padded)
        shapes and lowers to a whole rotation network per step, ~7x
        the cost of a known-amount roll; the unrolled chain's larger
        stack accounting is covered by the kernel's raised VMEM cap."""
        n = h if axis == 0 else w
        pos = row1 if axis == 0 else col1
        d = 1
        while d < n:
            if not reverse:
                sh = pltpu.roll(x, d, axis)           # sh[i] = x[i-d]
                x = op(x, jnp.where(pos >= d, sh, 0))
            else:
                sh = pltpu.roll(x, n - d, axis)       # sh[i] = x[i+d]
                x = op(x, jnp.where(pos < n - d, sh, 0))
            d *= 2
        return x

    # The run ids (cumsum of background resets per axis/direction)
    # depend only on the STATIC foreground — hoist the 4 run planes
    # out of the rounds. Each round then runs 4 key-cummax chains
    # instead of 8 cum chains: ~37% of the scan work, which is the
    # kernel's cost center (XLA's CSE does the same dedup on the HLO
    # path for free; Mosaic does not). +4 resident int32 planes,
    # covered by the raised VMEM cap.
    runs = {}
    for axis in (0, 1):
        for reverse in (False, True):
            runs[(axis, reverse)] = cum(
                jnp.where(fg(), 0, 1), axis, jnp.add, reverse)

    def seg_scan_dir(labels, axis, reverse):
        """One direction of the segmented min-scan. Directions run
        SEQUENTIALLY (matching ops/detect's XLA path): the backward
        scan consumes forward-updated labels — per-round reach is
        strictly >= the parallel form, and only one key plane is ever
        live, which is what fits the 16 MB scoped-VMEM budget."""
        inv = jnp.where(fg(), maxl - labels, 0)
        key = cum((runs[(axis, reverse)] << label_bits) | inv, axis,
                  jnp.maximum, reverse)
        return jnp.where(fg(), maxl - (key & maxl), big)

    def seg_scan(labels, axis):
        return seg_scan_dir(seg_scan_dir(labels, axis, False),
                            axis, True)

    per = max(1, iters // (scan_rounds + 1)) if scan_rounds else iters
    labels = stencil(labels, per)
    for _ in range(scan_rounds):
        labels = seg_scan(labels, 1)
        labels = seg_scan(labels, 0)
        labels = stencil(labels, per)
    out_ref[:] = labels


@functools.cache
def _vmem_allows_scan_kernel() -> bool:
    """Does this backend's physical VMEM cover the fused kernel's
    raised 48 MB cap? v4/v5/v6 cores carry 128 MB; v2/v3-class carry
    16 MB, where requesting vmem_limit_bytes=48MB fails to compile —
    those parts (and unknown TPU kinds) fall back to `flood_labels` +
    XLA scans, which stay inside the default scoped budget. Non-TPU
    backends (interpret mode) have no VMEM to exhaust."""
    if jax.default_backend() != "tpu":
        return True
    kind = jax.devices()[0].device_kind.lower()  # e.g. "tpu v5 lite0"
    gen = next((int(tok[1:2]) for tok in kind.split()
                if tok.startswith("v") and tok[1:2].isdigit()), None)
    return gen is None or gen >= 4


def flood_scan_fits(h: int, w: int,
                    max_px: int = 650_000) -> bool:
    """Can `flood_scan_labels` run (h, w)? Three constraints: the frame
    must fit the kernel's VMEM working set (~8 label planes under the
    raised per-kernel cap), the device's physical VMEM must cover that
    cap (v3-class 16 MB parts fall back — see
    `_vmem_allows_scan_kernel`), and the monotonic segmented-scan key
    (run id << label bits | label) must fit int32."""
    label_bits = max(1, int(h * w).bit_length())
    run_bits = max(h, w).bit_length()
    return (h * w <= max_px and label_bits + run_bits <= 31
            and _vmem_allows_scan_kernel())


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def flood_scan_labels(fg: jnp.ndarray, iters: int, scan_rounds: int,
                      interpret: bool = False) -> jnp.ndarray:
    """Full stencil+segmented-scan component labeling of a (h, w) bool
    mask, VMEM-resident — bit-identical drop-in for
    `ops.detect._connected_components`'s XLA path when
    `flood_scan_fits` (the caller checks). The outermost 1-px ring
    must already be background (the caller clears it), which is what
    lets every roll wrap land on background — including the wraps into
    the alignment padding, which is all-background too.
    """
    h, w = fg.shape
    label_bits = max(1, int(h * w).bit_length())
    # pipelined whole-frame blocks on a trivial (1,) grid: operands
    # stay in HBM and each program copies ONE frame block into VMEM.
    # Under vmap (the batched detector) batching extends the GRID,
    # keeping per-program VMEM at one frame — a memory_space=VMEM spec
    # would instead force the whole batched operand resident (19.5 MB
    # for 8 frames at 540x960: scoped OOM)
    spec = pl.BlockSpec((h, w), lambda i: (0, 0))
    return pl.pallas_call(
        functools.partial(_flood_scan_kernel, iters, scan_rounds,
                          label_bits),
        grid=(1,),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        in_specs=[spec],
        out_specs=spec,
        interpret=interpret,
        # the unrolled scan chains peak at ~10 live label planes in
        # Mosaic's stack accounting (~22 MB at the 540x960 fine pass)
        # — over the conservative 16 MB default scoped limit, far
        # under the 128 MB physical VMEM of v4/v5 generations; raise
        # the cap for this kernel only (v3-class cores with 16 MB
        # physical VMEM would need DetectorConfig(pallas=False))
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        # int8 mask input: 4x less HBM traffic + block footprint for
        # the plane that stays live the whole kernel
    )(fg.astype(jnp.int8))
