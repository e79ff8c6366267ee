"""Pallas TPU kernel for the subpixel corner refinement iterations.

`ops/detect._subpix_refine` (cv2.cornerSubPix's structure-tensor
math, reference filters/base_filter.py:84-90's corner refinement
settings) runs a coarse-to-fine schedule of ~10 fixed-point
iterations over gathered (N, P, P) patches. In XLA each iteration is
its own fusion that RE-READS the patch gradients from HBM — measured
0.76 ms/frame at 1080p robust-preset candidate counts (~60 MB of
gradient traffic per frame for ~4 MFLOP of math: pure bandwidth
waste). This kernel keeps the gradients and projection plane resident
in VMEM across the WHOLE schedule; HBM is touched once.

Layout: NATURAL (N, q*q) — corners on sublanes, flattened patch
pixels on lanes. Per-corner state is a (L, 1) column, patch-space
pixel coordinates are lane-wise iota constants (px = j % q, py =
j // q), and the structure-tensor sums are lane reductions. The
first cut of this kernel used a (P, P, N) corner-on-lanes layout:
the math vectorized the same, but feeding it required transposing
the gathered patches' LANE dimension in XLA — measured ~0.45
ms/frame, 4x the kernel itself. The gradients are computed in XLA
(one cheap fused elementwise pass) so the kernel sees only flat
(N, q*q) planes and no transpose exists anywhere.

Math is kept line-for-line identical to the XLA path (same op order)
so the two backends agree to float-reassociation noise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(schedule: tuple, q: int, gx_ref, gy_ref, proj_ref, c0_ref,
            out_ref):
    """gx/gy/proj_ref: (L, QQ) f32, flattened (q, q) patch interiors
    zero-padded on the lane dim; c0_ref/out_ref: (L, 2) f32 offsets
    relative to the patch center. `schedule` = ((half, iters, sigma2,
    drift), ...) — drift precomputed by the caller exactly like the
    XLA path."""
    cx, cy = _iterate(schedule, q, gx_ref[:], gy_ref[:], proj_ref[:],
                      c0_ref[:, 0:1], c0_ref[:, 1:2])
    out_ref[:, 0:1] = cx
    out_ref[:, 1:2] = cy


def _iterate(schedule, q, gx, gy, proj, cx, cy):
    """The refinement fixed-point loop on flat (L, QQ) gradient planes
    — shared verbatim between the patch-fed kernel (`_kernel`) and the
    fused gather kernel (`_gather_kernel`), so the two backends agree
    to reassociation noise."""
    qq = gx.shape[1]
    j = jax.lax.broadcasted_iota(jnp.int32, (1, qq), 1)
    px = (j % q).astype(jnp.float32) - (q - 1) / 2.0
    py = (j // q).astype(jnp.float32) - (q - 1) / 2.0

    for half, iters, sigma2, drift in schedule:
        def body(_, c, half=half, sigma2=sigma2, drift=drift):
            cx, cy = c
            wx = jnp.round(cx)
            wy = jnp.round(cy)
            dx = px - wx                      # (L, QQ)
            dy = py - wy
            inside = ((jnp.abs(dx) <= half)
                      & (jnp.abs(dy) <= half)).astype(jnp.float32)
            wgt = inside * jnp.exp(-0.5 * (dx * dx + dy * dy) / sigma2)
            wgx = wgt * gx
            wgy = wgt * gy
            s = lambda a: jnp.sum(a, axis=1, keepdims=True)  # (L, 1)
            wxx = s(wgx * gx)
            wxy = s(wgx * gy)
            wyy = s(wgy * gy)
            bx = s(wgx * proj)
            by = s(wgy * proj)
            det = wxx * wyy - wxy * wxy
            ok = jnp.abs(det) > 1e-9
            nx = jnp.where(ok, (wyy * bx - wxy * by) / det, cx)
            ny = jnp.where(ok, (wxx * by - wxy * bx) / det, cy)
            nx = jnp.clip(nx, cx - half, cx + half)
            ny = jnp.clip(ny, cy - half, cy + half)
            return (jnp.clip(nx, -drift, drift),
                    jnp.clip(ny, -drift, drift))

        cx, cy = jax.lax.fori_loop(0, iters, body, (cx, cy))
    return cx, cy


def _gather_kernel(schedule: tuple, p: int, n: int,
                   img_ref, ctr_ref, c0_ref, out_ref,
                   slab_ref, flat_ref):
    """Fused gather + gradient + refinement, image VMEM-resident.

    The XLA patch gather (vmap dynamic_slice) reads ~p rows per corner
    from HBM at (8, 128)-tile granularity — ~0.4 ms/frame at robust
    candidate counts, the subpixel stage's real cost (the iteration
    kernel itself is 0.13 ms). Here the frame is copied to VMEM ONCE
    by the pallas pipeline and every patch row is a VMEM read:

      1. per corner: one (p, 2*LANE) slab load at a LANE-ALIGNED
         dynamic offset (tile-aligned: no rotation network), then ONE
         dynamic lane-roll to place the patch at lane 0 — the only
         dynamic-shift op per corner — into slab_ref (N, p, 2*LANE);
      2. flatten: p static block-wide copies (N, p, :p) -> flat
         (N, p*p) natural layout (corners on sublanes, patch pixels
         on lanes — see module docstring for why this layout);
      3. gradients + the whole coarse-to-fine schedule on the flat
         planes, exactly `_iterate`. Gradients use the FULL p-grid
         with zeroed borders (every sum term is a product with
         gx/gy/proj, so zero-gradient border pixels contribute
         nothing — identical math to the interior-only (p-2)-grid).

    img_ref: (h, w) f32; ctr_ref: (n, 2) int32 clipped patch centers
    (x, y) in VMEM — SMEM blocks do not survive the vmap-batched spec
    the batched detector needs; c0_ref/out_ref: (n, 2) f32 offsets
    from the patch center.
    """
    lane = 128
    wide = 2 * lane

    def gather_one(i, _):
        y0 = ctr_ref[i, 1] - (p - 1) // 2
        x0 = ctr_ref[i, 0] - (p - 1) // 2
        xt = pl.multiple_of((x0 // lane) * lane, lane)
        sh = (wide - (x0 - xt)) % wide
        # per-row loads: Mosaic cannot lower a multi-sublane load at a
        # dynamic sublane offset as one vector op, so each patch row
        # is its own (1, wide) lane-tile-aligned load; the single
        # dynamic op per corner is the lane roll placing the patch at
        # lane 0
        for r in range(p):
            slab_ref[pl.ds(i, 1), r] = img_ref[pl.ds(y0 + r, 1),
                                               pl.ds(xt, wide)]
        slab_ref[pl.ds(i, 1)] = pltpu.roll(
            slab_ref[pl.ds(i, 1)], sh, 2)
        return 0

    jax.lax.fori_loop(0, n, gather_one, 0)

    # 2. flatten to (N, p*p) on lanes: p static copies
    for r in range(p):
        flat_ref[:, p * r:p * (r + 1)] = slab_ref[:, r, :p]

    # 3. gradients on the flat layout: lane rolls +-1 (horizontal
    # neighbors) and +-p (vertical), borders zeroed. jnp.where (not a
    # mask multiply): the pad lanes of the flat scratch are
    # uninitialized VMEM — garbage * 0 could be nan
    qq = flat_ref.shape[1]
    flat = flat_ref[:]
    j = jax.lax.broadcasted_iota(jnp.int32, (1, qq), 1)
    c = j % p
    r = j // p
    interior = (c >= 1) & (c <= p - 2) & (r >= 1) & (r <= p - 2) \
        & (j < p * p)
    zero = jnp.zeros_like(flat)
    gx = jnp.where(interior, 0.5 * (pltpu.roll(flat, qq - 1, 1)
                                    - pltpu.roll(flat, 1, 1)), zero)
    gy = jnp.where(interior, 0.5 * (pltpu.roll(flat, qq - p, 1)
                                    - pltpu.roll(flat, p, 1)), zero)
    px = c.astype(jnp.float32) - (p - 1) / 2.0
    py = r.astype(jnp.float32) - (p - 1) / 2.0
    proj = gx * px + gy * py

    cx, cy = _iterate(schedule, p, gx, gy, proj,
                      c0_ref[:, 0:1], c0_ref[:, 1:2])
    out_ref[:, 0:1] = cx
    out_ref[:, 1:2] = cy


@functools.partial(jax.jit, static_argnums=(2, 3))
def refine_corners_fused(image: jnp.ndarray, corners: jnp.ndarray,
                         schedule: tuple,
                         interpret: bool = False) -> jnp.ndarray:
    """Fused VMEM-resident subpixel refinement: (H, W) image (any real
    dtype; converted to f32 for the kernel's row loads) + (N, 2) pixel
    corners -> (N, 2) refined corners. `schedule` = ((half, iters,
    sigma2, drift), ...) static, with rad implied by the caller
    exactly as `_subpix_refine` computes it."""
    h, w = image.shape
    n = corners.shape[0]
    # patch radius, exactly as _subpix_refine computes it
    cum = 0
    rad = 0
    for half, _, _, _ in schedule:
        cum += half
        rad = max(rad, cum + half + 1)
    p = 2 * rad + 1
    # pad: height to the f32 sublane tile; width by one extra lane
    # tile so the right-edge corner's aligned (p, 256) slab load stays
    # inside the block
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128 + 128
    img = jnp.pad(image.astype(jnp.float32),
                  ((0, hp - h), (0, wp - w)))
    cx0 = jnp.clip(jnp.round(corners[:, 0]).astype(jnp.int32),
                   rad, w - rad - 1)
    cy0 = jnp.clip(jnp.round(corners[:, 1]).astype(jnp.int32),
                   rad, h - rad - 1)
    c0 = jnp.stack([corners[:, 0] - cx0, corners[:, 1] - cy0], -1)
    c0 = jnp.clip(c0, -(rad - 1), rad - 1).astype(jnp.float32)

    qq_pad = -(-(p * p) // 128) * 128
    n_pad = (-n) % 8
    if n_pad:
        cx0 = jnp.pad(cx0, (0, n_pad), constant_values=rad)
        cy0 = jnp.pad(cy0, (0, n_pad), constant_values=rad)
        c0 = jnp.pad(c0, ((0, n_pad), (0, 0)))
    nn = n + n_pad
    centers = jnp.stack([cx0, cy0], -1)          # (nn, 2) int32
    out = pl.pallas_call(
        functools.partial(_gather_kernel, schedule, p, nn),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((hp, wp), lambda i: (0, 0)),
            pl.BlockSpec((nn, 2), lambda i: (0, 0)),
            pl.BlockSpec((nn, 2), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((nn, 2), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((nn, 2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nn, p, 256), jnp.float32),
            pltpu.VMEM((nn, qq_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(img, centers, c0)
    ref = out[:n]
    return ref + jnp.stack([cx0[:n], cy0[:n]], -1).astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def refine_offsets(patches: jnp.ndarray, c0: jnp.ndarray,
                   schedule: tuple, block: int = 256,
                   interpret: bool = False) -> jnp.ndarray:
    """Run the refinement schedule on (N, P, P) patches with starting
    offsets c0 (N, 2); returns refined offsets (N, 2). `schedule` =
    ((half, iters, sigma2, drift), ...) static."""
    n, p, _ = patches.shape
    q = p - 2
    patches = patches.astype(jnp.float32)
    # gradients on the patch interior, computed ONCE in XLA (a single
    # fused pass) and handed to the kernel flat — the per-ITERATION
    # re-reads are what the kernel eliminates
    gx = 0.5 * (patches[:, 1:-1, 2:] - patches[:, 1:-1, :-2])
    gy = 0.5 * (patches[:, 2:, 1:-1] - patches[:, :-2, 1:-1])
    px = (jax.lax.broadcasted_iota(jnp.float32, (q, q), 1)
          - (q - 1) / 2.0)[None]
    py = (jax.lax.broadcasted_iota(jnp.float32, (q, q), 0)
          - (q - 1) / 2.0)[None]
    proj = gx * px + gy * py

    qq = q * q
    qq_pad = -(-qq // 128) * 128
    n_pad = (-n) % block

    def flat(a):  # (N, q, q) -> (N+pad, QQpad), zero-padded
        a = a.reshape(n, qq)
        return jnp.pad(a, ((0, n_pad), (0, qq_pad - qq)))

    c0p = jnp.pad(c0.astype(jnp.float32), ((0, n_pad), (0, 0)))
    grid = ((n + n_pad) // block,)
    out = pl.pallas_call(
        functools.partial(_kernel, schedule, q),
        grid=grid,
        in_specs=[pl.BlockSpec((block, qq_pad), lambda i: (i, 0)),
                  pl.BlockSpec((block, qq_pad), lambda i: (i, 0)),
                  pl.BlockSpec((block, qq_pad), lambda i: (i, 0)),
                  pl.BlockSpec((block, 2), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((block, 2), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n + n_pad, 2), jnp.float32),
        interpret=interpret,
    )(flat(gx), flat(gy), flat(proj), c0p)
    return out[:n]
