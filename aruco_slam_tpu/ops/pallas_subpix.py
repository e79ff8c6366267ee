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


def _kernel(schedule: tuple, q: int, gx_ref, gy_ref, proj_ref, c0_ref,
            out_ref):
    """gx/gy/proj_ref: (L, QQ) f32, flattened (q, q) patch interiors
    zero-padded on the lane dim; c0_ref/out_ref: (L, 2) f32 offsets
    relative to the patch center. `schedule` = ((half, iters, sigma2,
    drift), ...) — drift precomputed by the caller exactly like the
    XLA path."""
    l, qq = gx_ref.shape
    gx = gx_ref[:]
    gy = gy_ref[:]
    proj = proj_ref[:]
    j = jax.lax.broadcasted_iota(jnp.int32, (1, qq), 1)
    px = (j % q).astype(jnp.float32) - (q - 1) / 2.0
    py = (j // q).astype(jnp.float32) - (q - 1) / 2.0

    cx = c0_ref[:, 0:1]
    cy = c0_ref[:, 1:2]

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
    out_ref[:, 0:1] = cx
    out_ref[:, 1:2] = cy


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
