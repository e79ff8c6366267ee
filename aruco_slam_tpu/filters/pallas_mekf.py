"""Fused Pallas TPU kernel for the MEKF measurement update.

The per-frame MEKF update (filters/mekf.py `mekf_step`, the TPU
redesign of reference filters/extended_kalman_filter.py:107-156) is a
chain of ~10 dense ops on small matrices (N = 6 + 3C ≈ 200): build H,
PHᵀ, S = HPHᵀ+R, factor, gain, innovation, Joseph covariance. Under
`lax.scan` each op is its own XLA kernel with HBM round-trips and
launch overhead every frame; the matrices are far too small to hide
it. This kernel fuses the whole chain into ONE pallas_call per frame
with every intermediate resident in VMEM (~1 MB total).

The innovation solve replaces the serial Cholesky with Newton–Schulz
iteration for S⁻¹ — pure MXU matmuls instead of a triangular
factorization Mosaic can't pipeline:

    X_0   = Sᵀ / (‖S‖₁ ‖S‖_∞)        (guaranteed convergent start)
    X_k+1 = X_k (2I − S X_k)          (quadratic convergence)

S = HPHᵀ + R is symmetric positive definite with R ≥ r·I keeping the
condition number moderate, so ~20 iterations reach f32 roundoff. The
Joseph form P' = (I−KH)P(I−KH)ᵀ + KRKᵀ is exact covariance
propagation for ANY gain, so a slightly-suboptimal K from an
approximate inverse costs a little optimality, never consistency.

Block-diagonal H assembly, masking, and the small quaternion/Jacobian
work stay in XLA (they fuse well there); only the dense-algebra chain
lives here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _update_kernel(ns_iters: int, cov_ref, h_ref, r_ref, resid_ref,
                   inn_ref, cov_out_ref):
    """One fused MEKF update.

    cov_ref:   (N, N) error covariance P (post-predict)
    h_ref:     (M, N) measurement Jacobian H (masked rows are zero)
    r_ref:     (1, M) measurement noise diagonal (1.0 on masked rows)
    resid_ref: (1, M) measurement residual z − h (masked rows zero)
    inn_ref:   (1, N) out: state innovation K (z − h)
    cov_out_ref: (N, N) out: Joseph-form updated covariance
    """
    f32 = jnp.float32
    cov = cov_ref[:]
    h = h_ref[:]
    r = r_ref[0, :]
    m = h.shape[0]
    n = h.shape[1]

    ph_t = jnp.dot(cov, h.T, preferred_element_type=f32)      # (N, M)
    s = jnp.dot(h, ph_t, preferred_element_type=f32)          # (M, M)
    eye_m = (jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
             ).astype(f32)
    s = s + eye_m * r[None, :]

    # Newton–Schulz inverse (symmetric S: Sᵀ = S)
    # (pl.reciprocal rejects scalar operands in this Mosaic version)
    norm1 = jnp.max(jnp.sum(jnp.abs(s), axis=0))
    x = s / (norm1 * norm1)

    def ns_step(_, x):
        sx = jnp.dot(s, x, preferred_element_type=f32)
        return jnp.dot(x, 2.0 * eye_m - sx, preferred_element_type=f32)

    s_inv = jax.lax.fori_loop(0, ns_iters, ns_step, x)

    gain = jnp.dot(ph_t, s_inv, preferred_element_type=f32)   # (N, M)
    resid = resid_ref[0, :]
    inn_ref[0, :] = jnp.dot(gain, resid[:, None],
                            preferred_element_type=f32)[:, 0]

    eye_n = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
             ).astype(f32)
    i_kh = eye_n - jnp.dot(gain, h, preferred_element_type=f32)
    joseph = jnp.dot(jnp.dot(i_kh, cov, preferred_element_type=f32),
                     i_kh.T, preferred_element_type=f32)
    krk = jnp.dot(gain * r[None, :], gain.T, preferred_element_type=f32)
    new_cov = joseph + krk
    cov_out_ref[:] = 0.5 * (new_cov + new_cov.T)


@functools.partial(jax.jit, static_argnums=(4, 5))
def fused_update(cov: jnp.ndarray, h: jnp.ndarray, r_diag: jnp.ndarray,
                 resid: jnp.ndarray, ns_iters: int = 20,
                 interpret: bool = False):
    """Fused gain/innovation/Joseph update. Returns (innovation (N,),
    new_cov (N, N))."""
    n = cov.shape[0]
    m = h.shape[0]
    inn, new_cov = pl.pallas_call(
        functools.partial(_update_kernel, ns_iters),
        out_shape=(
            jax.ShapeDtypeStruct((1, n), cov.dtype),
            jax.ShapeDtypeStruct((n, n), cov.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(cov, h, r_diag.reshape(1, m), resid.reshape(1, m))
    return inn[0], new_cov
