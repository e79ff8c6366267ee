"""Distributed Schur-complement bundle adjustment.

SPMD decomposition (the north star's "partition keyframes and
landmark/map blocks ... all-reduce/reduce-scatter over ICI"):

* The O(F) work — residuals, Jacobian blocks, and their products — is
  **sharded over the measurement factors** along the mesh axis: each
  device linearizes only its factor shard and produces partial sums of
  the normal-equation terms (`MeasTerms`, a pure sum over factors).
* Partials are combined with one `psum` over ICI.
* The reduced camera system (6·T × 6·T after eliminating landmarks) is
  small by construction — the whole point of the Schur complement — so
  it is solved replicated on every device; no gather/broadcast round
  trip is needed because the psum already left identical copies
  everywhere.

The factor arrays are padded to a multiple of the mesh size; padded
entries are invalid and contribute zero, so the sharded result is
bit-identical (up to float reduction order) to the single-device path
— asserted in tests/test_parallel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from aruco_slam_tpu.graph import ba
from aruco_slam_tpu.graph.ba import GraphConfig, GraphState, MeasTerms


def _pad_factors(cfg: GraphConfig, state: GraphState, n: int
                 ) -> tuple[GraphConfig, GraphState]:
    """Pad factor capacity to a multiple of the mesh size."""
    f = cfg.max_factors
    pad = (-f) % n
    if pad == 0:
        return cfg, state
    cfg2 = cfg._replace(max_factors=f + pad)
    return cfg2, state._replace(
        f_pose=jnp.pad(state.f_pose, (0, pad)),
        f_lm=jnp.pad(state.f_lm, (0, pad)),
        f_tcl=jnp.pad(state.f_tcl, ((0, pad), (0, 0))),
        f_sig=jnp.pad(state.f_sig, ((0, pad), (0, 0)),
                      constant_values=1.0),
        f_valid=jnp.pad(state.f_valid, (0, pad)),
    )


def _sharded_meas_terms(cfg: GraphConfig, mesh: Mesh, axis: str):
    """shard_map'd measurement linearization + psum reduction."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(
            GraphState(
                pose_q=P(), pose_t=P(), lm=P(), lm_active=P(),
                num_poses=P(), f_pose=P(axis), f_lm=P(axis),
                f_tcl=P(axis), f_sig=P(axis), f_valid=P(axis),
                f_count=P(), prior_lm_h=P(), prior_lm_mean=P()),
            P(),
        ),
        out_specs=MeasTerms(diag=P(), w4=P(), h_ll=P(), g_p=P(),
                            g_l=P(), cost=P()),
    )
    def fn(state_shard: GraphState, pose_free):
        local = ba._meas_terms(cfg, state_shard, pose_free)
        return jax.tree.map(
            lambda x: jax.lax.psum(x, axis), local)

    return fn


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _sharded_optimize(cfg: GraphConfig, state: GraphState, mesh: Mesh,
                      axis: str, iters: int, free_from):
    # full f32 matmul precision, same reasoning as graph.ba._optimize
    with jax.default_matmul_precision("highest"):
        return _sharded_optimize_impl(cfg, state, mesh, axis, iters,
                                      free_from)


def _sharded_optimize_impl(cfg, state, mesh, axis, iters, free_from):
    n = mesh.shape[axis]
    # local cfg seen inside shard_map: factor capacity per device
    local_cfg = cfg._replace(max_factors=cfg.max_factors // n)
    meas_fn = _sharded_meas_terms(local_cfg, mesh, axis)

    def step(carry, _):
        st, lam, cost = carry
        pose_free = ba.pose_free_mask(cfg, st, free_from)
        meas = meas_fn(st, pose_free)
        h_pp, w, h_ll, g_p, g_l, _ = ba._linearize(
            cfg, st, free_from, meas=meas)
        dp, dl = ba._schur_solve(cfg, h_pp, w, h_ll, g_p, g_l, lam)
        trial = ba._retract(st, dp, dl, free_from)
        new_cost = ba._cost_only(cfg, trial)
        accept = new_cost < cost
        st = jax.tree.map(lambda a, b: jnp.where(accept, a, b), trial, st)
        lam = jnp.where(accept, lam / cfg.lm_factor, lam * cfg.lm_factor)
        lam = jnp.clip(lam, 1e-9, 1e6)
        cost = jnp.where(accept, new_cost, cost)
        return (st, lam, cost), cost

    cost0 = ba._cost_only(cfg, state)
    lam0 = jnp.asarray(cfg.lm_init_lambda, cfg.dtype)
    (state, _, cost), _ = jax.lax.scan(
        step, (state, lam0, cost0), None, length=iters)
    return state, cost


def sharded_batch_optimize(cfg: GraphConfig, state: GraphState,
                           mesh: Mesh, iters: int = 50,
                           axis: str | None = None
                           ) -> tuple[GraphState, jnp.ndarray]:
    """Full-batch LM with factor linearization sharded over `mesh`.

    Drop-in distributed counterpart of `graph.batch_optimize`.
    """
    axis = axis or mesh.axis_names[0]
    n = mesh.shape[axis]
    cfg, state = _pad_factors(cfg, state, n)
    # place the factor arrays sharded, everything else replicated
    sharding = GraphState(
        pose_q=P(), pose_t=P(), lm=P(), lm_active=P(), num_poses=P(),
        f_pose=P(axis), f_lm=P(axis), f_tcl=P(axis), f_sig=P(axis),
        f_valid=P(axis), f_count=P(),
        prior_lm_h=P(), prior_lm_mean=P())
    state = jax.device_put(
        state, jax.tree.map(lambda s: NamedSharding(mesh, s), sharding,
                            is_leaf=lambda x: isinstance(x, P)))
    return _sharded_optimize(cfg, state, mesh, axis, iters,
                             jnp.asarray(1, jnp.int32))
