"""Multi-chip parallelism: device meshes, sharded Schur BA,
multi-sequence SLAM.

The reference has zero parallelism of any kind (SURVEY.md §2:
single-process, single-threaded, no threads/MPI/NCCL). This layer is
designed from scratch for TPU SPMD: `jax.sharding.Mesh` +
`shard_map`, with XLA collectives (psum) riding ICI.

* `sharded_ba` — distributed bundle adjustment: measurement-factor
  linearization sharded over the mesh, partial normal-equation terms
  reduced with psum, the small reduced camera system solved replicated
  (the Schur-complement partitioning of BASELINE.json's north star).
* `multi_slam` — batched parallel SLAM over many sequences (data
  parallel over a mesh axis): BASELINE.json config 5.
"""

from aruco_slam_tpu.parallel.mesh import make_mesh
from aruco_slam_tpu.parallel.sharded_ba import sharded_batch_optimize
from aruco_slam_tpu.parallel.multi_slam import batched_mekf_scan

__all__ = ["make_mesh", "sharded_batch_optimize", "batched_mekf_scan"]
