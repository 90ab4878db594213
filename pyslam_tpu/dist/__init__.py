"""Multi-chip / multi-host distribution layer (SURVEY.md §2.3).

The reference is single-process (SURVEY.md: 'DP/TP/PP/SP/EP: absent'); this
layer provides the factor-graph analogues as first-class components:

  * ``mesh``            — device meshes + multi-host bootstrap
  * ``factor_parallel`` — factors sharded across chips, psum-reduced normal
                          equations (DP analogue)
  * ``partitioner``     — variable-block graph partitioning (TP analogue)
  * ``pose_sharded``    — variable-sharded pose-graph solver consuming the
                          partitioner (TP analogue, separator all_gather)
  * ``schur_reduce``    — landmark-sharded Schur reduction (SP/ring analogue)
"""

from .factor_parallel import (
    make_sharded_lm_step,
    pad_batch,
    shard_graph,
    solve_factor_parallel,
)
from .mesh import make_mesh, init_distributed
from .partitioner import Partition, cut_stats, partition_landmarks, partition_poses_bfs
from .pose_sharded import shard_pose_graph, solve_pose_sharded
from .schur_cm import solve_schur_cm
from .schur_reduce import (shard_ba, sharded_landmark_marginals,
                           sharded_pose_marginals, solve_schur_sharded)

__all__ = [
    "make_mesh",
    "init_distributed",
    "make_sharded_lm_step",
    "pad_batch",
    "shard_graph",
    "solve_factor_parallel",
    "Partition",
    "cut_stats",
    "partition_landmarks",
    "partition_poses_bfs",
    "shard_ba",
    "solve_schur_sharded",
    "sharded_pose_marginals",
    "sharded_landmark_marginals",
    "solve_schur_cm",
    "shard_pose_graph",
    "solve_pose_sharded",
]
