"""Pose-graph initialization: spanning-tree odometry integration.

g2o files in the wild sometimes carry poor (or no) vertex estimates; LM from
a bad basin can converge to the wrong optimum (measured on M3500-class
graphs, docs/PERFORMANCE.md).  This module builds an initial guess by
integrating the relative-pose measurements along a breadth-first spanning
tree of the graph — the standard cheap initializer.

Host-side numpy (runs once at build time).
"""

from __future__ import annotations

from collections import deque

import numpy as np


def spanning_tree_init(
    edges_i, edges_j, T_meas, n_poses: int, root: int = 0, T_root=None
):
    """Initial poses by BFS spanning-tree integration of edge measurements.

    ``T_meas[k]`` is the usual between-factor measurement T_j_i (pose i
    expressed in pose j's frame), matching io.synth / io.g2o conventions:
    along a tree edge i->j, ``T_j = T_meas[k] @ T_i``.

    Returns (N, d+1, d+1) poses; unreachable poses get the root pose.
    """
    edges_i = np.asarray(edges_i)
    edges_j = np.asarray(edges_j)
    T_meas = np.asarray(T_meas)
    dim = T_meas.shape[-1]
    if T_root is None:
        T_root = np.eye(dim)

    # adjacency with edge ids and direction
    adj: list[list] = [[] for _ in range(n_poses)]
    for k, (i, j) in enumerate(zip(edges_i, edges_j)):
        adj[int(i)].append((int(j), k, False))
        adj[int(j)].append((int(i), k, True))

    T = np.tile(np.asarray(T_root, np.float64), (n_poses, 1, 1))
    seen = np.zeros(n_poses, bool)
    seen[root] = True
    q = deque([root])
    T_inv = {}
    while q:
        u = q.popleft()
        for v, k, reverse in adj[u]:
            if seen[v]:
                continue
            seen[v] = True
            if reverse:
                if k not in T_inv:
                    T_inv[k] = np.linalg.inv(T_meas[k])
                T[v] = T_inv[k] @ T[u]
            else:
                T[v] = T_meas[k] @ T[u]
            q.append(v)
    return T


__all__ = ["spanning_tree_init"]
