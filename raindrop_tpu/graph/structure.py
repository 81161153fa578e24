"""Graph containers: static-shape edge lists built host-side.

The reference materializes edges with torch.nonzero over a dense adjacency
(reference code/models_rd.py:307-311). Edge construction is inherently
data-dependent, so it lives on the host (numpy) and produces static-shape
COO arrays that jit-compiled kernels consume. Complete graphs (the shipped
configuration: global_structure = ones, code/Raindrop.py:212) get a
precomputed row-major edge list so edge ordering matches torch.nonzero.
"""

from __future__ import annotations

import numpy as np


def complete_graph_edges(n_nodes: int):
    """All n^2 (src, tgt) pairs in torch.nonzero row-major order.

    Returns (edge_index [2, n^2] int32, edge_weights [n^2] float32).
    edge_index[0] = source, edge_index[1] = target (PyG source_to_target flow).
    """
    src, tgt = np.meshgrid(np.arange(n_nodes), np.arange(n_nodes), indexing="ij")
    edge_index = np.stack([src.reshape(-1), tgt.reshape(-1)]).astype(np.int32)
    return edge_index, np.ones((n_nodes * n_nodes,), np.float32)


def edges_from_adjacency(adj: np.ndarray, force_self_loops: bool = True):
    """COO edges of a weighted adjacency, reference code/models_rd.py:307-311.

    adj[i, j] != 0 creates edge (src=i, tgt=j) with weight adj[i, j]; the
    diagonal is forced to 1 first (self-loops), matching
    `adj[torch.eye(F).byte()] = 1`.
    """
    adj = np.array(adj, dtype=np.float32, copy=True)
    if force_self_loops:
        np.fill_diagonal(adj, 1.0)
    src, tgt = np.nonzero(adj)
    edge_index = np.stack([src, tgt]).astype(np.int32)
    return edge_index, adj[src, tgt]
