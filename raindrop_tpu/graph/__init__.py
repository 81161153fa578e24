from raindrop_tpu.graph.propagate import (  # noqa: F401
    ob_propagation_init,
    ob_propagate_coo,
    ob_propagate_dense_complete,
)
from raindrop_tpu.graph.structure import complete_graph_edges, edges_from_adjacency  # noqa: F401
