from raindrop_tpu.graph.propagate import (  # noqa: F401
    ob_propagation_init,
    ob_propagate_coo,
    ob_propagate_dense_complete,
)
from raindrop_tpu.graph.structure import (  # noqa: F401
    complete_graph_edges,
    diffuse,
    edges_from_adjacency,
    generate_global_structure,
    masked_softmax,
)
