from pagerank_cuda_dynamic_spark.plans.dictionary import (  # noqa: F401
    build_vertex_dictionary,
    encode_edges,
)
from pagerank_cuda_dynamic_spark.plans.graph_snapshot import GraphSnapshot  # noqa: F401
