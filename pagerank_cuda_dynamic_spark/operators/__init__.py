from pagerank_cuda_dynamic_spark.operators.graph import (  # noqa: F401
    add_self_loops,
    transpose,
    symmetrize,
    out_degrees,
    self_loop_count,
    tidy_batch,
    apply_batch,
    bfs_reachable,
)
from pagerank_cuda_dynamic_spark.operators.graph import (  # noqa: F401
    avg_neighbor_degree,
    degree_assortativity,
    harmonic_centrality,
    multi_source_distances,
    reciprocity,
)
from pagerank_cuda_dynamic_spark.operators.centrality import (  # noqa: F401
    hits,
    k_core,
    katz,
    personalized_pagerank,
)
from pagerank_cuda_dynamic_spark.operators.walks import (  # noqa: F401
    deterministic_walks,
    md5_walk_hash,
    sample_neighbors,
)
from pagerank_cuda_dynamic_spark.operators.features import (  # noqa: F401
    collect_features,
    explode_features,
    propagate_features,
)
from pagerank_cuda_dynamic_spark.operators.pagerank import (  # noqa: F401
    PagerankOptions,
    PagerankResult,
    pagerank_static,
    pagerank_naive_dynamic,
    pagerank_dynamic_traversal,
    pagerank_dynamic_frontier,
    pagerank_dynamic_frontier_prune,
)
