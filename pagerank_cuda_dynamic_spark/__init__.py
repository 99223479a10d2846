"""pagerank_cuda_dynamic_spark — a from-scratch PySpark-native dynamic
link-graph analytics engine with the capabilities of
puzzlef/pagerank-cuda-dynamic (reference, read-only at /root/reference).

NOT a port: the reference is a C++17/CUDA header library computing PageRank
on evolving digraphs five ways (Static, Naive-Dynamic, Dynamic-Traversal,
Dynamic-Frontier, Dynamic-Frontier-with-Pruning).  This engine re-expresses
those semantics — plus connected components, label propagation, triangle
count, and large-scale training-data-pipeline operators — as idiomatic
PySpark DataFrame plans and vectorized Arrow kernels.

Layout
------
sources/    transcript synthesizer, edge derivation, batch slicing
plans/      vertex dictionary, graph snapshots, partitioning strategy
operators/  pagerank family, graph-structural ops, components/LPA/triangles,
            dedup, similarity, text analysis, multimodal plumbing
functions/  vectorized column expressions shared across operators
streaming/  micro-batch dynamic driver + checkpoint/resume
"""

from pagerank_cuda_dynamic_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
