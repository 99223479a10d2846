from pagerank_cuda_dynamic_spark.sources.transcripts import (  # noqa: F401
    synthesize_transcripts,
    write_transcripts,
    read_transcripts,
    TRANSCRIPT_SCHEMA,
)
from pagerank_cuda_dynamic_spark.sources.edges import (  # noqa: F401
    derive_edges_from_transcripts,
    derive_entity_edges,
    edges_from_events,
)
from pagerank_cuda_dynamic_spark.sources.corpus import (  # noqa: F401
    DOCUMENTS_SCHEMA,
    read_jsonl_documents,
    write_jsonl_documents,
)
from pagerank_cuda_dynamic_spark.sources.textgraph import (  # noqa: F401
    MtxHeader,
    read_mtx,
    read_mtx_header,
    read_snap_temporal,
    snapshot_from_mtx,
    write_mtx,
)
