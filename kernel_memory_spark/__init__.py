"""kernel_memory_spark — a from-scratch, PySpark-native knowledge-graph
construction and memory-query engine with the data-processing capabilities of
microsoft/kernel-memory (reference, read-only, at /root/reference).

This is NOT a port: the reference's C# handler/queue machinery is replaced by
a declarative DataFrame DAG (Catalyst/AQE pick the physical plan); Python code
runs only inside Arrow-vectorized pandas UDFs (chunking, hashing, embedding).

Layout
------
- ``schema``      : canonical StructTypes (corpus spans, records, triples, ...)
- ``synth``       : deterministic synthetic interleaved text+media corpus
- ``functions/``  : scalar/vectorized building blocks (tokenizers, chunker,
                    text normalization, vectors, text statistics)
- ``operators/``  : pipeline stages + analytics operators (extract, partition,
                    embeddings, save_records, triples, linking, canonicalize,
                    dedup, similarity, query, multimodal)
- ``plans/``      : query AST -> Column compiler (KM2 search semantics)
- ``sources/``    : table IO layer (parquet-backed merge/snapshot tables)
- ``streaming/``  : resumable pipeline orchestrator (step ledger semantics)
"""

__version__ = "0.1.0"
