"""sigraph-spark: a PySpark-native knowledge-graph construction engine.

A from-scratch reimplementation of the query/data-processing capabilities of
hongsam14/sigraph (a malware behavioral-KG builder: REST + Neo4j + OpenSearch)
as an idiomatic Spark pipeline over Common-Crawl-style page tables:

    pages -> S1 text extraction -> S2 triple extraction (rule matchers)
          -> S3 entity linking (MinHash-LSH + connected components)
          -> S4 graph materialization (merge-semantics node/edge tables)
          -> S5 queries (neighborhoods, BFS, IoCs, sequences, sigma filters)

Everything here derives from the public Apache Spark API and the reference's
observable semantics (cited per-module as ``/root/reference/<path>:<lines>``).
Nothing is a port of its execution engine.
"""

__version__ = "0.1.0"
