"""lakefs_spark — a PySpark-native versioned-data-lake engine.

From-scratch reimplementation of the query and data-processing
capabilities of treeverse/lakeFS (studied read-only at /root/reference)
as idiomatic Spark SQL / DataFrame plans. See SURVEY.md for the design
blueprint and the reference-citation map.

Layers
------
- ``functions``  : scalar helpers (typed identity hashing, prefix bounds)
- ``operators``  : DataFrame -> DataFrame relational operators (overlay,
                   listing, diff, merge, gc, dedup, text, similarity)
- ``plans``      : physical planning helpers (content-defined chunker)
- ``sources``    : fixture derivations + DuckDB oracle SQL mirrors
- ``storage``    : the versioned repository (ranges, manifests, commits,
                   staging, refs) over Parquet
- ``streaming``  : Structured Streaming ingestion into staging
"""

__version__ = "0.1.0"
