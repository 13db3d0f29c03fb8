"""Spark operators: extraction pipeline stages, training-data ops
(dedup / similarity / text analysis), and the relational operator set
mirrored against the DuckDB oracle."""
