"""PySpark-native main-content extraction engine.

A from-scratch, Spark-first rebuild of the computation shape of the
reference OCR/text-recovery tool (``flame-cai/win64-local-ocr-tool``):
binary page payloads -> content-unit stream -> reading-order span
assembly -> extracted text with offsets + lineage, resumable, skew-aware.

Package layout:

- ``kernels/``   pure-Python/numpy compute kernels (deterministic, shared
  by the single-process golden extractor and the Spark vectorized UDFs)
- ``operators/`` Spark operators: extraction pipeline, dedup, similarity,
  text analysis, relational operator set for the DuckDB oracle
- ``corpus.py``  deterministic synthetic Common-Crawl-style corpus
- ``golden.py``  single-process reference extractor (golden oracle)
- ``pipeline.py`` end-to-end job: stages, lineage, resume, skew split
- ``session.py`` tuned SparkSession builder
"""

__version__ = "0.1.0"
