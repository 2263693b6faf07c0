"""PySpark-native analytics engine with the query/data-processing
capabilities of thoughtpolice/fdblog2clickhouse.

The reference (/root/reference/trace-converter.py, entrypoint.sh) is a
log→ClickHouse ingestion pipeline whose consumer surface is OLAP SQL
over ingested trace events. This package re-expresses that surface —
ingestion, normalization, schema management, sinks, and the OLAP query
layer — Spark-first (DataFrame/SQL/Catalyst/Structured Streaming), and
adds the LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) required for 100 TB-scale training
data work. See SURVEY.md for the full inventory.
"""

__version__ = "0.1.0"
