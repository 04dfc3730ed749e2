"""iot_big_data_engineering_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of the
reference IoT big-data pipeline (``moeinghaeini/iot-big-data-engineering``),
re-expressed Spark-first:

- DataFrame / Spark SQL for every relational operator (Catalyst optimizes);
- Structured Streaming (``foreachBatch`` + optional watermarked windows)
  instead of legacy DStreams;
- explicit ``StructType`` schemas everywhere (the reference declared one and
  then inferred — see SURVEY.md §1.5);
- zero row-at-a-time Python UDFs on the reference surface; Pandas UDFs only
  for the beyond-reference extensions (similarity search, multimodal).

Layout:
    sources/    parquet table loaders, the events→sensor mapping, a
                deterministic synthetic sensor generator, kafka/rate options
    functions/  column-expression helpers (measurement accessors, quality &
                anomaly scoring, text stats, vector math)
    operators/  the named analytics / serving / monitoring / extension queries
    streaming/  Structured Streaming pipelines (quality → fan-out sinks)
    plans/      physical-plan assertion helpers (pushdown, broadcast, codegen)
    registry.py the query registry that backs ``__spark_entry__.py``
"""

__version__ = "0.1.0"
