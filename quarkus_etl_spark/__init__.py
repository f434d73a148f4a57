"""quarkus_etl_spark — a PySpark-native analytics engine with the query and
data-processing capability surface of the reference ETL tool
(hmchangm/quarkus-etl), rebuilt Spark-first.

The reference is a config-driven streaming JDBC->JDBC copier whose *query*
surface is "arbitrary SQL pushed down to the configured engine"
(reference: EtlMain.kt:103-108, LoaderBean.kt:5-16). Here, Spark SQL /
Catalyst *is* the engine: jobs declare extract SQL evaluated by Spark over
registered sources, and writes go through Spark's native sinks.

Layout:
  session    — SparkSession factory with scale-aware defaults
  catalog    — fixture/table registration, schema normalization (A4-A7)
  config     — job config model (A12; mirrors LoaderBean.kt:5-16)
  jobs       — sequential JobRunner with metrics (A11-A12)
  sources/   — readers & writers incl. JDBC batch parity (A1-A3, A14)
  functions/ — scalar/vector/text function library (Tier B function families)
  operators/ — composed operators Spark lacks (as-of join, dedup, ANN, ...)
  streaming/ — Structured Streaming pipelines & event-time windows
  plans/     — plan inspection helpers (pushdown/broadcast assertions)
  queries/   — the SURVEY.md §2 query inventory + DuckDB oracles
"""

__version__ = "0.1.0"
