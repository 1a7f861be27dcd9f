"""dp1_data_wrangling_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference ETL
pipeline ``lsst-dm/dp1-data-wrangling`` (see ``SURVEY.md``) as idiomatic
Spark DataFrame operators, plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
that a 100 TB Spark deployment needs.

Layout
------
- ``session``    : tuned SparkSession builder.
- ``tables``     : typed readers for the driver fixture tables.
- ``fixtures``   : derived Butler-model tables (datasets, associations,
                   collections, datastore records) built deterministically
                   from the fixture tables, with matching DuckDB SQL.
- ``operators``  : find-first, priority dedup, chain flattening, interval
                   joins, dedup family, similarity search, text analysis.
- ``functions``  : column-expression libraries (path rewriting, timespans).
- ``sources``    : schema-declared readers / manifest IO.
- ``plans``      : export / import / file-tree pipelines.
- ``streaming``  : Structured Streaming variants of the event queries.
"""

__version__ = "0.1.0"
