"""erddap2agol_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of GCOOS/erddap2agol (reference surveyed in
SURVEY.md), re-expressed Spark-first.

Layout:
    session     — tuned SparkSession builder (AQE, UTC, arrow)
    sources     — catalog / DAS-metadata / table loaders (SURVEY §2.1)
    operators   — projections, filters, joins, windows, aggregations,
                  set-ops, dedup, similarity, text analysis (SURVEY §2.3-2.7
                  + training-data-pipeline extensions)
    functions   — scalar function layer: extraction DSL, datetime decoding,
                  case transforms, geometry constructors (SURVEY §2.8)
    plans       — chunk planning, schema pinning (SURVEY §1.3, O5)
    streaming   — NRT refresh / change detection (SURVEY §2.9)
    sinks       — GeoJSON / parquet sinks (SURVEY §2.2)
"""

__version__ = "0.1.0"
