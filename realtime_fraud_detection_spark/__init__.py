"""realtime_fraud_detection_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference real-time fraud-detection system (AjayAlluri/realtime-fraud-detection,
see SURVEY.md), re-expressed as idiomatic Spark DataFrame / SQL / Structured
Streaming programs so that Catalyst + Tungsten provide the optimizer and
vectorized execution.

Layout:
    session       SparkSession factory tuned for scale (AQE, Arrow, shuffle sizing)
    schemas       explicit StructTypes for every record type (SURVEY §1.3)
    sources/      parquet/testdata loaders, Kafka + rate streaming sources,
                  JSON serde with error fallback, seeded synthetic generator
    functions/    the scalar expression library: feature families (SURVEY §2.7),
                  scoring (M1/M2/M3/F6), text analysis, portable hashing
    operators/    relational surface, analytic windows (W1-W5), event-time
                  aggregations (A1-A11), joins (J1-J6), dedup, similarity search
    streaming/    watermark policy, streaming pipeline, stateful ops, sinks
    ml/           GBT + isolation-forest + ensemble (M3-M8)
    plans/        plan-inspection helpers (pushdown / broadcast / codegen checks)
"""

__version__ = "0.1.0"
