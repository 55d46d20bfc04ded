"""go_fish_spark — a PySpark-native analytics engine with the capabilities of
patrobinson/go-fish (reference at /root/reference), re-expressed Spark-first.

The reference is a record-at-a-time Go stream processor (sources → rules →
sinks DAG over channels, `pipeline.go:102-111`). This engine expresses the
same semantics as declarative DataFrame plans so Catalyst/Tungsten pick the
physical strategy, and extends the surface with the relational algebra the
reference lacks (SURVEY.md §2.6) plus large-scale data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Layout:
  session.py    SparkSession factory tuned for scale
  catalog.py    testdata table loaders
  queries/      the declared query inventory (SURVEY.md §2.7) + oracles
  operators/    reusable operator library (decode, dedup, similarity, ...)
  functions/    scalar/vector/text column helpers
  plans/        pipeline spec parse/validate/compile (≡ pipeline.go)
  streaming/    structured-streaming sources/sinks/stateful tasks
  tasks/        pluggable task protocol (≡ rule plugins, rule.go:15-22)
"""

__version__ = "0.1.0"
