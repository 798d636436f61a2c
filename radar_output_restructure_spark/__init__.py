"""radar_output_restructure_spark — a PySpark-native engine with the query and
data-processing capabilities of RADAR-base/radar-output-restructure.

The reference (Kotlin, record-at-a-time coroutine pipeline; see /root/reference)
reads Kafka-sink Avro topic trees and rewrites every record into a
project/user/topic/hourly-bin output tree as flattened CSV or JSON-lines.
This package re-expresses the whole capability surface as declarative Spark
DataFrame plans (Catalyst-optimized, whole-stage-codegen'd), plus the
large-scale training-data operators (dedup families, similarity search,
text analysis, multimodal plumbing) the reference lacks.

Layout:
  functions/  — pure Column builders (event-time cascade, sanitizers,
                flattener, Java-compatible renderings, hashing)
  sources/    — topic-tree readers (avro/parquet) and the processed-file manifest
  operators/  — dedup variants, time-binning, exclusion, text analysis,
                minhash/simhash/jaccard dedup, similarity search, multimodal
  plans/      — the path-format ${...} DSL and end-to-end pipeline plans
  sinks/      — exact-name CSV/JSON writers with schema sidecars
  streaming/  — Structured Streaming service mode
"""

__version__ = "0.1.0"

from radar_output_restructure_spark.session import get_spark  # noqa: F401
