"""kafkastreams_example_spark — a PySpark-native analytics engine.

A from-scratch engine covering the query/data-processing surface of the
reference Kafka Streams application (lokeshallam/kafkastreams-example:
filter pipeline, JSON codec, windowed stream deduplication) re-expressed
Spark-first, plus the relational core and large-scale training-data
pipeline operators (dedup families, similarity search, text analysis,
multimodal plumbing) a 100 TB deployment needs.

Design stance (see SURVEY.md §7): declare logical plans with the
DataFrame/SQL API and let Catalyst/Tungsten pick physical strategies;
drop to Arrow-batched pandas UDFs only where built-ins can't express the
semantics (the one case: refresh-on-duplicate stateful dedup).
"""

__version__ = "0.1.0"
