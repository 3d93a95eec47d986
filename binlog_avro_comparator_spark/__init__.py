"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference CDC consistency toolset
(RudyRi/binlog-avro-comparator), re-expressed Spark-first.

Layout:
  session        -- SparkSession builder tuned for local[32] and cluster use
  sources        -- readers: parquet test tables, JSONL (permissive), Avro,
                    binlog parser text (with lineage + line order)
  operators      -- compare core (joins/flags/findings/summary), text
                    sessionization, dedup, similarity, text analysis
  functions      -- scalar helpers (CDC change-type inference, timestamp
                    parsing, avro union unwrap)
  plans          -- the query registry backing __spark_entry__.py
  streaming      -- Structured Streaming variant of the comparison
"""

__version__ = "0.1.0"
