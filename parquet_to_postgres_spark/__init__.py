"""parquet_to_postgres_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the *capabilities* of
TFMV/parquet_to_postgres (reference: ``/root/reference/src/main.rs`` — a
210-line Rust Parquet→Postgres ETL pipeline), re-expressed Spark-first and
extended into a full analytics engine:

- Core ETL: Parquet/CSV/JSON sources → typed DDL → batched JDBC sink
  (reference ``main.rs:49-102``), done with ``spark.read`` / ``df.write.jdbc``
  so Catalyst/Tungsten own the physical plan.
- Relational operators: projection, filter, joins (incl. as-of, range,
  broadcast star joins), aggregation (hash agg, rollup/cube, approx
  sketches), window functions, sort/limit/set ops.
- LLM-data-pipeline operators: exact + MinHash/SimHash near-dedup,
  embedding similarity search (brute-force, LSH, IVF, int8, PQ and
  IVF-PQ families, in-memory and persisted), text analysis (tokenize,
  language-ID, quality score, fingerprint), multimodal binary-column
  plumbing, weighted/stratified/split sampling, blocked fuzzy joins.
- Scale-pattern operators: salting, bloom semi-join reduction, Z-order
  layout, bucketing, CDC changelog compaction, distributed rank.
- Structured Streaming: tumbling/sliding/session windows, watermark
  late-data handling, streaming dedup, custom stateful operators,
  streaming ANN index probes.

Everything is DataFrame/SQL-first: logical plans are declared via the
PySpark DataFrame API and Catalyst picks the physical strategy.  Python
UDFs appear only where built-ins genuinely cannot express the semantics,
and then always as Arrow-batched pandas UDFs.

Designed for 100 TB scale: AQE on, broadcast joins for dimensions,
partial aggregation everywhere, two-stage top-k for similarity search,
salting recipes for skew, key-hash ``repartition`` ahead of JDBC writes.
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
