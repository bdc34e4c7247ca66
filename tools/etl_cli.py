"""CLI for the core ETL pipeline — the user surface of the reference
program (/root/reference/src/main.rs:49-102: hardcoded source file, table
name, and connection string) as a proper parameterized command.

Examples:
    # print the Postgres DDL for a parquet file and load it over JDBC
    python tools/etl_cli.py data.parquet --table flights \\
        --jdbc-url jdbc:postgresql://localhost/db?user=u&password=p

    # same pipeline, parquet sink (no database needed)
    python tools/etl_cli.py data.parquet --parquet-out /tmp/out

    # DDL only (what main.rs:71-72 executed)
    python tools/etl_cli.py data.parquet --table flights --ddl-only
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("source", help="source path (parquet/csv/json)")
    ap.add_argument("--format", default="parquet", choices=["parquet", "csv", "json"])
    ap.add_argument("--table", default="t", help="target table name")
    ap.add_argument("--jdbc-url", help="JDBC sink URL")
    ap.add_argument("--parquet-out", help="parquet sink path (default sink)")
    ap.add_argument("--mode", default="append", choices=["append", "overwrite"])
    ap.add_argument(
        "--num-partitions",
        type=int,
        default=10,
        help="concurrent sink connections (the semaphore of main.rs:68)",
    )
    ap.add_argument(
        "--batchsize",
        type=int,
        default=10_000,
        help="rows per executeBatch (the 1000-row batches of main.rs:74)",
    )
    ap.add_argument("--schema", help="explicit DDL-style schema for csv/json")
    ap.add_argument(
        "--jdbc-driver",
        help="JDBC driver class (e.g. org.apache.derby.jdbc.EmbeddedDriver "
        "for the zero-install embedded-Derby target on Spark's classpath)",
    )
    ap.add_argument("--ddl-only", action="store_true", help="print DDL and exit")
    ap.add_argument(
        "--postgres",
        action="store_true",
        help="load into a throwaway EMBEDDED PostgreSQL via COPY — the "
        "reference's actual target engine (main.rs:60-66), no JDBC "
        "driver needed; requires a local postgres toolchain",
    )
    ap.add_argument(
        "--pg-conninfo",
        help="load into an EXISTING PostgreSQL via COPY: space-separated "
        "key=value pairs (e.g. 'host=localhost port=5432 dbname=db "
        "user=u'); implies the COPY sink",
    )
    args = ap.parse_args(argv)

    from parquet_to_postgres_spark.etl import (
        JdbcSink,
        ParquetSink,
        etl,
        read_source,
        schema_to_pg_ddl,
    )
    from parquet_to_postgres_spark.session import get_spark

    spark = get_spark("etl_cli")
    spark.sparkContext.setLogLevel("WARN")

    if args.ddl_only:
        df = read_source(spark, args.source, args.format, args.schema)
        print(schema_to_pg_ddl(args.table, df.schema))
        return 0

    if args.postgres or args.pg_conninfo:
        from parquet_to_postgres_spark.pg import (
            EmbeddedPostgres,
            PostgresCopySink,
            postgres_available,
            run_psql,
        )

        def _run_copy(conninfo: dict[str, str]) -> int:
            sink = PostgresCopySink(
                conninfo=conninfo,
                table=args.table,
                mode=args.mode,
                num_partitions=args.num_partitions,
            )
            t0 = time.perf_counter()
            ddl = etl(spark, args.source, sink, args.format, args.schema)
            print(ddl)
            n = run_psql(
                conninfo, f"SELECT COUNT(*) FROM {args.table};"
            ).strip()
            print(f"rows in {args.table}: {n}")
            print(f"Time taken: {time.perf_counter() - t0:.2f}s")
            return 0

        if args.pg_conninfo:
            conninfo = dict(
                kv.split("=", 1) for kv in args.pg_conninfo.split()
            )
            return _run_copy(conninfo)
        if not postgres_available():
            print("no usable postgres toolchain found", file=sys.stderr)
            return 2
        import tempfile

        with tempfile.TemporaryDirectory() as workdir:
            # world-readable so the dropped-privilege postgres user can
            # create its data directory under it
            os.chmod(workdir, 0o777)
            with EmbeddedPostgres(workdir) as pg:
                return _run_copy(pg.conninfo())

    if args.jdbc_url:
        sink = JdbcSink(
            url=args.jdbc_url,
            table=args.table,
            mode=args.mode,
            num_partitions=args.num_partitions,
            batchsize=args.batchsize,
            options={"driver": args.jdbc_driver} if args.jdbc_driver else {},
        )
    elif args.parquet_out:
        sink = ParquetSink(path=args.parquet_out, mode="overwrite")
    else:
        ap.error("one of --jdbc-url / --parquet-out / --ddl-only is required")

    t0 = time.perf_counter()
    ddl = etl(spark, args.source, sink, args.format, args.schema)
    print(ddl)
    # the reference's only instrumentation, kept: main.rs:51,100
    print(f"Time taken: {time.perf_counter() - t0:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
