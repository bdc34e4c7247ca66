"""Live PostgreSQL execution path — the engine the reference actually
targets (``/root/reference/src/main.rs:60-66``) — with no JDBC driver.

No Postgres JDBC jar ships in this environment and there is no network
to fetch one, so Spark's JDBC writer cannot reach Postgres here (that
code path is executed against embedded Derby instead — see
``queries/etl_q.py``).  This module proves the POSTGRES DIALECT
end-to-end anyway, through the server's native bulk interface:

- the DDL from :func:`.etl.schema_to_pg_ddl` is executed by a real
  ``postgres`` server — JSONB / BYTEA / NUMERIC / TIMESTAMP columns
  included, the exact types the reference's type map gets wrong
  (``main.rs:104-118``);
- writes go through ``COPY ... FROM STDIN (FORMAT CSV)`` — Postgres's
  fastest ingest path, and the pattern production Spark→PG pipelines
  use ("unload + COPY") when per-row JDBC INSERT is the bottleneck;
- reads come back as bounded-range parallel ``COPY ... TO STDOUT``
  scans — the read-side analogue of Spark's partitioned JDBC read.

Scale notes.  CSV lines are rendered JVM-side with ``F.to_csv`` (exact,
vectorized, inside whole-stage codegen); the Python half of the
``mapInPandas`` sink only pipes bytes into ONE ``psql`` subprocess per
partition, so concurrent connections are bounded by the partition count
exactly like ``JdbcSink.num_partitions`` (the reference's 10-permit
semaphore, ``main.rs:68``).  On a real cluster each executor streams its
partitions straight to the server — no driver funnel; the driver only
runs DDL.  The embedded server manager below exists for tests: point
``conninfo`` at any real host to use the sink against one.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .etl import schema_to_pg_ddl

# ------------------------------------------------------------ server ----


def _pg_binaries() -> dict[str, str | None]:
    return {n: shutil.which(n) for n in ("initdb", "pg_ctl", "psql")}


def postgres_available() -> bool:
    """True iff a usable local PostgreSQL toolchain exists.

    Postgres refuses to run as root, so under uid 0 we additionally need
    ``runuser`` plus a ``postgres`` OS account to drop privileges into.
    """
    if any(v is None for v in _pg_binaries().values()):
        return False
    if os.geteuid() == 0:
        if shutil.which("runuser") is None:
            return False
        try:
            import pwd

            pwd.getpwnam("postgres")
        except KeyError:
            return False
    return True


@dataclass
class EmbeddedPostgres:
    """Scratch single-node PostgreSQL on a unix socket (tests only).

    ``initdb --auth=trust`` + ``pg_ctl start`` under ``workdir``; when
    running as root every server-side command is re-executed as the
    ``postgres`` OS user via ``runuser`` (Postgres hard-refuses uid 0).
    Clients connect over the socket as the ``postgres`` role — trust
    auth, so the (root) test process needs no password or peer match.
    """

    workdir: str
    _started: bool = field(default=False, init=False)
    _chmodded: list = field(default_factory=list, init=False)

    @property
    def datadir(self) -> str:
        return os.path.join(self.workdir, "data")

    @property
    def sockdir(self) -> str:
        return os.path.join(self.workdir, "sock")

    def conninfo(self) -> dict[str, str]:
        """What a client needs: passed into the executor-side closures
        (plain strings — picklable, no live handles)."""
        return {"host": self.sockdir, "user": "postgres", "dbname": "postgres"}

    def _server_cmd(self, args: list[str]) -> list[str]:
        if os.geteuid() == 0:
            return ["runuser", "-u", "postgres", "--", *args]
        return args

    def _run(self, args: list[str], **kw) -> subprocess.CompletedProcess:
        # cwd="/" — the postgres user cannot read /root, and the server
        # tools chdir-check their cwd before doing anything.
        return subprocess.run(
            self._server_cmd(args),
            cwd="/",
            capture_output=True,
            text=True,
            **kw,
        )

    def start(self) -> "EmbeddedPostgres":
        os.makedirs(self.datadir, exist_ok=True)
        os.makedirs(self.sockdir, exist_ok=True)
        if os.geteuid() == 0:
            import pwd
            import stat

            uid = pwd.getpwnam("postgres").pw_uid
            for p in (self.workdir, self.datadir, self.sockdir):
                os.chown(p, uid, -1)
            # the postgres user must be able to TRAVERSE every ancestor
            # (pytest tmp dirs are 0700 root) — add o+x where we own it,
            # RECORDING each change so stop() restores the original
            # modes (leaving e.g. /root world-traversable after the
            # tests would outlive the process — review finding)
            anc = os.path.dirname(os.path.abspath(self.workdir))
            while anc not in ("/", ""):
                st = os.stat(anc)
                if st.st_uid == 0 and not st.st_mode & stat.S_IXOTH:
                    os.chmod(anc, st.st_mode | stat.S_IXOTH)
                    self._chmodded.append((anc, st.st_mode))
                anc = os.path.dirname(anc)
        r = self._run([ "initdb", "-D", self.datadir, "--auth=trust", "-E", "UTF8"])
        if r.returncode != 0:
            raise RuntimeError(f"initdb failed: {r.stderr[-2000:]}")
        r = self._run(
            [
                "pg_ctl",
                "-D",
                self.datadir,
                "-l",
                os.path.join(self.workdir, "pg.log"),
                "-o",
                f"-c listen_addresses='' -k {self.sockdir} -c fsync=off",
                "-w",
                "start",
            ]
        )
        if r.returncode != 0:
            raise RuntimeError(f"pg_ctl start failed: {r.stderr[-2000:]}")
        self._started = True
        return self

    def stop(self) -> None:
        if self._started:
            self._run(["pg_ctl", "-D", self.datadir, "-m", "immediate", "stop"])
            self._started = False
        # restore ancestor modes in reverse (deepest last changed first)
        while self._chmodded:
            path, mode = self._chmodded.pop()
            try:
                os.chmod(path, mode)
            except OSError:
                pass

    def psql(self, sql: str, tuples_only: bool = True) -> str:
        """Run one SQL script through psql; returns stdout, raises on error."""
        out = run_psql(self.conninfo(), sql, tuples_only=tuples_only)
        return out

    def __enter__(self) -> "EmbeddedPostgres":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


_SHARED: EmbeddedPostgres | None = None
_SHARED_TRIED = False


def shared_postgres() -> EmbeddedPostgres | None:
    """Process-wide lazy embedded server, or None when unavailable.

    The declared ``etl_pg_roundtrip`` query and any other repeated
    caller share ONE server instead of paying initdb+start (~2 s) per
    invocation — the honest model of the reference's always-on target
    (``main.rs:60-66`` connects, it doesn't boot).  First call starts
    the server in a scratch dir; atexit stops it and removes the dir.
    A failed start is remembered and returns None thereafter (no retry
    storm in a session without a usable toolchain)."""
    global _SHARED, _SHARED_TRIED
    if _SHARED_TRIED:
        return _SHARED
    _SHARED_TRIED = True
    if not postgres_available():
        return None
    import atexit
    import tempfile

    workdir = tempfile.mkdtemp(prefix="pgshared_")
    # world-readable so the dropped-privilege postgres user can create
    # its data directory under it
    os.chmod(workdir, 0o777)
    try:
        srv = EmbeddedPostgres(workdir).start()
    except Exception:
        shutil.rmtree(workdir, ignore_errors=True)
        return None

    def _stop() -> None:
        try:
            srv.stop()
        finally:
            shutil.rmtree(workdir, ignore_errors=True)

    atexit.register(_stop)
    _SHARED = srv
    return srv


def run_psql(
    conninfo: dict[str, str],
    sql: str,
    tuples_only: bool = True,
    stdin: str | None = None,
    stdin_bytes: bytes | None = None,
) -> str:
    """Client-side psql call — used from the driver (DDL) AND from
    executor tasks (COPY), so it depends only on the conninfo dict.
    ``stdin_bytes`` feeds COPY FROM STDIN (FORMAT BINARY) — psql
    forwards the stream to the server unaltered while in copy mode."""
    cmd = [
        "psql",
        "-h",
        conninfo["host"],
        "-U",
        conninfo["user"],
        "-d",
        conninfo["dbname"],
        "-v",
        "ON_ERROR_STOP=1",
        "-X",
        "-q",
    ]
    if tuples_only:
        cmd.append("-At")
    cmd += ["-c", sql]
    binary = stdin_bytes is not None
    r = subprocess.run(
        cmd,
        input=stdin_bytes if binary else stdin,
        capture_output=True,
        text=not binary,
        cwd="/",
    )
    err = (
        r.stderr.decode("utf-8", "replace") if binary else r.stderr
    )
    if r.returncode != 0:
        raise RuntimeError(f"psql failed ({sql[:120]!r}): {err[-2000:]}")
    return r.stdout.decode("utf-8", "replace") if binary else r.stdout


# ----------------------------------------------------------- CSV wire ----

# One option set shared by the write (F.to_csv) and read (F.from_csv)
# sides so the wire format can never drift.  escape='"' doubles embedded
# quotes (RFC 4180) — Postgres CSV's QUOTE/ESCAPE default; Spark's own
# default escape is backslash, which Postgres CSV would read literally.
# NULL rides as unquoted-empty, empty string as "" — both servers make
# that distinction in CSV mode.
_CSV_OPTS = {
    "escape": '"',
    "nullValue": "",
    "emptyValue": '""',
    "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "timestampNTZFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "dateFormat": "yyyy-MM-dd",
}

# On READ the option meanings shift: `emptyValue` is the replacement
# for an empty QUOTED field (write-side it is the rendering of an empty
# string), and the parser nulls an UNQUOTED empty field regardless of
# `nullValue`.  So reads use a sentinel NULL marker: COPY out prints
# NULLs as __PGNULL__ and FORCE_QUOTE * quotes every non-null value
# (including ''), which parses unambiguously.  Corner case: a data
# value equal to the sentinel itself would be nulled (Spark applies
# nullValue to quoted fields too) — the inherent CSV-wire ambiguity.
_PG_NULL = "__PGNULL__"
_CSV_READ_OPTS = {**_CSV_OPTS, "emptyValue": "", "nullValue": _PG_NULL}


def prepare_for_copy(df: DataFrame) -> DataFrame:
    """Rewrite columns whose CSV text needs Postgres-specific spelling:
    nested types → JSON text (lands in JSONB), binary → ``\\x`` hex text
    (bytea's hex input form).  Everything else to_csv renders exactly."""
    cols = []
    for f_ in df.schema.fields:
        c = F.col(f_.name)
        if isinstance(f_.dataType, (T.ArrayType, T.MapType, T.StructType)):
            cols.append(F.to_json(c).alias(f_.name))
        elif isinstance(f_.dataType, T.BinaryType):
            cols.append(
                F.when(
                    c.isNotNull(), F.concat(F.lit("\\x"), F.lower(F.hex(c)))
                ).alias(f_.name)
            )
        else:
            cols.append(c.alias(f_.name))
    return df.select(*cols)


# -------------------------------------------------------- binary wire ----

# COPY (FORMAT BINARY) per the public protocol docs: signature + flags +
# extension-length header, per-tuple int16 field count then per-field
# int32 byte length (-1 = NULL) + payload in each type's binary send
# format, int16 -1 trailer.  Temporal epochs are 2000-01-01 based.
_PGCOPY_HEADER = b"PGCOPY\n\xff\r\n\x00" + b"\x00" * 8
_PGCOPY_TRAILER = b"\xff\xff"
_PGCOPY_NULL = b"\xff\xff\xff\xff"
_PG_EPOCH_MICROS = 946_684_800_000_000  # 2000-01-01 minus 1970-01-01
_PG_EPOCH_DAYS = 10_957
_NTZ_EPOCH_SQL = "timestamp_ntz'1970-01-01 00:00:00'"


def _be(col: "F.Column", nbytes: int) -> "F.Column":
    """A long-valued column as its low ``nbytes`` big-endian bytes.
    hex() of a negative long is already the 16-digit two's complement,
    so the byte slice is exact for int2/int4/int8 alike — and the whole
    chain (hex/lpad/unhex/substring) stays inside whole-stage codegen."""
    h = F.unhex(F.lpad(F.hex(col.cast("long")), 16, "0"))
    return F.substring(h, 9 - nbytes, nbytes)


def _len_prefixed(payload: "F.Column") -> "F.Column":
    return F.concat(_be(F.octet_length(payload), 4), payload)


def _binary_cell(f: T.StructField) -> "F.Column":
    """One field of a PGCOPY tuple: int32 length + binary-send payload,
    or the -1 NULL marker.  Everything below except the float-bits
    reflect() call runs in codegen; reflect is still JVM-side (no
    Python boundary), which the e2e A/B in BASELINE.md prices."""
    c = F.col(f.name)
    dt = f.dataType
    fixed = None  # (nbytes, payload) for fixed-width sends
    if isinstance(dt, T.LongType):
        fixed = (8, _be(c, 8))
    elif isinstance(dt, T.IntegerType):
        fixed = (4, _be(c, 4))
    elif isinstance(dt, (T.ShortType, T.ByteType)):  # DDL: SMALLINT
        fixed = (2, _be(c, 2))
    elif isinstance(dt, T.BooleanType):
        fixed = (1, F.when(c, F.lit(b"\x01")).otherwise(F.lit(b"\x00")))
    elif isinstance(dt, T.DoubleType):
        bits = F.expr(
            "reflect('java.lang.Double','doubleToRawLongBits', "
            f"coalesce(`{f.name}`, 0.0d))"
        ).cast("long")
        fixed = (8, _be(bits, 8))
    elif isinstance(dt, T.FloatType):
        bits = F.expr(
            "reflect('java.lang.Float','floatToRawIntBits', "
            f"coalesce(`{f.name}`, cast(0.0 as float)))"
        ).cast("long")
        fixed = (4, _be(bits, 4))
    elif isinstance(dt, T.TimestampType):
        # match the CSV path's rendering: the SESSION-LOCAL wall time
        # lands in the tz-less TIMESTAMP column (cast to NTZ first)
        micros = F.expr(
            f"timestampdiff(MICROSECOND, {_NTZ_EPOCH_SQL}, "
            f"cast(`{f.name}` as timestamp_ntz))"
        )
        fixed = (8, _be(micros - F.lit(_PG_EPOCH_MICROS), 8))
    elif isinstance(dt, T.TimestampNTZType):
        micros = F.expr(
            f"timestampdiff(MICROSECOND, {_NTZ_EPOCH_SQL}, `{f.name}`)"
        )
        fixed = (8, _be(micros - F.lit(_PG_EPOCH_MICROS), 8))
    elif isinstance(dt, T.DateType):
        fixed = (4, _be(F.unix_date(c) - F.lit(_PG_EPOCH_DAYS), 4))
    elif isinstance(dt, T.StringType):
        cell = _len_prefixed(F.encode(c, "UTF-8"))
    elif isinstance(dt, T.BinaryType):
        cell = _len_prefixed(c)
    elif isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        # jsonb binary send format: version byte 0x01 + the JSON text
        cell = _len_prefixed(
            F.concat(F.lit(b"\x01"), F.encode(F.to_json(c), "UTF-8"))
        )
    elif isinstance(dt, T.DecimalType):
        cell = _numeric_cell(f.name, dt.precision, dt.scale)
    else:
        raise ValueError(
            f"COPY BINARY has no send format mapped for "
            f"{dt.simpleString()} (use wire_format='csv')"
        )
    if fixed is not None:
        nbytes, payload = fixed
        cell = F.concat(F.lit(nbytes.to_bytes(4, "big")), payload)
    return F.when(c.isNull(), F.lit(_PGCOPY_NULL)).otherwise(cell)


def _numeric_cell(name: str, p: int, s: int) -> "F.Column":
    """NUMERIC(p, s) in the numeric binary send format: int16 ndigits /
    weight / sign / dscale header then base-10000 digit groups, most
    significant first, aligned so a group boundary sits on the decimal
    point (the wire's invariant — hence the fractional pad to a
    multiple of 4 decimal digits).

    Exactness discipline: the digit groups come from the decimal's
    canonical STRING form — lpad/rpad/substring, all codegen, all
    trivially exact.  Three arithmetic forms were tried first and each
    REPRODUCED a corruption: floor(u/10^k) (decimal division rounds
    HALF_UP before floor — 99999999.99 grew a phantom digit), an
    unscaling multiply (the decimal(38,s) x decimal(m+1,0) TYPE rule
    overflows precision 38 and ANSI-errors at runtime for p+m+2 > 38
    even when the VALUE fits — decimal(38,0) died after the pre-DROP
    validation passed), and fractional-modulus pmod chains (the
    capped division result type silently rounded decimal(36,19)'s low
    groups).  Spark's decimal-to-string cast always prints plain
    notation with exactly ``s`` fraction digits, so string slicing is
    the one representation with no numeric type rules to fight.

    Leading zero groups ride along (numeric_recv accepts them; they
    contribute 0), which keeps ndigits/weight compile-time constants
    and the whole cell inside codegen.  EVERY decimal(p, s) is
    supported: the string pipeline never builds a point-aligned
    numeric intermediate, so the p+dpad <= 38 refusal the arithmetic
    forms needed is gone (r11 fourth-pass review finding — the guard
    cited deleted code)."""
    dpad = (4 - s % 4) % 4
    frac_groups = (s + dpad) // 4
    int_groups = max(1, -(-(p - s) // 4))
    ndigits = int_groups + frac_groups
    weight = int_groups - 1
    c = F.col(name)
    # the sign comes off the STRING too: even F.abs() is unsafe here —
    # measured corrupting decimal(36,19) (…0123456 -> …0123500, a
    # 17-significant-digit rounding inside the abs/type chain)
    txt = F.regexp_replace(c.cast("string"), "^-", "")
    if s > 0:
        int_str = F.substring_index(txt, ".", 1)
        frac_str = F.substring_index(txt, ".", -1)
    else:
        int_str = txt
        frac_str = F.lit("")
    digits_str = F.concat(
        F.lpad(int_str, 4 * int_groups, "0"),
        F.rpad(frac_str, 4 * frac_groups, "0"),
    )
    parts = [
        F.lit((8 + 2 * ndigits).to_bytes(4, "big")),  # field length
        F.lit(ndigits.to_bytes(2, "big")),
        F.lit((weight & 0xFFFF).to_bytes(2, "big")),
        F.when(c < 0, F.lit((0x4000).to_bytes(2, "big"))).otherwise(
            F.lit(b"\x00\x00")
        ),
        F.lit(s.to_bytes(2, "big")),
    ]
    for i in range(ndigits):
        parts.append(
            _be(F.substring(digits_str, 4 * i + 1, 4).cast("int"), 2)
        )
    return F.concat(*parts)


def binary_copy_tuples(df: DataFrame) -> DataFrame:
    """(rowbytes binary): each row as one complete PGCOPY tuple —
    field-count prefix plus every cell — built entirely JVM-side."""
    n = len(df.schema.fields)
    cells = [_binary_cell(f) for f in df.schema.fields]
    return df.select(
        F.concat(F.lit(n.to_bytes(2, "big")), *cells).alias("rowbytes")
    )


@dataclass
class PostgresCopySink:
    """Bulk sink into a live PostgreSQL via per-partition COPY.

    The Spark-side contract mirrors :class:`.etl.JdbcSink` — same
    ``table`` / ``mode`` / ``num_partitions`` knobs, same nested-column
    flattening — but the wire is Postgres's native COPY protocol, so the
    *dialect* DDL (JSONB/BYTEA/NUMERIC, ``schema_to_pg_ddl``) actually
    executes on the server the reference targets.
    """

    conninfo: dict[str, str]
    table: str
    mode: str = "append"
    num_partitions: int = 4
    # partition_tag=True makes per-TASK writes idempotent: rows carry a
    # __part column (the task's partition id, stable across retries),
    # and each task runs DELETE __part + COPY in ONE implicit psql
    # transaction — a task retried after its COPY committed (executor
    # loss after commit) replaces its own rows instead of doubling
    # them.  write_batch stages with this on; the plain append path
    # keeps the user's exact schema and therefore shares the same
    # task-retry exposure as any plain INSERT/COPY appender (disable
    # spark.speculation for it, and prefer write_batch for guarantees).
    partition_tag: bool = False
    # COPY wire format: 'csv' (F.to_csv lines) or 'binary' (PGCOPY
    # tuples, also built JVM-side — binary_copy_tuples).  The e2e A/B
    # at sf0.1 is in BASELINE.md: csv ships as the default (faster
    # end-to-end on a shared box); binary is the option for
    # server-CPU-bound topologies (2.1x cheaper parse).  All DDL types
    # are supported on both wires except decimals whose point-aligned
    # width exceeds 38 digits (binary refuses those up front).
    wire_format: str = "csv"

    def write(self, df: DataFrame) -> str:
        schema_df = (
            df.withColumn("__part", F.lit(0)) if self.partition_tag else df
        )
        ddl = schema_to_pg_ddl(self.table, schema_df.schema)
        if self.mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append/overwrite, got {self.mode!r}")
        if self.wire_format not in ("csv", "binary"):
            raise ValueError(
                f"wire_format must be csv/binary, got {self.wire_format!r}"
            )
        binary = self.wire_format == "binary"
        if binary:
            # validate EVERY column's send format BEFORE the
            # destructive DROP — otherwise a refused type (decimal)
            # would leave an empty shell where the populated table was
            # (r11 second-pass review finding)
            for f_ in schema_df.schema.fields:
                _binary_cell(f_)
        if self.mode == "overwrite":
            run_psql(self.conninfo, f"DROP TABLE IF EXISTS {self.table};")
        run_psql(self.conninfo, ddl)

        # HASH-partition on the first column (r15, was repartitionByRange):
        # partition count == connection cap either way, but range
        # partitioning pays a SEPARATE sampling pass over the input to
        # pick boundaries (RangePartitioner) — one extra job per write —
        # and COPY into a heap table gains nothing from range-sorted
        # slices (no index locality to preserve during bulk load; the
        # table's content is identical as a set).  Hash on a real key
        # column stays DETERMINISTIC under task retry (guide §2.5 —
        # never round-robin here), so the partition_tag idempotent-
        # replace path keeps its stable task→rows mapping.  Measured
        # r15 at sf0.1: 1.60 s → 1.26 s per 600k-row write (min of 3).
        if binary:
            prepared = df.repartition(self.num_partitions, df.columns[0])
        else:
            prepared = prepare_for_copy(df).repartition(
                self.num_partitions, df.columns[0]
            )
        if self.partition_tag:
            prepared = prepared.withColumn("__part", F.spark_partition_id())
        col_list = ", ".join(prepared.columns)
        if binary:
            lines = binary_copy_tuples(prepared)
        else:
            lines = prepared.select(
                F.to_csv(F.struct(*prepared.columns), _CSV_OPTS).alias("line")
            )
        conninfo, table = dict(self.conninfo), self.table
        tagged = self.partition_tag

        def _copy_partition(batches):
            import pandas as pd
            from pyspark import TaskContext

            n = 0
            chunks: list = []
            for pdf in batches:
                if len(pdf):
                    n += len(pdf)
                    if binary:
                        # ONE bytes object per Arrow batch, like the
                        # CSV twin's per-batch join — not one PyObject
                        # per row
                        chunks.append(b"".join(pdf["rowbytes"]))
                    else:
                        chunks.append("\n".join(pdf["line"]))
            if n:
                fmt = "BINARY" if binary else "CSV, NULL ''"
                copy = f"COPY {table} ({col_list}) FROM STDIN (FORMAT {fmt})"
                if tagged:
                    # one -c string = one implicit transaction: the
                    # delete and the copy commit or roll back together
                    pid = TaskContext.get().partitionId()
                    copy = (
                        f"DELETE FROM {table} WHERE __part = {pid}; "
                        + copy
                    )
                if binary:
                    payload = (
                        _PGCOPY_HEADER + b"".join(chunks) + _PGCOPY_TRAILER
                    )
                    run_psql(conninfo, copy, stdin_bytes=payload)
                else:
                    run_psql(conninfo, copy, stdin="\n".join(chunks) + "\n")
            yield pd.DataFrame({"n": [n]})

        # the aggregate is the action that runs the COPY tasks; its value
        # (rows shipped) is a single scalar to the driver.
        lines.mapInPandas(_copy_partition, schema="n long").agg(
            F.sum("n")
        ).collect()
        return ddl

    # ---- exactly-once micro-batch publish (foreachBatch contract) ----
    #
    # The psql twin of etl.ExactlyOnceJdbcSink: COPY lands the batch in
    # an overwritten staging table (parallel, retry-safe), then ONE
    # psql -c string publishes stage → target and records the batch_id
    # in <table>__epochs.  psql executes a multi-statement -c string in
    # a single implicit transaction (with ON_ERROR_STOP aborting it
    # whole), so the publish is atomic; a replayed batch hits the
    # ledger and is skipped before any row moves.

    @property
    def stage_table(self) -> str:
        return f"{self.table}__stage"

    @property
    def ledger_table(self) -> str:
        return f"{self.table}__epochs"

    def is_committed(self, batch_id: int) -> bool:
        run_psql(
            self.conninfo,
            f"CREATE TABLE IF NOT EXISTS {self.ledger_table} "
            "(batch_id BIGINT PRIMARY KEY);",
        )
        out = run_psql(
            self.conninfo,
            f"SELECT 1 FROM {self.ledger_table} "
            f"WHERE batch_id = {int(batch_id)};",
        )
        return out.strip() != ""

    def write_batch(self, df: DataFrame, batch_id: int) -> bool:
        """Returns True if the batch was published, False on replay-skip."""
        if self.is_committed(batch_id):
            return False
        stage = PostgresCopySink(
            conninfo=self.conninfo,
            table=self.stage_table,
            mode="overwrite",
            num_partitions=self.num_partitions,
            partition_tag=True,
        )
        stage.write(df)
        cols = ", ".join(df.columns)
        run_psql(
            self.conninfo,
            f"CREATE TABLE IF NOT EXISTS {self.table} AS "
            f"SELECT {cols} FROM {self.stage_table} WITH NO DATA;",
        )
        run_psql(
            self.conninfo,
            f"INSERT INTO {self.table} ({cols}) "
            f"SELECT {cols} FROM {self.stage_table}; "
            f"INSERT INTO {self.ledger_table} (batch_id) "
            f"VALUES ({int(batch_id)});",
        )
        return True


def read_back(
    spark: SparkSession,
    conninfo: dict[str, str],
    table: str,
    schema: T.StructType | str,
    partition_column: str | None = None,
    lower: int | None = None,
    upper: int | None = None,
    num_partitions: int = 4,
) -> DataFrame:
    """Parallel COPY-out read: ``num_partitions`` bounded-range
    ``COPY (SELECT ...) TO STDOUT (FORMAT CSV)`` scans, one per Spark
    partition, parsed JVM-side with ``from_csv`` under the same wire
    options the sink wrote with.

    Ranges only steer split boundaries — the edge scans are unbounded
    below/above, so rows outside [lower, upper) still arrive (the JDBC
    partitioned-read contract, queries/etl_q.py:154).  Without a
    partition column the whole table comes over one connection."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if partition_column is None:
        wheres = [""]
    else:
        if lower is None or upper is None or num_partitions < 1:
            raise ValueError("partitioned read needs lower/upper/num_partitions")
        span = max(1, (int(upper) - int(lower) + num_partitions) // num_partitions)
        bounds = [int(lower) + i * span for i in range(1, num_partitions)]
        edges = [None, *bounds, None]
        wheres = []
        for lo, hi in zip(edges[:-1], edges[1:]):
            conds = []
            if lo is not None:
                conds.append(f"{partition_column} >= {lo}")
            if hi is not None:
                conds.append(f"{partition_column} < {hi}")
            wheres.append(f" WHERE {' AND '.join(conds)}" if conds else "")

    # string columns come straight through CSV; binary/nested/boolean get
    # a text staging column then a JVM-side decode back to the declared
    # type (Postgres COPY CSV spells booleans `t`/`f`, which from_csv
    # would null out).
    stage_fields, decode_cols = [], []
    for f_ in schema.fields:
        if isinstance(f_.dataType, T.BooleanType):
            stage_fields.append(T.StructField(f_.name, T.StringType(), True))
            decode_cols.append(
                F.when(
                    F.col(f_.name).isNotNull(),
                    F.col(f_.name).isin("t", "true", "TRUE", "1"),
                ).alias(f_.name)
            )
        elif isinstance(f_.dataType, (T.TimestampType, T.TimestampNTZType)):
            # COPY out trims trailing zeros ("23:59:59", "…59.5"); the
            # fixed-width from_csv format would null those, but the
            # string→timestamp CAST takes variable-length fractions.
            stage_fields.append(T.StructField(f_.name, T.StringType(), True))
            decode_cols.append(F.col(f_.name).cast(f_.dataType).alias(f_.name))
        elif isinstance(f_.dataType, T.BinaryType):
            stage_fields.append(T.StructField(f_.name, T.StringType(), True))
            decode_cols.append(
                F.unhex(F.expr(f"substring(`{f_.name}`, 3)")).alias(f_.name)
            )
        elif isinstance(f_.dataType, (T.ArrayType, T.MapType, T.StructType)):
            stage_fields.append(T.StructField(f_.name, T.StringType(), True))
            decode_cols.append(
                F.from_json(F.col(f_.name), f_.dataType).alias(f_.name)
            )
        else:
            stage_fields.append(T.StructField(f_.name, f_.dataType, True))
            decode_cols.append(F.col(f_.name))
    stage_schema = T.StructType(stage_fields)

    conninfo = dict(conninfo)
    ranges = spark.createDataFrame(
        [(i, w) for i, w in enumerate(wheres)], "part int, whereclause string"
    ).repartition(len(wheres), "part")

    def _copy_out(batches):
        import pandas as pd

        for pdf in batches:
            for w in pdf["whereclause"]:
                out = run_psql(
                    conninfo,
                    f"COPY (SELECT * FROM {table}{w}) TO STDOUT "
                    f"(FORMAT CSV, NULL '{_PG_NULL}', FORCE_QUOTE *)",
                    tuples_only=False,
                )
                # a quoted field may contain literal newlines, so a
                # physical line is not a record: accumulate until the
                # quote count is even (escape='"' doubles embedded
                # quotes, so every complete record has even parity).
                records, buf, quotes = [], [], 0
                for ln in out.split("\n"):
                    buf.append(ln)
                    quotes += ln.count('"')
                    if quotes % 2 == 0:
                        records.append("\n".join(buf))
                        buf, quotes = [], 0
                if records and records[-1] == "":
                    records.pop()  # trailing newline artifact
                if records:
                    yield pd.DataFrame({"line": records})

    raw = ranges.mapInPandas(_copy_out, schema="line string")
    stage_ddl = ", ".join(
        f"`{f_.name}` {f_.dataType.simpleString()}" for f_ in stage_schema.fields
    )
    parsed = raw.select(
        F.from_csv(F.col("line"), stage_ddl, _CSV_READ_OPTS).alias("r")
    ).select("r.*")
    return parsed.select(*decode_cols)
