"""Live relational round-trip: per-partition SQL writes and a
partitioned SQL reader, exercised against SQLite (Python stdlib — no
driver jar, no server, a REAL SQL engine with real locking).

The reference's sink is a row-oriented relational load — psycopg2
``executemany`` INSERTs with get-or-create dimension semantics
(populate_db_ru_v1.py:765-769, :184-:226).  The repo substitutes
parquet/`saveAsTable` for bulk analytics and pins the ``df.write.jdbc``
call shape in a skip-marked test (no JDBC-reachable server in the
sandbox); THIS module closes the remaining gap by running the full
relational protocol against a live SQL engine:

* ``write_relational``: the ``df.write.jdbc`` execution model made
  explicit — the driver creates the table once, then EVERY PARTITION
  opens its own connection and writes one transaction (numPartitions
  concurrent writers contending on the real database lock, absorbed by
  WAL mode + busy_timeout).  Task retries are the reason plain INSERT
  is not enough on any engine: Spark gives at-least-once task
  execution, so idempotent statement forms — ``upsert`` (INSERT OR
  REPLACE on the PK) and ``ignore`` (INSERT OR IGNORE on the natural
  key, the reference's get-or-create dim shape) — are the default
  posture; ``append`` exists and documents its non-idempotence.
* ``SqliteRelationDataSource``: the JDBC *partitioned read* model as a
  Spark-4 Python Data Source — the driver reads only metadata (schema
  from PRAGMA table_info, rowid bounds), and each task SELECTs its own
  rowid range executor-side.  ``spark.read.format("sqlite_relation")
  .options(path=db, table=t, partitions=8).load()``.

On a cluster the same two shapes point at Postgres/MySQL through a
connection factory; SQLite is the engine that makes them TESTABLE here
(file path must be visible to executors — local mode / shared FS).

Type mapping is the faithful subset both engines share: integral ->
INTEGER, floating -> REAL, boolean -> INTEGER 0/1, date/timestamp ->
ISO TEXT, binary -> BLOB, everything else -> TEXT.  Loud refusal on
array/map/struct columns — silently stringifying nested data into a
relational sink is a data bug, not a convenience.
"""

from __future__ import annotations

import re
import sqlite3
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

_BATCH = 1_000
_BUSY_MS = 30_000


def _sqlite_type(dt) -> str:
    name = dt.simpleString()
    if name in ("tinyint", "smallint", "int", "bigint", "boolean"):
        return "INTEGER"
    if name in ("float", "double"):
        return "REAL"
    if name.startswith("decimal"):
        return "TEXT"  # exact decimal travels as text, never a lossy REAL
    if name == "binary":
        return "BLOB"
    if name in ("string", "date", "timestamp", "timestamp_ntz"):
        return "TEXT"
    raise TypeError(
        f"write_relational refuses column type {name!r}: nested/exotic types "
        f"do not have a faithful relational form — project them to scalars "
        f"(to_json / explode) before the sink"
    )


def _to_sql(v):
    import datetime
    import decimal

    if isinstance(v, bool):
        return int(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) else v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    return v


def _connect(db_path: str) -> sqlite3.Connection:
    con = sqlite3.connect(db_path, timeout=_BUSY_MS / 1000)
    con.execute(f"PRAGMA busy_timeout={_BUSY_MS}")
    return con


def write_relational(
    df: DataFrame,
    db_path: str,
    table: str,
    key_cols: Sequence[str] | None = None,
    mode: str = "upsert",
    overwrite: bool = False,
) -> None:
    """Write ``df`` into SQLite table ``table`` at ``db_path``.

    mode='upsert'  INSERT OR REPLACE — requires ``key_cols`` (the PK);
                   retry-safe and re-run-safe (last write wins per key).
    mode='ignore'  INSERT OR IGNORE — requires ``key_cols``; first write
                   wins: the reference's get-or-create dimension load.
    mode='append'  plain INSERT — NOT task-retry-idempotent; only for
                   sinks with external exactly-once accounting.

    ``overwrite=True`` clears existing rows first (driver-side, before
    any task runs).  The table is created if absent, typed from the
    DataFrame schema, with PRIMARY KEY(key_cols) when given.
    """
    if mode in ("upsert", "ignore") and not key_cols:
        raise ValueError(f"mode={mode!r} needs key_cols (the idempotency key)")
    if mode not in ("upsert", "ignore", "append"):
        raise ValueError(f"unknown mode {mode!r}")
    if not table.replace("_", "").isalnum():
        raise ValueError(f"suspicious table name {table!r}")
    cols = df.schema.fields
    # Column names get interpolated into CREATE TABLE / INSERT SQL, so
    # they need the same identifier validation as the table name — a
    # name containing a double quote would break (or inject into) the
    # statement despite the quote-wrapping.
    for f in cols:
        if not f.name.replace("_", "").isalnum():
            raise ValueError(f"suspicious column name {f.name!r}")
    col_defs = ", ".join(f'"{f.name}" {_sqlite_type(f.dataType)}' for f in cols)
    if key_cols:
        missing = set(key_cols) - {f.name for f in cols}
        if missing:
            raise ValueError(f"key_cols not in DataFrame: {sorted(missing)}")
        col_defs += ", PRIMARY KEY (" + ", ".join(f'"{k}"' for k in key_cols) + ")"
    con = _connect(db_path)
    try:
        con.execute("PRAGMA journal_mode=WAL")  # concurrent partition writers
        con.execute(f'CREATE TABLE IF NOT EXISTS "{table}" ({col_defs})')
        if overwrite:
            con.execute(f'DELETE FROM "{table}"')
        con.commit()
    finally:
        con.close()

    names = [f.name for f in cols]
    verb = {"upsert": "INSERT OR REPLACE", "ignore": "INSERT OR IGNORE", "append": "INSERT"}[mode]
    sql = (
        f'{verb} INTO "{table}" ('
        + ", ".join(f'"{n}"' for n in names)
        + ") VALUES ("
        + ", ".join("?" for _ in names)
        + ")"
    )

    def _write_partition(rows) -> None:
        import sqlite3 as _sq

        con = _sq.connect(db_path, timeout=_BUSY_MS / 1000)
        con.execute(f"PRAGMA busy_timeout={_BUSY_MS}")
        try:
            buf = []
            for row in rows:
                buf.append(tuple(_to_sql(row[n]) for n in names))
                if len(buf) >= _BATCH:
                    con.executemany(sql, buf)
                    buf.clear()
            if buf:
                con.executemany(sql, buf)
            con.commit()  # one transaction per partition (per task attempt)
        finally:
            con.close()

    df.foreachPartition(_write_partition)


class _RowidRange(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class _SqliteRelationReader(DataSourceReader):
    """Partitioned read: driver touches METADATA only (PRAGMA schema,
    rowid bounds); each task SELECTs its rowid slice with its own
    connection — the JDBC partitionColumn/lowerBound/upperBound model
    with rowid as the free partition column."""

    def __init__(self, options: dict):
        self._db = options.get("path")
        self._table = options.get("table")
        if not self._db or not self._table:
            raise ValueError("sqlite_relation requires options path=<db file> and table=<name>")
        if not self._table.replace("_", "").isalnum():
            raise ValueError(f"suspicious table name {self._table!r}")
        self._n = max(int(options.get("partitions", "4")), 1)
        con = _connect(self._db)
        try:
            self._cols = [r[1] for r in con.execute(f'PRAGMA table_info("{self._table}")')]
            if not self._cols:
                raise ValueError(f"table {self._table!r} not found in {self._db!r}")
            lo_hi = con.execute(f'SELECT min(rowid), max(rowid) FROM "{self._table}"').fetchone()
        finally:
            con.close()
        self._bounds = lo_hi if lo_hi and lo_hi[0] is not None else None

    def partitions(self) -> list[_RowidRange]:
        if self._bounds is None:
            return [_RowidRange(1, 0)]  # empty table: one no-op partition
        lo, hi = self._bounds
        n = min(self._n, hi - lo + 1)
        step = (hi - lo + 1 + n - 1) // n
        return [_RowidRange(lo + i * step, min(lo + (i + 1) * step - 1, hi)) for i in range(n)]

    def read(self, part: _RowidRange) -> Iterator[tuple]:
        if part.lo > part.hi:
            return
        con = _connect(self._db)
        try:
            cols = ", ".join(f'"{c}"' for c in self._cols)
            cur = con.execute(
                f'SELECT {cols} FROM "{self._table}" WHERE rowid BETWEEN ? AND ?',
                (part.lo, part.hi),
            )
            yield from cur
        finally:
            con.close()


class SqliteRelationDataSource(DataSource):
    """``spark.read.format("sqlite_relation").options(path=..., table=...,
    partitions=8).load()`` — schema introspected from the live table
    (declared SQLite column types -> bigint/double/string; SQLite's
    dynamic typing means anything else is surfaced as string rather than
    guessed)."""

    @classmethod
    def name(cls) -> str:
        return "sqlite_relation"

    def schema(self) -> str:
        db, table = self.options.get("path"), self.options.get("table")
        if not db or not table:
            raise ValueError("sqlite_relation requires options path=<db file> and table=<name>")
        if not table.replace("_", "").isalnum():
            raise ValueError(f"suspicious table name {table!r}")
        con = _connect(db)
        try:
            info = list(con.execute(f'PRAGMA table_info("{table}")'))
        finally:
            con.close()
        if not info:
            raise ValueError(f"table {table!r} not found in {db!r}")

        def spark_type(decl: str) -> str:
            d = (decl or "").upper()
            if "INT" in d:
                return "bigint"
            if "REAL" in d or "FLOA" in d or "DOUB" in d:
                return "double"
            if "BLOB" in d:
                return "binary"
            return "string"

        return ", ".join(f"{r[1]} {spark_type(r[2])}" for r in info)

    def reader(self, schema) -> _SqliteRelationReader:
        return _SqliteRelationReader(self.options)

    def writer(self, schema, overwrite: bool) -> "_SqliteRelationWriter":
        return _SqliteRelationWriter(self.options, schema, overwrite)


class _Staged(WriterCommitMessage):
    """One committed task attempt: its private staging table + row count."""

    def __init__(self, staging: str, rows: int):
        self.staging, self.rows = staging, rows


class _SqliteRelationWriter(DataSourceWriter):
    """The WRITE half of the Spark-4 Python Data Source — and the piece
    that upgrades the relational sink from at-least-once to EXACTLY-ONCE:
    the full staged-commit protocol.

    * ``write`` (executor-side, once per task ATTEMPT) inserts its rows
      into a private staging table named with a fresh uuid — a retried
      or speculatively-duplicated attempt writes a DIFFERENT staging
      table and never touches the target.
    * ``commit`` (driver-side, exactly once, only with the commit
      message of each task's ONE successful attempt) publishes all
      staged rows into the target inside a single transaction —
      overwrite's DELETE rides in the same transaction, so readers see
      the old table or the new one, never a mix — then drops every
      ``_stg_<table>_<uuid>`` leftover (exact-regex matched, so other
      targets' staging tables are never touched), including orphans
      from failed attempts.
    * ``abort`` best-effort-drops the staging tables of whatever
      messages arrived.

    This is the same write/commit/abort contract ``df.write.jdbc`` can
    NOT give (plain JDBC inserts publish per-task); modeled here against
    a live SQL engine so the protocol is actually testable.  Usage:
    ``df.write.format("sqlite_relation").options(path=db, table=t)
    .mode("append"|"overwrite").save()``.
    """

    def __init__(self, options: dict, schema, overwrite: bool):
        self._db = options.get("path")
        self._table = options.get("table")
        if not self._db or not self._table:
            raise ValueError("sqlite_relation requires options path=<db file> and table=<name>")
        if not self._table.replace("_", "").isalnum():
            raise ValueError(f"suspicious table name {self._table!r}")
        for f in schema.fields:
            if not f.name.replace("_", "").isalnum():
                raise ValueError(f"suspicious column name {f.name!r}")
        self._names = [f.name for f in schema.fields]
        self._overwrite = overwrite
        col_defs = ", ".join(f'"{f.name}" {_sqlite_type(f.dataType)}' for f in schema.fields)
        con = _connect(self._db)
        try:
            con.execute("PRAGMA journal_mode=WAL")  # concurrent task writers
            con.execute(f'CREATE TABLE IF NOT EXISTS "{self._table}" ({col_defs})')
            con.commit()
        finally:
            con.close()

    def write(self, iterator) -> _Staged:
        import uuid

        staging = f"_stg_{self._table}_{uuid.uuid4().hex}"
        cols = ", ".join(f'"{n}"' for n in self._names)
        sql = (
            f'INSERT INTO "{staging}" ({cols}) VALUES ('
            + ", ".join("?" for _ in self._names)
            + ")"
        )
        con = _connect(self._db)
        n = 0
        try:
            con.execute(
                f'CREATE TABLE "{staging}" AS SELECT {cols} FROM "{self._table}" WHERE 0'
            )
            buf = []
            for row in iterator:
                buf.append(tuple(_to_sql(row[c]) for c in self._names))
                n += 1
                if len(buf) >= _BATCH:
                    con.executemany(sql, buf)
                    buf.clear()
            if buf:
                con.executemany(sql, buf)
            con.commit()  # the attempt's staging table becomes durable
        finally:
            con.close()
        return _Staged(staging, n)

    def commit(self, messages) -> None:
        con = _connect(self._db)
        cols = ", ".join(f'"{n}"' for n in self._names)
        try:
            cur = con.cursor()
            cur.execute("BEGIN IMMEDIATE")  # one atomic publish
            if self._overwrite:
                cur.execute(f'DELETE FROM "{self._table}"')
            winners = {m.staging for m in messages}
            for staging in sorted(winners):
                cur.execute(
                    f'INSERT INTO "{self._table}" ({cols}) SELECT {cols} FROM "{staging}"'
                )
            con.commit()
            # outside the publish transaction: drop winners AND any
            # orphaned staging tables from failed/duplicate attempts.
            # Match in Python with an exact regex, NOT with LIKE: in
            # SQLite LIKE, '_' is a single-char wildcard, so
            # '_stg_a_%' also matches '_stg_ab_<uuid>' — committing
            # table 'a' would destroy a concurrent in-flight write to
            # table 'ab' before its commit.  The anchored pure-hex
            # suffix (staging suffixes are uuid4().hex) also keeps
            # table names that are prefixes of one another ('a' vs
            # 'a_b') from cross-matching: the residue 'b_<hex>'
            # contains '_', which hex rejects.
            pat = re.compile(rf"^_stg_{re.escape(self._table)}_[0-9a-f]+$")
            leftovers = [
                r[0]
                for r in con.execute(
                    "SELECT name FROM sqlite_master WHERE type='table'"
                )
                if pat.match(r[0])
            ]
            for t in leftovers:
                con.execute(f'DROP TABLE IF EXISTS "{t}"')
            con.commit()
        finally:
            con.close()

    def abort(self, messages) -> None:
        try:
            con = _connect(self._db)
            try:
                for m in messages:
                    con.execute(f'DROP TABLE IF EXISTS "{m.staging}"')
                con.commit()
            finally:
                con.close()
        except Exception:
            pass  # abort is best-effort by contract


_BATCH_LOG = "_spark_batch_log"


def stream_relational_sink(
    stream_df: DataFrame,
    db_path: str,
    table: str,
    key_cols: Sequence[str],
    checkpoint_dir: str,
    mode: str = "upsert",
):
    """Streaming half of the relational sink: ``writeStream.foreachBatch``
    into ``write_relational``, with a per-batch ledger making replays
    visible and cheap.

    Delivery contract, stated honestly (the part most foreachBatch sinks
    leave implicit): Spark re-executes a micro-batch whose epoch commit
    was lost, so the sink sees at-least-once BATCHES.  Three layers turn
    that into effective exactly-once here:

    1. idempotent statements — ``upsert``/``ignore`` make a re-written
       batch a no-op at the ROW level (this alone is sufficient
       correctness for those modes; ``append`` is refused, since a
       replayed append would double rows and no ledger can fix the
       crash-between-write-and-ledger window);
    2. the ``_spark_batch_log`` ledger ((table, batch_id), written after
       the data in its own transaction) — a FULLY committed batch that
       Spark replays anyway (checkpoint lag) is SKIPPED without touching
       the data, which at scale is the difference between a no-op and
       re-upserting millions of rows;
    3. the stream's own checkpoint, which bounds replay to the last
       uncommitted epoch.

    Returns the ``DataStreamWriter`` (caller picks trigger and starts),
    e.g.::

        q = stream_relational_sink(ev, db, "events_sink", ["event_id"],
                                   ckpt).trigger(availableNow=True).start()
    """
    if mode == "append":
        raise ValueError(
            "append mode cannot be made replay-safe (a re-executed batch "
            "doubles rows); use upsert/ignore, or add an external "
            "exactly-once ledger around the whole write"
        )
    handler = relational_batch_handler(db_path, table, key_cols, mode)
    return stream_df.writeStream.foreachBatch(handler).option(
        "checkpointLocation", checkpoint_dir
    )


def relational_batch_handler(
    db_path: str, table: str, key_cols: Sequence[str], mode: str = "upsert"
):
    """The ``foreachBatch`` function behind ``stream_relational_sink``,
    exposed so the replay contract is directly testable: calling it
    twice with the same ``batch_id`` writes once — the second call sees
    the ledger row and returns without touching the table."""

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        con = _connect(db_path)
        try:
            con.execute(
                f'CREATE TABLE IF NOT EXISTS "{_BATCH_LOG}" '
                "(tbl TEXT, batch_id INTEGER, PRIMARY KEY (tbl, batch_id))"
            )
            con.commit()
            seen = con.execute(
                f'SELECT 1 FROM "{_BATCH_LOG}" WHERE tbl = ? AND batch_id = ?',
                (table, batch_id),
            ).fetchone()
        finally:
            con.close()
        if seen:
            return  # fully committed batch replayed by the engine: skip
        write_relational(batch_df, db_path, table, key_cols=key_cols, mode=mode)
        con = _connect(db_path)
        try:
            con.execute(
                f'INSERT OR IGNORE INTO "{_BATCH_LOG}" VALUES (?, ?)',
                (table, batch_id),
            )
            con.commit()
        finally:
            con.close()

    return _handle
