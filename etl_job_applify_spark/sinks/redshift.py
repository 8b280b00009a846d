"""Redshift (and warehouse-alike) sink via the stage-then-COPY pattern.

The reference's Redshift path is an empty stub (services/data_store.py —
a ``pass`` body). The production pattern it gestured at is NOT row-wise
JDBC insert (a 1000-task stage opening 1000 warehouse connections is how
you take down a cluster): it is

1. stage the DataFrame to the lake as parquet (fully distributed write,
   every executor participates), then
2. issue ONE control-plane ``COPY table FROM staging`` statement over
   JDBC — the warehouse ingests the staged files with its own massively
   parallel loader.

The staging write and statement generation are engine-side and fully
tested; statement EXECUTION goes through ``execute_statement`` (a plain
java.sql round trip via the session JVM), which is live-tested against
embedded Derby in tests/test_jdbc_live.py. No Redshift exists in this
image, so ``write_redshift`` accepts any executor callable — the default
uses the real JDBC path.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


def execute_statement(
    spark: SparkSession,
    url: str,
    sql: str,
    user: str | None = None,
    password: str | None = None,
) -> int:
    """Run one DDL/DML statement over JDBC from the driver (control
    plane: COPY/TRUNCATE/GRANT — never data-plane row transfer). Returns
    the update count (-1 for statements without one)."""
    jvm = spark._jvm
    if user is not None:
        conn = jvm.java.sql.DriverManager.getConnection(url, user, password)
    else:
        conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        stmt = conn.createStatement()
        try:
            has_rs = stmt.execute(sql)
            return -1 if has_rs else stmt.getUpdateCount()
        finally:
            stmt.close()
    finally:
        conn.close()


_IDENT_CHARS = set("abcdefghijklmnopqrstuvwxyz" "ABCDEFGHIJKLMNOPQRSTUVWXYZ" "0123456789_.$\"")


def _quote_literal(value: str) -> str:
    """SQL string literal: wrap in single quotes, doubling embedded ones."""
    return "'" + value.replace("'", "''") + "'"


def _check_identifier(table: str) -> str:
    """Reject table names that could break out of identifier position.

    Accepts plain/dotted/quoted identifiers (``schema.table``,
    ``"Mixed.Case"``); anything with quotes must balance, and no other
    punctuation or whitespace is allowed.
    """
    if not table or not set(table) <= _IDENT_CHARS or table.count('"') % 2:
        raise ValueError(f"invalid table identifier: {table!r}")
    return table


def copy_statements(
    table: str,
    staging_path: str,
    iam_role: str | None = None,
    mode: str = "append",
    region: str | None = None,
) -> list[str]:
    """The exact statements a Redshift load issues (unit-testable without
    a warehouse). ``overwrite`` truncates first — in production wrap both
    in one transaction or load into a swap table. String values are
    quoted/escaped and the table identifier validated, so a value
    containing a quote cannot break or extend the statement."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    table = _check_identifier(table)
    copy = f"COPY {table} FROM {_quote_literal(staging_path)} FORMAT AS PARQUET"
    if iam_role:
        copy += f" IAM_ROLE {_quote_literal(iam_role)}"
    if region:
        copy += f" REGION {_quote_literal(region)}"
    out = []
    if mode == "overwrite":
        out.append(f"TRUNCATE {table}")
    out.append(copy)
    return out


def write_redshift(
    df: DataFrame,
    table: str,
    staging_path: str,
    url: str,
    user: str,
    password: str,
    iam_role: str | None = None,
    mode: str = "append",
    region: str | None = None,
    execute: Callable[[str], object] | None = None,
) -> Sequence[str]:
    """Stage ``df`` as parquet then COPY it into the warehouse table.

    ``execute``: statement executor, defaulting to the live JDBC path
    (``execute_statement``); injectable so deployments can route through
    their connection pooling / secrets handling, and so tests can record
    the statements. Returns the statements issued, in order.
    """
    df.write.mode("overwrite").parquet(staging_path)
    stmts = copy_statements(table, staging_path, iam_role, mode, region)
    if execute is None:
        spark = df.sparkSession

        def execute(sql: str):  # pragma: no cover - needs a warehouse
            return execute_statement(spark, url, sql, user, password)

    for sql in stmts:
        execute(sql)
    return stmts


def execute_transaction(
    spark: SparkSession,
    url: str,
    statements: Sequence[str],
    user: str | None = None,
    password: str | None = None,
) -> list[int]:
    """Run several DDL/DML statements in ONE JDBC transaction
    (autocommit off; commit after the last, rollback on any failure).
    Control plane only — the atomicity primitive the swap-publish
    pattern needs. Returns per-statement update counts."""
    jvm = spark._jvm
    if user is not None:
        conn = jvm.java.sql.DriverManager.getConnection(url, user, password)
    else:
        conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        conn.setAutoCommit(False)
        counts = []
        try:
            stmt = conn.createStatement()
            try:
                for sql in statements:
                    has_rs = stmt.execute(sql)
                    counts.append(-1 if has_rs else stmt.getUpdateCount())
            finally:
                stmt.close()
            conn.commit()
            return counts
        except Exception:
            conn.rollback()
            raise
    finally:
        conn.close()


def publish_statements(table: str, staging_table: str) -> list[str]:
    """The atomic-swap publish: replace ``table``'s contents with
    ``staging_table``'s inside one transaction (readers see the old rows
    or the new rows, never a half-loaded table — the property plain
    overwrite-mode JDBC writes do NOT have). Both identifiers
    validated."""
    table = _check_identifier(table)
    staging_table = _check_identifier(staging_table)
    return [
        f"DELETE FROM {table}",
        f"INSERT INTO {table} SELECT * FROM {staging_table}",
    ]


def write_jdbc_transactional(
    df: DataFrame,
    url: str,
    table: str,
    staging_table: str,
    user: str,
    password: str,
    driver: str,
) -> list[str]:
    """Exactly-once warehouse publish: stage ``df`` with a distributed
    JDBC write (overwrite — staging is private to this job), then swap
    into ``table`` via ONE transaction. A crash before the commit leaves
    the target untouched; a re-run republishes the same content —
    idempotent end state. Returns the statements executed."""
    from .writers import write_jdbc

    write_jdbc(
        df, url, staging_table, user, password, driver, mode="overwrite"
    )
    stmts = publish_statements(table, staging_table)
    execute_transaction(df.sparkSession, url, stmts, user, password)
    return stmts
