"""LIVE JDBC round-trip against embedded Derby.

The reference's only empirically-exercised path is a JDBC metadata
roundtrip against docker-composed databases
(/root/reference/docker/docker-compose.yml:1-54, /root/reference/
etl_job.log). No network databases exist in this image, but Spark ships
the Derby jars (its Hive-metastore backend), so an embedded Derby
database gives the same JDBC code paths — DriverManager, dialect SQL
generation, partitioned reads, batched writes — a real in-JVM database
to run against. Every option flowing through here is identical to what
the mysql/postgres/oracle/mssql dialects would send.
"""

from __future__ import annotations

import pytest

from etl_job_applify_spark.sinks.writers import write_jdbc
from etl_job_applify_spark.sources.catalog import show_tables, table_names
from etl_job_applify_spark.sources.jdbc import JdbcSource


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    # Derby drops engine-level artifacts (derby.log, and a junk "null"
    # database directory after FAILED boots) into derby.system.home,
    # which defaults to user.dir — pin it to a temp dir BEFORE the first
    # connection boots the embedded engine so the repo stays clean
    home = tmp_path_factory.mktemp("derby_home")
    spark._jvm.java.lang.System.setProperty("derby.system.home", str(home))
    db_dir = tmp_path_factory.mktemp("derby") / "testdb"
    return JdbcSource(
        dialect="derby",
        host="",  # embedded: no host/port, database is the on-disk path
        database=str(db_dir),
        user="app",
        password="app",
    )


@pytest.fixture(scope="module")
def seeded(spark, derby):
    """Write a 1 000-row table through the batched JDBC sink (W1)."""
    df = spark.range(1000).selectExpr(
        "id",
        "id * 2 AS v",
        "concat('name_', id) AS name",
    )
    write_jdbc(
        df,
        url=derby.url,
        table="items",
        user=derby.user,
        password=derby.password,
        driver=derby.driver,
        mode="overwrite",
        batch_size=200,
        num_partitions=4,
    )
    return derby


def test_check_connection_live(spark, seeded):
    """S5 probe executes a real dialect probe query end to end."""
    assert seeded.check_connection(spark)


def test_check_connection_bad_database(spark, derby, tmp_path):
    # create=true is in the URL template, so point at an unwritable path
    # (depends on the derby fixture so derby.system.home is pinned before
    # this failed boot — Derby leaves a junk "null" db dir there)
    bad = JdbcSource(
        dialect="derby",
        host="",
        database="/proc/definitely/not/writable/db",
        user="app",
        password="app",
    )
    assert not bad.check_connection(spark)


def test_partitioned_read_roundtrip(spark, seeded):
    """S4: the partitioned scan opens numPartitions parallel range slices
    and the union equals what was written."""
    got = seeded.read_table(
        spark,
        "items",
        partition_column="id",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
    )
    assert got.rdd.getNumPartitions() == 4
    agg = got.selectExpr(
        "count(*) AS n", "sum(v) AS sv", "min(name) AS mn"
    ).collect()[0]
    assert agg.n == 1000
    assert agg.sv == 2 * sum(range(1000))
    assert agg.mn == "name_0"


def test_pushed_query(spark, seeded):
    """Arbitrary SQL pushed down to the database, evaluated by Derby.

    Spark's JDBC writer CREATEs with quoted identifiers, so the columns
    are case-sensitive lower-case in Derby — pushed SQL must quote them
    (same as against any database whose tables Spark created).
    """
    rows = seeded.read_query(
        spark, 'SELECT count(*) AS n FROM items WHERE "id" < 10'
    ).collect()
    # Derby uppercases the unquoted alias — read positionally
    assert rows[0][0] == 10


def test_append_then_read(spark, seeded):
    extra = spark.range(1000, 1100).selectExpr(
        "id", "id * 2 AS v", "concat('name_', id) AS name"
    )
    write_jdbc(
        extra,
        url=seeded.url,
        table="items",
        user=seeded.user,
        password=seeded.password,
        driver=seeded.driver,
        mode="append",
        num_partitions=2,
    )
    got = seeded.read_table(
        spark,
        "items",
        partition_column="id",
        lower_bound=0,
        upper_bound=1100,
        num_partitions=3,
    )
    assert got.count() == 1100


def test_show_tables_live(spark, seeded):
    """S6 catalog listing via pushed sys.systables query."""
    names = table_names(show_tables(spark, seeded))
    assert "ITEMS" in {n.upper() for n in names}


# --- control-plane statement execution (the COPY-pattern primitive) ------


def test_execute_statement_live(spark, derby, tmp_path):
    """DDL + DML round trip through the raw java.sql path that
    write_redshift's default executor uses."""
    from etl_job_applify_spark.sinks import execute_statement

    url = derby.url
    execute_statement(
        spark, url, "CREATE TABLE ctl_probe (id INT, name VARCHAR(20))"
    )
    n = execute_statement(
        spark, url, "INSERT INTO ctl_probe VALUES (1, 'a'), (2, 'b')"
    )
    assert n == 2
    got = derby.read_query(
        spark, "SELECT COUNT(*) AS n FROM ctl_probe"
    ).collect()
    assert got[0][0] == 2


def test_transactional_publish_atomic_swap(spark, derby, seeded):
    """write_jdbc_transactional: stage → one-transaction swap. The
    target shows exactly the new rows afterwards; a failing transaction
    rolls back and leaves the target untouched (LIVE Derby)."""
    import pytest
    from pyspark.sql import functions as F

    from etl_job_applify_spark.sinks.redshift import (
        execute_statement,
        execute_transaction,
        write_jdbc_transactional,
    )

    execute_statement(
        spark, derby.url,
        "CREATE TABLE pub_t (id INT, v DOUBLE)", derby.user, derby.password,
    )
    execute_statement(
        spark, derby.url,
        "INSERT INTO pub_t VALUES (999, 0.0)", derby.user, derby.password,
    )
    df = spark.range(5).select(
        F.col("id").cast("int"), (F.col("id") * 1.5).alias("v")
    )
    write_jdbc_transactional(
        df, derby.url, "pub_t", "pub_stage",
        derby.user, derby.password, derby.driver,
    )
    out = (
        spark.read.format("jdbc")
        .option("url", derby.url)
        .option("dbtable", "pub_t")
        .option("user", derby.user)
        .option("password", derby.password)
        .option("driver", derby.driver)
        .load()
        .collect()
    )
    assert {r["ID"] for r in out} == {0, 1, 2, 3, 4}  # 999 swapped out
    # rollback: second statement fails -> the delete must not stick
    with pytest.raises(Exception):
        execute_transaction(
            spark, derby.url,
            ["DELETE FROM pub_t", "INSERT INTO pub_t SELECT * FROM no_such"],
            derby.user, derby.password,
        )
    assert (
        spark.read.format("jdbc")
        .option("url", derby.url).option("dbtable", "pub_t")
        .option("user", derby.user).option("password", derby.password)
        .option("driver", derby.driver).load().count()
        == 5
    )


def test_cdc_out_to_jdbc_live(spark, derby, tmp_path):
    """Lake CDF → Derby serving table: inserts, updates and deletes land
    transactionally; a second cycle with no new commits is a no-op; the
    end state matches the lake table exactly (LIVE Derby)."""
    from pyspark.sql import functions as F

    from etl_job_applify_spark.sinks import write_version
    from etl_job_applify_spark.sinks.changes import sync_changes_to_jdbc
    from etl_job_applify_spark.sinks.redshift import execute_statement

    lake = str(tmp_path / "lake")
    cursor = str(tmp_path / "cursor.json")
    execute_statement(
        spark, derby.url,
        "CREATE TABLE serve_t (id INT, v DOUBLE)", derby.user, derby.password,
    )

    def jdbc_read():
        return {
            r["ID"]: r["V"]
            for r in spark.read.format("jdbc")
            .option("url", derby.url).option("dbtable", "serve_t")
            .option("user", derby.user).option("password", derby.password)
            .option("driver", derby.driver).load().collect()
        }

    base = spark.range(10).select(
        F.col("id").cast("int"), (F.col("id") * 1.0).alias("v")
    )
    write_version(base, lake)  # v1
    args = dict(
        keys=["id"], url=derby.url, table="serve_t",
        staging_table="serve_stage", user=derby.user,
        password=derby.password, driver=derby.driver,
    )
    n1 = sync_changes_to_jdbc(spark, lake, cursor, **args)
    assert n1 == 10 and jdbc_read() == {i: float(i) for i in range(10)}
    # v2: drop odds, bump evens
    write_version(
        base.filter(F.col("id") % 2 == 0).withColumn("v", F.col("v") + 100),
        lake,
    )
    n2 = sync_changes_to_jdbc(spark, lake, cursor, **args)
    assert n2 == 10  # 5 deletes + 5 post-images
    assert jdbc_read() == {i: i + 100.0 for i in range(0, 10, 2)}
    # idle cycle is a no-op
    assert sync_changes_to_jdbc(spark, lake, cursor, **args) == 0
