"""Partitioned JDBC source (reference parity: S4/S5/S7).

The reference's JDBC reads (services/data_source.py:78-91) are
single-partition — one executor pulls the whole table; its ODBC path
(services/data_source.py:170-183) is worse, materializing every row on the
driver before ``createDataFrame``. Both cap at one node's memory.

This source fixes that: every read is partitioned
(``partitionColumn/lowerBound/upperBound/numPartitions``) so N executors
each pull a key-range slice in parallel. The ODBC driver-materialization
path is deliberately dropped; small control-plane result sets can still be
lifted with ``rows_to_dataframe``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Row, SparkSession

#: per-dialect JDBC URL templates + driver classes (reference
#: DATABASE_CONFIG, lambda_function.py:30-51 — templates only; jars are
#: deployment concerns)
#: ``probe`` is the dialect's cheapest no-table round-trip — ``SELECT 1``
#: is not portable (Oracle needs ``FROM dual``, Derby ``SYSIBM.SYSDUMMY1``)
DIALECTS = {
    "mysql": {
        "url": "jdbc:mysql://{host}:{port}/{database}",
        "driver": "com.mysql.cj.jdbc.Driver",
        "default_port": 3306,
        "probe": "SELECT 1 AS test_column",
    },
    "postgres": {
        "url": "jdbc:postgresql://{host}:{port}/{database}",
        "driver": "org.postgresql.Driver",
        "default_port": 5432,
        "probe": "SELECT 1 AS test_column",
    },
    "oracle": {
        "url": "jdbc:oracle:thin:@{host}:{port}:{database}",
        "driver": "oracle.jdbc.driver.OracleDriver",
        "default_port": 1521,
        "probe": "SELECT 1 AS test_column FROM dual",
    },
    "mssql": {
        "url": "jdbc:sqlserver://{host}:{port};databaseName={database}",
        "driver": "com.microsoft.sqlserver.jdbc.SQLServerDriver",
        "default_port": 1433,
        "probe": "SELECT 1 AS test_column",
    },
    # Embedded Derby: in-JVM database, no host/port — ``database`` is the
    # on-disk db directory. The Derby jars ship inside Spark itself (its
    # Hive-metastore backend), which makes this the one dialect whose
    # read/write/catalog paths are LIVE-tested in CI (tests/test_jdbc_live
    # .py) rather than option-construction-only; the network dialects
    # above exercise the exact same code path.
    "derby": {
        "url": "jdbc:derby:{database};create=true",
        "driver": "org.apache.derby.jdbc.EmbeddedDriver",
        "default_port": 0,
        "probe": "SELECT 1 AS test_column FROM SYSIBM.SYSDUMMY1",
    },
}


def jdbc_reader_options(
    url: str,
    user: str,
    password: str,
    driver: str,
    table: str | None = None,
    query: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
) -> dict[str, str]:
    """Option dict for ``spark.read.format("jdbc")`` with parallel-scan
    settings. Exactly one of ``table``/``query``."""
    if bool(table) == bool(query):
        raise ValueError("exactly one non-empty table/query is required")
    opts: dict[str, str] = {
        "url": url,
        "user": user,
        "password": password,
        "driver": driver,
        "fetchsize": str(fetch_size),
    }
    if table:
        opts["dbtable"] = table
    else:
        opts["query"] = query  # type: ignore[assignment]
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound/upper_bound/num_partitions"
            )
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


@dataclass
class JdbcSource:
    """A JDBC database as a queryable source.

    >>> src = JdbcSource(dialect="postgres", host="db", database="shop",
    ...                  user="u", password="p")
    >>> df = src.read_table(spark, "orders", partition_column="id",
    ...                     lower_bound=0, upper_bound=10_000_000,
    ...                     num_partitions=64)
    """

    dialect: str
    host: str
    database: str
    user: str
    password: str
    port: int | None = None
    extra_options: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.dialect not in DIALECTS:
            raise ValueError(
                f"unknown dialect {self.dialect!r}; one of {sorted(DIALECTS)}"
            )

    @property
    def url(self) -> str:
        cfg = DIALECTS[self.dialect]
        return cfg["url"].format(
            host=self.host,
            port=self.port or cfg["default_port"],
            database=self.database,
        )

    @property
    def driver(self) -> str:
        return DIALECTS[self.dialect]["driver"]

    def _read(self, spark: SparkSession, opts: dict[str, str]) -> DataFrame:
        reader = spark.read.format("jdbc")
        for k, v in {**opts, **self.extra_options}.items():
            reader = reader.option(k, v)
        return reader.load()

    def read_table(
        self,
        spark: SparkSession,
        table: str,
        partition_column: str | None = None,
        lower_bound: int | None = None,
        upper_bound: int | None = None,
        num_partitions: int | None = None,
    ) -> DataFrame:
        """Distributed table scan. Always pass partitioning for large
        tables — a bare read is a single-task scan."""
        return self._read(
            spark,
            jdbc_reader_options(
                self.url,
                self.user,
                self.password,
                self.driver,
                table=table,
                partition_column=partition_column,
                lower_bound=lower_bound,
                upper_bound=upper_bound,
                num_partitions=num_partitions,
            ),
        )

    def read_query(self, spark: SparkSession, query: str) -> DataFrame:
        """Push an arbitrary SQL query down to the database (reference S6
        pattern: dialect-specific subqueries shipped as the relation)."""
        return self._read(
            spark,
            jdbc_reader_options(
                self.url, self.user, self.password, self.driver, query=query
            ),
        )

    def check_connection(self, spark: SparkSession) -> bool:
        """Probe with the dialect's cheapest pushed query (reference S5,
        services/data_source.py:93-111 — whose ``SELECT 1`` only worked on
        MySQL-ish dialects)."""
        try:
            self.read_query(spark, DIALECTS[self.dialect]["probe"]).collect()
            return True
        except Exception:
            return False


def rows_to_dataframe(
    spark: SparkSession, columns: list[str], rows: list[tuple]
) -> DataFrame:
    """Lift a SMALL driver-side result set (control plane only) into a
    DataFrame — the sanctioned remnant of the reference's ODBC path."""
    return spark.createDataFrame([Row(**dict(zip(columns, r))) for r in rows])
