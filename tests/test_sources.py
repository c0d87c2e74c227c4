"""Dialect contract parity (port of SqlDialectParityTests): every
registered dialect is fully populated and generates well-formed
incremental reads; partitioned-read options split on the version column."""

import pytest

from trignis_spark.config import TrackingObject
from trignis_spark.sources.jdbc import (
    DIALECTS,
    POSTGRES,
    SQLSERVER,
    incremental_query,
    jdbc_options,
)

OBJ_PG = TrackingObject(
    name="sessions",
    database="app",
    table_name="training_sessions_outbox",
    key_columns=("session_id",),
    tracked_columns=("steps", "distance"),
)
OBJ_MSSQL = TrackingObject(
    name="sessions",
    database="app",
    table_name="dbo.TrainingSessions",
    key_columns=("Id",),
    tracked_columns=("Steps", "Distance"),
)


@pytest.mark.parametrize("dialect", list(DIALECTS.values()), ids=lambda d: d.provider)
def test_dialect_fully_populated(dialect):
    # "adding a dialect adds cases here for free"
    assert dialect.provider and dialect.driver and dialect.url_template
    url = dialect.jdbc_url("db.example", 5432, "app")
    assert "db.example" in url and "app" in url
    assert url.startswith("jdbc:")


def test_sqlserver_changetable_join_keeps_deletes():
    q = incremental_query(SQLSERVER, OBJ_MSSQL, from_version=42)
    assert "CHANGETABLE(CHANGES dbo.TrainingSessions, 42)" in q
    assert "LEFT OUTER JOIN" in q  # change side preserved → deletes survive
    assert "SYS_CHANGE_OPERATION AS operation" in q
    assert "SYS_CHANGE_VERSION AS version" in q


def test_postgres_outbox_scan_with_horizon():
    q = incremental_query(POSTGRES, OBJ_PG, from_version=100, horizon=9000)
    assert "id > 100" in q
    assert "xact_id < 9000" in q
    assert "FROM training_sessions_outbox" in q
    q2 = incremental_query(POSTGRES, OBJ_PG, from_version=100)
    assert "xact_id <" not in q2  # no horizon → no commit-gate predicate


def test_source_sql_escape_hatch():
    obj = TrackingObject(
        name="custom",
        source_sql="SELECT * FROM my_view WHERE v > :from_version AND x < :horizon",
    )
    q = incremental_query(POSTGRES, obj, from_version=7, horizon=11)
    assert q == "SELECT * FROM my_view WHERE v > 7 AND x < 11"


def test_jdbc_options_simple_query():
    opts = jdbc_options(POSTGRES, "jdbc:postgresql://h/db", "SELECT 1", user="u", password="p")
    assert opts["query"] == "SELECT 1"
    assert opts["driver"] == "org.postgresql.Driver"
    assert opts["fetchsize"] == "10000"
    assert opts["queryTimeout"] == "300"  # reference procedure timeout
    assert "dbtable" not in opts


def test_jdbc_options_partitioned_read():
    opts = jdbc_options(
        SQLSERVER, "jdbc:sqlserver://h;databaseName=db", "SELECT x",
        version_bounds=(100, 5000), num_partitions=16,
    )
    assert opts["dbtable"] == "(SELECT x) AS changes"
    assert opts["partitionColumn"] == "version"
    assert (opts["lowerBound"], opts["upperBound"]) == ("100", "5000")
    assert opts["numPartitions"] == "16"
    assert opts["sessionInitStatement"] == "SET ANSI_WARNINGS OFF"
    assert "query" not in opts  # mutually exclusive with dbtable


def test_session_prep_never_overrides_user():
    # user/password only present when supplied — defaults don't clobber
    opts = jdbc_options(POSTGRES, "u", "q")
    assert "user" not in opts and "password" not in opts
