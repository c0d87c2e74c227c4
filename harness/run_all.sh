#!/usr/bin/env bash
# One-command execution of every live-services parity leg (EXTERNAL
# ONLY — the build sandbox has no Docker/network/JDBC jars; run this on
# a workstation with Docker + spark-submit on PATH; see README.md).
#
# Brings up PostgreSQL + SQL Server + Kafka, waits on their compose
# healthchecks, applies the MSSQL bootstrap (no initdb hook), then runs
# the three parity legs and prints one PASS/FAIL line per leg. Exits
# non-zero if any leg fails. Package pins below are the tested set for
# Spark 4.1.x / Scala 2.13 — match the Kafka connector to YOUR
# spark-submit version if it differs.
set -euo pipefail
cd "$(dirname "$0")"

PG_PKG=${PG_PKG:-org.postgresql:postgresql:42.7.4}
MSSQL_PKG=${MSSQL_PKG:-com.microsoft.sqlserver:mssql-jdbc:12.8.1.jre11}
KAFKA_PKG=${KAFKA_PKG:-org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2}

echo "=== starting services (postgres, mssql, kafka) and waiting on health"
docker compose up -d --wait postgres mssql kafka

echo "=== applying SQL Server change-tracking bootstrap (idempotent)"
docker compose exec -T mssql /opt/mssql-tools18/bin/sqlcmd -C -U sa \
    -P 'Trignis!Harness1' -i /setup_changetracking.sql

fail=0
run_leg() {
    local name="$1"
    shift
    echo "=== leg: $name"
    if "$@"; then
        echo "=== PASS $name"
    else
        echo "=== FAIL $name"
        fail=1
    fi
}

run_leg postgres-outbox \
    spark-submit --packages "$PG_PKG" run_parity.py
run_leg mssql-changetracking \
    spark-submit --packages "$MSSQL_PKG" run_parity.py \
    --dialect sqlserver --from-version 0
run_leg kafka-roundtrip \
    spark-submit --packages "$KAFKA_PKG" run_kafka_roundtrip.py

if [ "$fail" -eq 0 ]; then
    echo "=== ALL LEGS PASS"
else
    echo "=== AT LEAST ONE LEG FAILED"
fi
exit "$fail"
