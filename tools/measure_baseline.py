"""Measure the BASELINE.md operational targets and print them.

Fills the driver-defined table: full-sync export throughput, incremental
cycle latency for a ~1000-row delta, snapshot-diff build time, and a
25-payload DLQ replay sweep — all at sf0.1 unless overridden by
$SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trignis_spark import queries as q  # noqa: E402
from trignis_spark.config import EnvironmentConfig, TrackingObject  # noqa: E402
from trignis_spark.deadletter import DeadLetterStore  # noqa: E402
from trignis_spark.operators import changefeed as cf  # noqa: E402
from trignis_spark.session import get_spark  # noqa: E402
from trignis_spark.sinks.base import RetryPolicy  # noqa: E402
from trignis_spark.sinks.file import FileSink  # noqa: E402
from trignis_spark.sinks.memory import MemorySink  # noqa: E402
from trignis_spark.state import StateStore  # noqa: E402
from trignis_spark.streaming.poller import PollPipeline  # noqa: E402
from trignis_spark.streaming.replay import DeadLetterReplayer  # noqa: E402
from trignis_spark.tables import load  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("baseline-measure")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp()
    retry = RetryPolicy(attempts=1, delay_seconds=0, sleep=lambda _: None)
    env = EnvironmentConfig(
        name="bl",
        tracking_objects=(
            TrackingObject(name="events", table_name="events",
                           initial_sync_mode="Full"),
        ),
    )

    def source_fn(s, obj):
        return cf.events_as_outbox(load(s, sf_dir, "events"))

    results: dict[str, float] = {}

    # 1. full-sync export rows/s to the file sink
    state = StateStore(work + "/s1")
    dlq = DeadLetterStore(work + "/d1")
    sink = FileSink("f", path_template=work + "/exp/{object}-{guid}.json")
    pipe = PollPipeline(spark, env, source_fn, [sink], state, dlq, retry=retry)
    t0 = time.time()
    [r] = pipe.run_cycle()
    dt_full = time.time() - t0
    results["full_sync_rows"] = r.exported_rows
    results["full_sync_sec"] = round(dt_full, 3)
    results["full_sync_rows_per_sec"] = round(r.exported_rows / dt_full)

    # 2. incremental cycle latency for a ~1000-row delta
    max_v = r.new_watermark
    state.set_last_version("bl", "events", max_v - 1000)
    t0 = time.time()
    [r2] = pipe.run_cycle()
    results["incremental_1000_rows"] = r2.exported_rows
    results["incremental_1000_sec"] = round(time.time() - t0, 3)

    # 3. snapshot-diff change-feed build time (orders table)
    t0 = time.time()
    q.QUERIES["cf_snapshot_diff"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    results["snapshot_diff_sec"] = round(time.time() - t0, 3)

    # 4. DLQ replay sweep of 25 payloads
    dlq2 = DeadLetterStore(work + "/d2")
    for i in range(25):
        dlq2.save(f"k{i}", "events", "bl", "db", f'{{"i":{i}}}', "err")
    ok = MemorySink("ok")
    replayer = DeadLetterReplayer(dlq2, {"bl": env}, sinks_for_env=lambda n: [ok])
    t0 = time.time()
    outcomes = replayer.sweep()
    results["replay_25_sec"] = round(time.time() - t0, 3)
    results["replay_25_delivered"] = sum(
        1 for o in outcomes if o.status == "delivered"
    )

    print(json.dumps({"sf_dir": sf_dir, **results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
