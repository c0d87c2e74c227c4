"""Run the full relay service for a few seconds against the testdata.

The Program.cs-equivalent composition: config dir → validated
environments → one poller each → config watcher (hot reload) → DLQ
replay loop → health snapshot. Ctrl-C or the timer stops it cleanly.

    python examples/run_service.py [sf_dir] [seconds]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trignis_spark.operators import changefeed as cf
from trignis_spark.service import TrignisSparkService
from trignis_spark.session import get_spark
from trignis_spark.sinks.base import RetryPolicy
from trignis_spark.tables import load


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    run_seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 6.0
    work = tempfile.mkdtemp(prefix="trignis-service-")
    cfg_dir = os.path.join(work, "environments")
    os.makedirs(cfg_dir)
    with open(os.path.join(cfg_dir, "prod.json"), "w") as f:
        json.dump(
            {
                "name": "prod",
                "polling_interval_seconds": 2,
                "tracking_objects": [
                    {"name": "events", "table_name": "events",
                     "initial_sync_mode": "Full"}
                ],
                "destinations": [
                    {"name": "json-out", "kind": "file",
                     "options": {"path_template": work + "/exports/{object}-{timestamp}-{guid}.json"}}
                ],
            },
            f,
        )

    spark = get_spark("trignis-service")
    spark.sparkContext.setLogLevel("ERROR")

    def source_factory(obj):
        return lambda s, o: cf.events_as_outbox(load(s, sf_dir, o.table_name))

    service = TrignisSparkService(
        spark, cfg_dir, work, source_factory,
        replay_interval_seconds=2.0, poll_interval_override=1.0,
        retry=RetryPolicy(attempts=2, delay_seconds=0, sleep=lambda _: None),
    )
    problems = service.start()
    print(f"service up (config problems: {problems}); running {run_seconds}s")
    try:
        # serve the control plane + dashboard while the pollers run:
        # http://127.0.0.1:8080/ui  (dashboard / environments /
        # deadletters / logs views over the JSON API)
        try:
            import threading

            from trignis_spark.api import create_app

            app = create_app(
                service.state, service.dlq, service.pauses,
                replayer=service.replayer, health_service=service.health,
                environments=service._envs_snapshot,
            )
            threading.Thread(
                target=lambda: app.run(port=8080, use_reloader=False),
                daemon=True,
            ).start()
            print("dashboard: http://127.0.0.1:8080/ui")
        except Exception as e:  # flask absent → service still runs
            print(f"dashboard unavailable: {e}")
        time.sleep(run_seconds)
    finally:
        service.stop()
    print("stopped; pollers:", service.orchestrator.running())
    print("probe cycles:", len(service.probe.rows),
          "| overlaps:", service.probe.overlaps())
    print("health:", json.dumps(service.health.snapshot(force=True), indent=2))
    import glob

    print("exported files:", len(glob.glob(work + "/exports/*.json")))
    return 0


if __name__ == "__main__":
    sys.exit(main())
