"""Run the relay as a service: ``python -m trignis_spark``.

The deployment shape of the reference's hosted service (``dotnet run``):
load ``--config-dir`` environments, poll their tracking objects, export
to the configured destinations, replay dead letters, and (optionally)
serve the HTTP control plane.

Source selection (``--source``):
- ``parquet``: each object's ``table_name`` names a parquet outbox under
  ``--data-dir`` (the sandbox/demo mode; also the shape of a lake-backed
  outbox in production);
- ``jdbc:<provider>``: generated incremental pushdown reads against
  ``--jdbc-url`` (sqlserver / postgres / mysql dialects).

Secrets: with ``--encrypt-secrets``, plaintext credentials in the config
files are encrypted in place on startup (PWENC at rest) and decrypted
only in memory.
"""

from __future__ import annotations

import argparse
import logging
import time


def main() -> int:
    ap = argparse.ArgumentParser(prog="python -m trignis_spark")
    ap.add_argument("--config-dir", required=True,
                    help="directory of environments/*.json")
    ap.add_argument("--work-dir", required=True,
                    help="state/DLQ/pause store root")
    ap.add_argument("--data-dir", default=".",
                    help="parquet outbox root (source=parquet)")
    ap.add_argument("--source", default="parquet",
                    help="parquet | jdbc:sqlserver | jdbc:postgres | jdbc:mysql")
    ap.add_argument("--jdbc-url", default="",
                    help="JDBC url for jdbc:* sources")
    ap.add_argument("--api-port", type=int, default=0,
                    help="serve the HTTP control plane on this port (0 = off)")
    ap.add_argument("--encrypt-secrets", action="store_true",
                    help="PWENC-encrypt plaintext config secrets on startup")
    ap.add_argument("--duration", type=float, default=0.0,
                    help="run for N seconds then exit (0 = until Ctrl-C)")
    ap.add_argument("--poll-interval", type=float, default=None,
                    help="override every environment's polling interval")
    args = ap.parse_args()

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s [%(levelname).3s] %(name)s: %(message)s",
    )

    from trignis_spark.service import TrignisSparkService
    from trignis_spark.session import get_spark

    spark = get_spark("trignis-spark-service")
    spark.sparkContext.setLogLevel("ERROR")

    if args.source == "parquet":
        from trignis_spark.operators import changefeed as cf
        from trignis_spark.tables import load

        def source_factory(obj):
            return lambda s, o: cf.events_as_outbox(
                load(s, args.data_dir, o.table_name)
            )
    elif args.source.startswith("jdbc:"):
        from trignis_spark.sources.jdbc import DIALECTS, JdbcOutboxSource

        provider = args.source.split(":", 1)[1]
        if provider not in DIALECTS:
            ap.error(f"unknown dialect {provider!r}; one of {sorted(DIALECTS)}")
        if not args.jdbc_url:
            ap.error("--jdbc-url is required for jdbc sources")

        def source_factory(obj):
            return JdbcOutboxSource(DIALECTS[provider], args.jdbc_url)
    else:
        ap.error(f"unknown --source {args.source!r}")

    crypto = None
    if args.encrypt_secrets:
        from trignis_spark.crypto import EncryptionService

        crypto = EncryptionService(args.work_dir)

    service = TrignisSparkService(
        spark,
        args.config_dir,
        args.work_dir,
        source_factory,
        poll_interval_override=args.poll_interval,
        crypto=crypto,
    )
    problems = service.start()
    for p in problems:
        logging.error("config: %s", p)

    api_thread = None
    if args.api_port:
        import threading

        app = service.api_app()

        def serve():
            app.run(host="127.0.0.1", port=args.api_port, threaded=True,
                    use_reloader=False)

        api_thread = threading.Thread(target=serve, daemon=True, name="api")
        api_thread.start()
        logging.info("control plane on http://127.0.0.1:%d", args.api_port)

    try:
        if args.duration > 0:
            time.sleep(args.duration)
        else:
            while True:
                time.sleep(3600)
    except KeyboardInterrupt:
        pass
    finally:
        service.stop()
        logging.info("service stopped")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
