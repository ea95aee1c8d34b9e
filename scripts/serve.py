"""spark-submit entry for the HTTP job server (ValidationWsListener analog).

Usage:
    spark-submit --py-files gdv.zip scripts/serve.py \
        --storage-dir /path/jobs [--host 0.0.0.0] [--port 8080]

Serves POST /jobserver/submit {"path": ..., "config": {...}},
GET /jobserver/status/{id}[/kill], GET /jobserver/output/{id}/{type}
until interrupted. The driver hosts the HTTP loop; each submitted job
runs on its own thread under a Spark job group (kill = cancelJobGroup).
"""

import argparse
import signal
import threading


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--storage-dir", required=True, help="job status/report JSON dir")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--auth-token", default=None,
                    help="Bearer token required on every request; MANDATORY for non-loopback --host")
    ap.add_argument("--path-prefix", default=None,
                    help="allowlist prefix for client-supplied input paths and work_dir")
    args = ap.parse_args()

    from gbif_data_validator_spark.serving import ValidationServer
    from gbif_data_validator_spark.session import build_session

    spark = build_session(app_name="gdv-serve")
    srv = ValidationServer(
        spark, args.storage_dir, host=args.host, port=args.port,
        auth_token=args.auth_token, path_prefix=args.path_prefix,
    ).start()
    print(f"gdv job server listening on http://{args.host}:{srv.port}/jobserver", flush=True)

    stop = threading.Event()
    for sig in (signal.SIGINT, signal.SIGTERM):
        signal.signal(sig, lambda *_: stop.set())
    stop.wait()
    srv.stop()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
