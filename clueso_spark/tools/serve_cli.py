"""Serve CLI: host the HTTP search endpoint over one store.

The deployment entry point a CloudServer-style client talks to:
``GET /<bucket>?search=<where>[&limit][&start-after][&format=json|xml]``
answered with S3 ListBucketResult XML or the Livy-contract JSON array
(clueso_spark/server/rest.py). Wires the full engine from config
(cache manager, optional Graphite reporter) exactly like build_engine
-- the long-lived-session shape the reference runs under Livy.

Usage:
  python -m clueso_spark.tools.serve_cli <store_root> [--port 8765]
      [--config clueso.json] [--no-cache]
"""

from __future__ import annotations

import argparse


def main() -> int:
    ap = argparse.ArgumentParser(description="HTTP metadata-search server")
    ap.add_argument("store_root")
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument(
        "--host",
        default="127.0.0.1",
        help=(
            "bind address; 0.0.0.0 exposes the UNAUTHENTICATED search "
            "endpoint to the network and must sit behind an "
            "authenticating reverse proxy"
        ),
    )
    ap.add_argument("--config", default=None, help="CluesoSparkConfig JSON")
    ap.add_argument(
        "--no-cache",
        action="store_true",
        help="disable the per-bucket merged-view cache",
    )
    args = ap.parse_args()

    from clueso_spark.config import CluesoSparkConfig, build_engine
    from clueso_spark.server import SearchServer
    from clueso_spark.session import get_spark

    cfg = CluesoSparkConfig.load(args.config)
    cfg = CluesoSparkConfig(
        **{
            **cfg.__dict__,
            "store_root": args.store_root,
            **({"cache_dataframes": False} if args.no_cache else {}),
        }
    )
    spark = get_spark("clueso-serve")
    engine = build_engine(spark, cfg)
    executor = engine.executor
    with SearchServer(executor, port=args.port, host=args.host) as srv:
        print(f"serving on {srv.url} (store: {args.store_root})", flush=True)
        # signal handlers replace KeyboardInterrupt delivery, so the
        # shutdown path is exactly (signal -> Event -> context exit)
        import signal
        import threading

        stop = threading.Event()
        signal.signal(signal.SIGTERM, lambda *a: stop.set())
        signal.signal(signal.SIGINT, lambda *a: stop.set())
        stop.wait()
    engine.close()  # stop-flush the Graphite reporter, if configured
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
