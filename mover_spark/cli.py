"""CLI mirroring the reference's flags (cmd/mover/main.go:26-33):
-query, -table, -path, -dsn, -action {extract,load,describe}, -verbose,
-version; JSON config via $MOVER_CONF (main.go:53-57).

Usage:
    python -m mover_spark.cli -action extract -path /tmp/out \\
        -query "SELECT * FROM customer WHERE c_custkey <= 5" \\
        [-sf-dir /root/testdata/sf0.001] [-conf config.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from . import __version__
from .catalog import Catalog
from .config import MoverConfig
from .engine import Engine
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="mover-spark", prefix_chars="-")
    p.add_argument("-action", choices=["extract", "load", "describe"], required=False)
    p.add_argument("-query", default="")
    p.add_argument("-table", default="")
    p.add_argument("-path", default="")
    p.add_argument("-dsn", default="")  # JDBC/postgres target (gated)
    p.add_argument("-conf", default=None, help="config.json (default: $MOVER_CONF)")
    p.add_argument(
        "-on-conflict", choices=["nothing", "update"], default="nothing",
        dest="on_conflict",
        help="load conflict policy: 'nothing' (reference parity) or "
        "'update' (last-write-wins merge)",
    )
    p.add_argument(
        "-single-file", action="store_true", dest="single_file",
        help="extract: write the reference's single-file JSON envelope "
        "(byte parity; collects to the driver — small extracts only). "
        "Default is the scale-safe partitioned envelope.",
    )
    p.add_argument(
        "-download-media", action="store_true", dest="download_media",
        help="extract: fetch files referenced by download-configured columns "
        "(executor-parallel), mirroring URL paths under <path>/media/",
    )
    p.add_argument("-sf-dir", default="/root/testdata/sf0.001", dest="sf_dir")
    p.add_argument("-verbose", action="store_true")
    p.add_argument("-version", action="store_true")
    args = p.parse_args(argv)

    if args.version:
        print(__version__)
        return 0
    if not args.action:
        p.error("-action is required")

    spark = get_spark("mover-spark-cli")
    if not args.verbose:
        spark.sparkContext.setLogLevel("ERROR")
    catalog = Catalog(spark, args.sf_dir)
    engine = Engine(spark, catalog, MoverConfig.load(args.conf))

    if args.action == "describe":
        if not args.table:
            p.error("-table is required for describe")
        print(json.dumps(engine.describe(args.table), indent=2))
    elif args.action == "extract":
        if not args.path or not args.query:
            p.error("-path and -query are required for extract")
        results = engine.extract(args.path, args.query, table=args.table or None,
                                 partitioned=not args.single_file,
                                 download_media=args.download_media)
        # report counts from the envelopes ON DISK: a count() here would
        # re-execute the whole closure+sanitize plan per table, and for a
        # non-deterministic upstream could even disagree with the files
        # the extract just wrote
        from .sources.jsonio import envelope_count

        for t in sorted(results):
            env = (
                os.path.join(args.path, f"{t}.json")
                if args.single_file
                else os.path.join(args.path, t)
            )
            print(f"{t}: {envelope_count(env)} rows")
    elif args.action == "load":
        if not args.path:
            p.error("-path is required for load")
        results = engine.load(args.path, target_dir=args.path + "_loaded",
                              dsn=args.dsn or None,
                              on_conflict=args.on_conflict)
        # honest label: this is the incoming (deduped) batch size; how many
        # rows actually appended depends on the target's existing rows
        # (ON CONFLICT semantics), which the sink resolves per partition
        for t in sorted(results):
            print(f"{t}: {results[t].count()} rows in batch")
    return 0


if __name__ == "__main__":
    sys.exit(main())
