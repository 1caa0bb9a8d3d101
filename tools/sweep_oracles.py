#!/usr/bin/env python
"""Full-registry Spark↔DuckDB oracle sweep at arbitrary scale.

The driver verifies at sf0.01; this sweep is how r5 found two
conversion hazards that only manifest at sf0.1 (see
tests/test_cross_engine_numerics.py). Run it at the largest local
fixture every round:

    python tools/sweep_oracles.py                 # sf0.01 + sf0.1
    python tools/sweep_oracles.py /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def _alive(spark) -> bool:
    try:
        return not spark.sparkContext._jsc.sc().isStopped()
    except Exception:  # noqa: BLE001 - any probe failure = dead
        return False


def sweep(spark, sf_dir: str, respawn=None) -> list:
    """Run every registered query against its DuckDB oracle at
    ``sf_dir``. ``respawn``: zero-arg factory returning a fresh
    SparkSession — when one query kills the JVM (an executor OOM
    stops the whole local-mode context), the sweep restarts Spark and
    keeps going instead of cascading bogus 'Connection refused'
    failures onto every remaining query (the r6 sf1 first-run
    failure mode)."""
    import duckdb

    import __spark_entry__ as mod
    from test_oracle_parity import _normalize

    qs, oracles = mod.queries(), mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{sf_dir}/{t}.parquet'")
    fails = []
    for name in qs:
        try:
            sdf = qs[name](spark, sf_dir)
            s_cols, s_rows = _normalize(
                sdf.columns, [tuple(r) for r in sdf.collect()])
            ok = True
            if name in oracles:
                res = con.execute(oracles[name])
                d_cols, d_rows = _normalize(
                    [d[0] for d in res.description], res.fetchall())
                if not (s_cols == d_cols and s_rows == d_rows):
                    fails.append((name, len(s_rows), len(d_rows)))
                    ok = False
            print(f"# {name} {'ok' if ok else 'MISMATCH'}",
                  file=sys.stderr)
        except Exception as ex:  # noqa: BLE001 - report, keep sweeping
            fails.append((name, "EXC", str(ex)[:150]))
            if respawn is not None and not _alive(spark):
                print(f"# SparkContext died during {name}; respawning",
                      file=sys.stderr)
                spark = respawn()
    con.close()
    return fails


def main() -> None:
    from pyspark.sql import SparkSession

    args = sys.argv[1:]
    # Config-adversarial flags (the cluster-determinism proof at
    # full-registry breadth — r6 ran all 50 green under both):
    #   --no-aqe              disable adaptive execution
    #   --shuffle-partitions N  force a static partition count
    no_aqe = "--no-aqe" in args
    shuffle_n = None
    if "--shuffle-partitions" in args:
        i = args.index("--shuffle-partitions")
        shuffle_n = args[i + 1]
        del args[i:i + 2]
    args = [a for a in args if a != "--no-aqe"]
    dirs = args or ["/root/testdata/sf0.01",
                    "/root/testdata/sf0.1"]
    # Unlike the driver's smoke run, the sweep is OUR tool: size the
    # JVM for the largest fixture (sf1's exhaustive tx6 shingle join
    # OOMs the 1g default heap) — queries still run on a plain
    # session config otherwise, so parity semantics are unchanged.
    def mk():
        b = (SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
            .config("spark.driver.memory",
                    os.environ.get("SPARK_GRAFT_SWEEP_MEM", "48g")))
        if no_aqe:
            b = b.config("spark.sql.adaptive.enabled", "false")
        if shuffle_n is not None:
            b = b.config("spark.sql.shuffle.partitions", shuffle_n)
        s = b.getOrCreate()
        s.sparkContext.setLogLevel("ERROR")
        return s

    spark = mk()
    rc = 0
    for d in dirs:
        if not _alive(spark):
            spark = mk()
        fails = sweep(spark, d, respawn=mk)
        print(f"{d}: {'OK' if not fails else f'FAILS: {fails}'}")
        rc |= bool(fails)
    sys.exit(rc)


if __name__ == "__main__":
    main()
