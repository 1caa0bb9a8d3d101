#!/usr/bin/env python
"""Deterministic sf1-scale fixture: a referential-integrity-preserving
10x scale-up of the driver's sf0.1 tables, written to
``.localdata/sf1/`` (gitignored — derived data, ~170 MB).

The driver ships sf{0.001,0.01,0.1}; r5's oracle sweep found two
cross-engine conversion hazards at sf0.1 that sf0.01 could not see,
so the verification axis continues here: 10x the bench scale, ~100x
the driver's correctness scale. Built with DuckDB only (no Spark) so
generation is fast and the fixture is engine-neutral.

Per copy i in 0..9 (copy 0 is the identity):

- ``region``/``nation``: unscaled (dimensions don't grow in TPC-H
  either).
- fact/dim keys: offset by ``i * (max_key + 1)`` per keyspace, applied
  consistently on both sides of every FK (customer/supplier/part/
  orders/lineitem) — joins land exactly 10x the rows.
- ``events``: ids offset; ``ts`` shifted by ``i * 35`` days so copies
  are disjoint epochs — session/window/gap structure per copy is
  identical to sf0.1 (10x groups, not 10x-denser groups).
- ``documents``: ``doc_id`` offset; ``text`` Caesar-rotated by ``i``
  (letters only). Length, whitespace, tokenization and ASCII-ness are
  preserved, but shingle/minhash content differs per copy — so the
  near-dup pair structure scales 10x instead of exploding into
  10-clone cliques of every document.
- ``embeddings``: ``vec_id`` offset; the 64-dim vector rolled by
  ``i`` positions (norm-preserving; rolled copies decorrelate), label
  unchanged.
"""

from __future__ import annotations

import os
import string
import sys

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".localdata", "sf1")
COPIES = 10

# keyspace strides = max_key + 1 at sf0.1
N_CUST, N_SUPP, N_PART = 15_000, 1_000, 20_000
N_ORD, N_EVT, N_USER = 150_000, 100_000, 1_500
N_DOC, N_VEC = 5_000, 2_000
EMB_DIM = 64


def _rot(i: int) -> str:
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    return (lower[i:] + lower[:i]) + (upper[i:] + upper[:i])


def main() -> None:
    import duckdb

    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def write(name: str, select_per_copy: str) -> None:
        union = "\nUNION ALL\n".join(
            select_per_copy.format(i=i) for i in range(COPIES))
        con.execute(
            f"COPY ({union}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows", file=sys.stderr)

    for t in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                    f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied", file=sys.stderr)

    write("customer", f"""
      SELECT c_custkey + {{i}} * {N_CUST} AS c_custkey,
             * EXCLUDE (c_custkey)
      FROM '{SRC}/customer.parquet'""")
    write("supplier", f"""
      SELECT s_suppkey + {{i}} * {N_SUPP} AS s_suppkey,
             * EXCLUDE (s_suppkey)
      FROM '{SRC}/supplier.parquet'""")
    write("part", f"""
      SELECT p_partkey + {{i}} * {N_PART} AS p_partkey,
             * EXCLUDE (p_partkey)
      FROM '{SRC}/part.parquet'""")
    write("orders", f"""
      SELECT o_orderkey + {{i}} * {N_ORD} AS o_orderkey,
             o_custkey + {{i}} * {N_CUST} AS o_custkey,
             * EXCLUDE (o_orderkey, o_custkey)
      FROM '{SRC}/orders.parquet'""")
    write("lineitem", f"""
      SELECT l_orderkey + {{i}} * {N_ORD} AS l_orderkey,
             l_partkey + {{i}} * {N_PART} AS l_partkey,
             l_suppkey + {{i}} * {N_SUPP} AS l_suppkey,
             * EXCLUDE (l_orderkey, l_partkey, l_suppkey)
      FROM '{SRC}/lineitem.parquet'""")
    write("events", f"""
      SELECT event_id + {{i}} * {N_EVT} AS event_id,
             ts + INTERVAL ({{i}} * 35) DAY AS ts,
             user_id + {{i}} * {N_USER} AS user_id,
             * EXCLUDE (event_id, ts, user_id)
      FROM '{SRC}/events.parquet'""")

    doc_selects = []
    frm = string.ascii_lowercase + string.ascii_uppercase
    for i in range(COPIES):
        rot = _rot(i)
        doc_selects.append(f"""
      SELECT doc_id + {i} * {N_DOC} AS doc_id,
             translate(text, '{frm}', '{rot}') AS text,
             * EXCLUDE (doc_id, text)
      FROM '{SRC}/documents.parquet'""")
    con.execute("COPY (" + "\nUNION ALL\n".join(doc_selects)
                + f") TO '{OUT}/documents.parquet' (FORMAT PARQUET)")
    print("documents: "
          + str(con.execute(f"SELECT count(*) FROM "
                            f"'{OUT}/documents.parquet'").fetchone()[0])
          + " rows", file=sys.stderr)

    emb_selects = []
    for i in range(COPIES):
        if i == 0:
            rolled = "embedding"
        else:
            rolled = (f"list_concat(embedding[{i + 1}:{EMB_DIM}], "
                      f"embedding[1:{i}])")
        emb_selects.append(f"""
      SELECT vec_id + {i} * {N_VEC} AS vec_id,
             CAST({rolled} AS FLOAT[]) AS embedding,
             label
      FROM '{SRC}/embeddings.parquet'""")
    con.execute("COPY (" + "\nUNION ALL\n".join(emb_selects)
                + f") TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)")
    print("embeddings: "
          + str(con.execute(f"SELECT count(*) FROM "
                            f"'{OUT}/embeddings.parquet'").fetchone()[0])
          + " rows", file=sys.stderr)
    con.close()
    print(OUT)


if __name__ == "__main__":
    main()
