#!/usr/bin/env python3
"""Full-schema scale-rehearsal generator (r14): a factor-N sf1-equivalent
directory carrying EVERY table, so the whole declared query suite can be
benched above the largest driver-shipped SF.

Relational tables and events are cloned with per-shard key offsets that
keep every foreign key consistent (shard k's lineitem rows point at
shard k's orders/part/supplier clones; events get disjoint
event_id/user_id ranges per shard — users scale with data, matching how
a real stream grows). region/nation stay fixed: TPC-H dimensions do not
grow with scale factor. documents/embeddings reuse gen_scale10's
grow-mode shards (disjoint vocab / rotated geometry).

Usage: python3 tools/gen_scale_full.py [factor] [outdir]
(default /tmp/graft_full<factor>). Driver-side python tooling only,
same as tools/check.py.
"""
import os
import sys

import duckdb

from gen_scale10 import SRC, gen_documents, gen_embeddings

# per-table key columns offset by k * (max(key)+1) of the source table;
# every other column replicates verbatim
OFFSETS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
# key -> (table, column) whose max defines its offset base: FK columns
# share the base of the primary key they reference, so shard k's facts
# point at shard k's dimension clones
KEY_BASE = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
}
FIXED = ["region", "nation"]


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/graft_full{factor}"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    base = {}
    for key, (table, column) in KEY_BASE.items():
        base[key] = con.sql(
            f"SELECT max({column}) + 1 FROM '{SRC}/{table}.parquet'"
        ).fetchone()[0]

    for t in FIXED:
        con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    for t, keys in OFFSETS.items():
        cols = [c[0] for c in con.sql(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        sel = ", ".join(
            f"{c} + k * {base[c]} AS {c}" if c in keys else c for c in cols)
        con.sql(f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet', "
                f"range({factor}) r(k)) TO '{out}/{t}.parquet' "
                "(FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"[gen_full] {t}: {n} rows")

    n_docs = gen_documents(con, factor, out, "grow")
    n_vec = gen_embeddings(con, factor, out)
    print(f"[gen_full] wrote {out}: full schema x{factor} "
          f"({n_docs} docs, {n_vec} vectors)")


if __name__ == "__main__":
    main()
