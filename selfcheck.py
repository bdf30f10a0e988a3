#!/usr/bin/env python
"""Self-run of the driver's correctness harness: every
``__spark_entry__.queries()`` entry vs its ``oracle_sql()`` DuckDB
twin at sf0.01 — rows + schema + order-insensitive value hash, the
same comparison CORRECTNESS_r{N}.json records.

Usage: python selfcheck.py [name ...]   # default: all queries
Writes CORRECTNESS_self.json and prints one line per query.
"""
from __future__ import annotations

import hashlib
import json
import sys

import duckdb

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(rows, cols):
    cols = sorted(cols)
    h = hashlib.sha256()
    for r in sorted([tuple(str(r[c]) for c in cols) for r in rows]):
        h.update(("|".join(r)).encode())
    return h.hexdigest()[:12]


def main(argv):
    spark = entrymod.get_spark() if hasattr(entrymod, "get_spark") else None
    if spark is None:
        from bloom_spark.session import get_session

        spark = get_session("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = argv or list(qs)
    out = {}
    npass = nfail = 0
    for name in names:
        entry = {
            "rows_match": False, "schema_match": False,
            "hash_match": False, "spark_rows": None,
            "oracle_rows": None, "err": None,
        }
        try:
            got = qs[name](spark, SF_DIR)
            grows = got.collect()
            gcols = got.columns
            entry["spark_rows"] = len(grows)
            sql = oracles.get(name)
            if sql is None:
                entry["err"] = "no_oracle"
                entry["rows_match"] = entry["spark_rows"] >= 0
            else:
                want = con.execute(sql).fetchdf()
                wrows = want.to_dict("records")
                entry["oracle_rows"] = len(wrows)
                entry["rows_match"] = len(grows) == len(wrows)
                entry["schema_match"] = sorted(gcols) == sorted(want.columns)
                if entry["rows_match"] and entry["schema_match"]:
                    entry["hash_match"] = value_hash(
                        [r.asDict() for r in grows], gcols
                    ) == value_hash(wrows, list(want.columns))
        except Exception as exc:  # noqa: BLE001 — report, keep going
            entry["err"] = f"{type(exc).__name__}: {exc}"[:300]
        ok = (
            entry["rows_match"] and entry["err"] in (None, "no_oracle")
            and (entry["err"] == "no_oracle" or
                 (entry["schema_match"] and entry["hash_match"]))
        )
        npass += ok
        nfail += not ok
        print(("PASS " if ok else "FAIL "), name, "" if ok else entry)
        out[name] = entry
    with open("CORRECTNESS_self.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"pass {npass} fail {nfail} / {len(names)}")
    return 1 if nfail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
