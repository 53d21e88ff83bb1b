"""Local stand-in for the driver's correctness gate.

Runs every registry query at a given SF against its DuckDB oracle and
compares row count, sorted column names, and an order-insensitive value
hash (rows sorted, floats rounded the same way on both sides before
hashing is the QUERY's job — this harness hashes exactly what comes
back).  Exit code 1 if anything mismatches.

Usage: python tools/verify_local.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import decimal
import hashlib
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mirror_lake_kusto_spark.queries import all_queries
from mirror_lake_kusto_spark.session import build_session

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v):
    # Strict normalization (r04 lesson): the driver's hasher is
    # type/sign-sensitive, so this one must be too — a lenient local
    # hasher let a -0.0 cell and a HUGEINT window-SUM burn a driver
    # round.  Floats keep repr (preserves -0.0 and 2.0 vs int 2);
    # Decimals keep a type tag so an oracle that returns DECIMAL where
    # Spark returns DOUBLE/BIGINT fails HERE, not at the driver.
    if v is None:
        return "\0"
    if isinstance(v, bool):
        return str(bool(v)).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return "dec:" + str(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x01".join(_norm_cell(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    spark = build_session(app_name="verify-local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    registry = all_queries()
    for name, q in sorted(registry.items()):
        if name_filter and name_filter not in name:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if q.oracle is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(q.oracle)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {exc}")
            continue

        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(ocols)}")
        else:
            sh = value_hash(scols, [[r[c] for c in scols] for r in srows])
            oh = value_hash(ocols, orows)
            if sh != oh:
                problems.append("value-hash mismatch")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
            if "value-hash mismatch" in problems and srows and orows:
                order = sorted(scols)
                skey = sorted(
                    tuple(_norm_cell(r[c]) for c in order) for r in srows
                )
                okey = sorted(
                    tuple(_norm_cell(r[sorted(ocols).index(c)] if False else r[ocols.index(c)]) for c in order)
                    for r in orows
                )
                for a, b in zip(skey, okey):
                    if a != b:
                        print(f"  first diff:\n    spark={a}\n    duck ={b}")
                        break
        else:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures / {len(registry)} queries")
    if failures:
        print("failed:", ", ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
