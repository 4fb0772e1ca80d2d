#!/usr/bin/env python3
"""Execute graft's exported DuckDB view SQL in actual DuckDB and diff the
result against the engine's own folded read.

Usage:
    sbt -batch "runMain graft.Scratch"     # exports /tmp/scratch_duck/*
    python3 tools/check_duckdb_export.py [/tmp/scratch_duck]

Each exported dir holds `view.sql` (the generated DuckDB statement),
`manifest.json`, and `expected.csv` (the engine's readView, one
comma-joined row per line, sorted). The check executes the SQL in an
in-memory DuckDB and compares row sets. This is the executable proof
behind the HAVING dialect translation (ManifestExport.havingToDuckDb):
the Scala test suite cannot depend on DuckDB, so the substring asserts
there are backed by this driver-side run.
"""
import pathlib
import sys

import duckdb

root = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/scratch_duck")
if not root.is_dir():
    sys.exit(f"no exports under {root} — run: sbt -batch 'runMain graft.Scratch'")
dirs = sorted(p for p in root.iterdir() if (p / "view.sql").exists())
if not dirs:
    sys.exit(f"no exports under {root} — run: sbt -batch 'runMain graft.Scratch'")


def norm_field(tok: str) -> str:
    """Canonicalize numeric renderings: Java's Double.toString flips to
    E-notation (1.23456785E7) where Python says 12345678.5 — parse both
    through float so semantically equal rows compare equal. Applied
    identically to both sides, so int-vs-float drift ("30" → "30.0")
    stays consistent too."""
    try:
        return repr(float(tok))
    except ValueError:
        return tok


def norm_row(line: str) -> str:
    return ",".join(norm_field(t) for t in line.split(","))


fail = 0
for d in dirs:
    try:
        sql = (d / "view.sql").read_text()
        exp = sorted(
            norm_row(l)
            for l in (d / "expected.csv").read_text().splitlines()
            if l
        )
        con = duckdb.connect()
        con.execute(sql)
        got = sorted(
            norm_row(",".join(str(x) for x in row))
            for row in con.execute("SELECT * FROM v").fetchall()
        )
    except Exception as e:  # noqa: BLE001 - report, keep checking the rest
        print(f"{d.name}: FAIL ({e})")
        fail += 1
        continue
    ok = got == exp
    print(f"{d.name}: {'ok' if ok else 'FAIL'} ({len(got)} rows)")
    if not ok:
        print(f"  duckdb : {got}\n  engine : {exp}")
        fail += 1
sys.exit(1 if fail else 0)
