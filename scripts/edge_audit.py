#!/usr/bin/env python3
"""Edge-row parity audit: rebuild an sf0.001 variant whose documents
table carries the degenerate rows real testdata never has (null /
empty / whitespace-only / supplementary-plane / newline-only text,
null lang, null source), then run the normal Verify + check.py gate
against it. Any FAIL is a latent Spark-vs-DuckDB parity divergence of
the "only because testdata is ASCII and non-null" class.

Usage:
  python3 scripts/edge_audit.py [outdir]          # default /tmp/sfnull
  java -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
      graft.Verify /tmp/sfnull target/verify_null
  python3 scripts/check.py /tmp/sfnull target/verify_null

Planted doc_ids start at 600 (real sf0.001 ids are 0-499; stays far
under the +1M planted-copy offsets and the streaming 1M id guard).
"""
import shutil
import subprocess
import sys
from pathlib import Path

import duckdb

SRC = Path("/root/testdata/sf0.001")


def build(outdir: Path) -> None:
    outdir.mkdir(parents=True, exist_ok=True)
    for p in SRC.glob("*.parquet"):
        shutil.copy(p, outdir / p.name)
    con = duckdb.connect()
    con.execute(f"""
      COPY (
        SELECT * FROM '{SRC}/documents.parquet'
        UNION ALL BY NAME
        SELECT * FROM (VALUES
          (600, NULL,           'en',  'src1', 0),
          (601, '',             'en',  'src2', 0),
          (602, '   ',          'en',  'src3', 3),
          (603, chr(128512),    NULL,  'src4', 2),
          (604, E'\n\n',        'en',  NULL,   2),
          (605, E'only line\nonly line\n\nthe a of and to in is that',
                'en', 'src5', 40)
        ) t(doc_id, text, lang, source, n_chars)
      ) TO '{outdir}/documents.parquet' (FORMAT PARQUET)
    """)
    n, nt = con.execute(
        f"SELECT count(*), count(text) FROM '{outdir}/documents.parquet'"
    ).fetchone()
    print(f"built {outdir}: {n} docs ({n - nt} null-text)")


if __name__ == "__main__":
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/sfnull")
    build(out)
    print("now run Verify + check.py against it (see module docstring)")
