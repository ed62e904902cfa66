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
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.001")


def augment_events(outdir: Path) -> None:
    """Plant degenerate events rows. The testdata's ts encoding has
    varied across generations (TIMESTAMP(NANOS), then timestamp[us] —
    the round-6 incident), and DuckDB COPY would silently rewrite nanos
    to micros (breaking encoding-fidelity of the audit), so augment via
    pyarrow AND mirror whatever unit the source file carries.

    Planted event_ids start at 9000 (real sf0.001 ids are 0-999; stays
    under the streaming queries' require(max<1M) synthetic-offset guard).
    """
    base = pq.read_table(SRC / "events.parquet")
    ts_type = base.schema.field("ts").type  # timestamp[ns] or [us]
    ts_unit = ts_type.unit
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (9000, "2024-01-02T03:04:05.123456789", 9000, "click", 1.5, None),
        (9001, "2024-01-02T04:04:05.000000001", 9000, "click", 2.5, "{not json"),
        (9002, "2024-01-03T05:00:00.999999999", 9001, "purchase", 3.0, '{"k": "oops"}'),
        (9003, "2024-01-03T06:00:00.000000000", None, "view", 4.0, '{"k": 5}'),
        (9004, "2024-01-04T07:00:00.500000000", 9002, "error", None, '{"k": null}'),
        (9005, "2024-01-04T08:00:00.250000000", 9002, None, 5.0, "{}"),
        (9006, None, 9003, "click", 6.0, '{"k": 7}'),
        # non-finite metric values: Spark's decimal cast maps NaN/Inf
        # to null (non-ANSI), so fixed-decimal aggregates exclude
        # them; oracles mirror with isfinite(). user 9004 has no
        # purchases so the asof/range time-join probes stay put.
        (9007, "2024-01-05T01:00:00.000000000", 9004, "error",
         float("nan"), '{"k": 1}'),
        (9008, "2024-01-05T02:00:00.000000000", 9004, "click",
         float("inf"), '{"k": 2}'),
    ]
    extra = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [np.datetime64(r[1], ts_unit) if r[1] else None
                 for r in rows], ts_type),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    merged = pa.concat_tables([base.select(extra.column_names), extra])
    pq.write_table(merged, outdir / "events.parquet",
                   coerce_timestamps=None)
    print(f"built {outdir}/events.parquet: {merged.num_rows} events "
          f"(9 planted edge rows, ts stays {merged.schema.field('ts').type})")


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
    augment_events(out)
    print("now run Verify + check.py against it (see module docstring)")
