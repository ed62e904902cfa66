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


def augment_embeddings(outdir: Path) -> None:
    """Plant one embedding vector engineered so group 0's per-position
    mean at position 0 is a TINY NEGATIVE that rounds to zero — DuckDB's
    round() then emits -0.0 where Spark's BigDecimal round emits +0.0
    (the r8 dsir_importance / embedding_avg_pool hash-fail class). Any
    rounded-signed-double oracle column that loses its `+ 0.0` zero-sign
    guard goes red against this corpus.

    The compensating component is computed from the shipped data: x is
    the float32 closest to -(sum of group-0 position-0 values), nudged
    one ulp down if the new sum would land exactly on 0.0. The group sum
    becomes ~1e-7-magnitude negative, so avg rounds to -0.0 at 4 digits
    in DuckDB. Summation-order drift across engines is ~1e-16 — five
    orders below the planted remainder, so the sign is stable.
    """
    base = pq.read_table(SRC / "embeddings.parquet")
    emb = base.column("embedding").to_pylist()
    ids = base.column("vec_id").to_pylist()
    s = float(np.sum(np.array(
        [v[0] for i, v in zip(ids, emb) if i % 10 == 0], dtype=np.float64)))
    x = np.float32(-s)
    while s + float(x) >= 0.0:
        x = np.nextafter(x, np.float32(-np.inf), dtype=np.float32)
    vec = [float(x)] + [0.01 * ((7 * k) % 13 - 6) for k in range(1, 64)]
    extra = pa.table({
        "vec_id": pa.array([610], pa.int64()),
        "embedding": pa.array([vec], base.schema.field("embedding").type),
        "label": pa.array([0], pa.int32()),
    })
    merged = pa.concat_tables([base.select(extra.column_names), extra])
    pq.write_table(merged, outdir / "embeddings.parquet")
    new_sum = s + float(np.float32(vec[0]))
    assert new_sum < 0 and abs(new_sum) < 1e-4, new_sum
    print(f"built {outdir}/embeddings.parquet: {merged.num_rows} vectors "
          f"(grp-0 pos-0 sum now {new_sum:.3e} -> avg rounds to -0.0 "
          f"in DuckDB unless the oracle zero-sign guard holds)")


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
                'en', 'src5', 40),
          -- srcnull holds ONLY this null-text doc: its token count is
          -- NULL in both engines, so per-source running sums see an
          -- ALL-NULL frame — SQL sum() OVER stays NULL there and the
          -- budget filter drops the row; an engine that weighs null
          -- as 0 keeps it (the r9 groupedCumSum review finding)
          (606, NULL,           'en',  'srcnull', 0),
          -- CRLF line endings: the line ops split on LF only, so the
          -- CR must ride identically through both engines (trim() in
          -- both strips spaces only; regex whitespace classes match CR
          -- in both Java and RE2) — any one-sided CR normalization
          -- diverges here
          (607, E'first line\\r\\nfirst line\\r\\nthe a of and to in is',
                'en', 'src7', 45)
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
    augment_embeddings(out)
    print("now run Verify + check.py against it (see module docstring)")
