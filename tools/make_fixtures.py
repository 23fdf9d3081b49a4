"""Materialize the deterministic synth corpus as a committed parquet
fixture (tests/fixtures/synth300.parquet).

Both sides of the driver's correctness gate read this same file — the
Spark queries (er_pipeline_f1 / incremental_link) and their DuckDB
oracles — so the corpus bytes are identical for both engines. Content is
byte-for-byte what ``synth.synth_documents(spark, 300, seed=42)``
produces (same per-entity RNG, same code path), just written single-file
without a SparkSession so regeneration is trivial and diff-able.

Run: python tools/make_fixtures.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rapidfuzz_spark.pipeline.synth import _entity_docs  # noqa: E402

N_ENTITIES = 300
SEED = 42

SPAN_TYPE = pa.list_(
    pa.struct(
        [
            pa.field("kind", pa.string()),
            pa.field("text", pa.string()),
            pa.field("media_ref", pa.string()),
            pa.field("offset", pa.int32()),
        ]
    )
)


def main() -> None:
    rows = []
    for ent in range(N_ENTITIES):
        rows.extend(_entity_docs(SEED, ent))
    doc_ids = [r[0] for r in rows]
    entity_ids = [r[1] for r in rows]
    spans = [
        [
            {"kind": k, "text": t, "media_ref": m, "offset": o}
            for (k, t, m, o) in spanlist
        ]
        for (_, _, spanlist) in rows
    ]
    table = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "entity_id": pa.array(entity_ids, pa.string()),
            "spans": pa.array(spans, SPAN_TYPE),
        }
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "fixtures",
        "synth300.parquet",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pq.write_table(table, out)
    print(f"wrote {out}: {table.num_rows} docs, {N_ENTITIES} entities")


if __name__ == "__main__":
    main()
