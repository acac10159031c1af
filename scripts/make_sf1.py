"""Generate an sf1 dataset (10× sf0.1) for the one-off scaling table
(VERDICT r7 "Next round" #3): no network and no TPC-H generator in the
container, so sf1 is derived from the driver's own sf0.1 parquet by
key-offset replication — the same approach dbgen itself takes (keys are
dense per SF), so every join still resolves replica-locally and key
cardinalities scale linearly:

- region / nation: copied (fixed dimensions, exactly like TPC-H).
- customer / part: 10 copies, primary key offset by replica·max_key;
  nationkey dim refs untouched. supplier is COPIED (true dimension —
  see OFFSET_COLS comment; r9, VERDICT r8 item 4).
- orders: o_orderkey and o_custkey offset (orders reference the SAME
  replica's customers — selectivities per customer unchanged).
- lineitem: l_orderkey / l_partkey offset likewise; l_suppkey
  untouched (all replicas reference the one supplier dimension).
- events: event_id / user_id offset; timestamps untouched, so per-day
  volumes grow 10× while the date range is fixed (what real traffic
  growth looks like; sessionization and windows scale in users).
- documents: doc_id offset; for replica i>0 the token order is ROTATED
  by a replica-dependent stride AND every 3rd token gets a
  replica-suffix substitution. Plain replication would plant 10
  exact near-dup copies of every doc and blow the candidate-pair count
  up ~100× (quadratic in copies) — an artifact, not scale. Rotation
  scrambles SHINGLE sets (MinHash/Jaccard/fingerprint workloads scale
  honestly) but preserves the token SET exactly, which still plants
  100%-containment duplicates for set-similarity operators (caught
  when containment_near_dups went 10× superlinear sf1→sf3); the 1/3
  substitution pushes replica-pair containment to ~0.67, under any
  dedup threshold, while keeping token counts and lengths.
- embeddings: vec_id offset; for replica i>0 the vector is circularly
  shifted by i — norms and component distributions are preserved but
  cosine structure is broken, avoiding the same planted-near-dup
  artifact for ANN/dedup-by-cosine.

Writes to $SF1_DIR (default /tmp/testdata_sf1). Pure pandas/pyarrow —
no Spark, so generation can't perturb a concurrently-running bench's
JVM. Deterministic (no RNG anywhere).

Usage: python scripts/make_sf1.py [src_sf_dir] [replicas]
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
OUT = os.environ.get("SF1_DIR", "/tmp/testdata_sf1")

# (table, columns offset by replica * (max over that column))
#
# supplier is NOT here (VERDICT r8 item 4): it is a TRUE dimension —
# scaling it 10x put 10x rows on BOTH sides of the dim-contract
# operators (fuzzy_join_levenshtein went 68x wall purely by fixture)
# while a real deployment grows facts against a dim-sized supplier.
# It is copied like region/nation; lineitem.l_suppkey is left
# unoffset, so every replica's facts reference the SAME supplier set —
# per-supplier fan-in grows 10x, which is exactly what data growth
# does to a dimension.
OFFSET_COLS = {
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# offsets must be CONSISTENT across tables (orders.o_custkey uses
# customer.c_custkey's max), so strides are keyed by the referenced pk
STRIDE_OF = {
    "c_custkey": ("customer", "c_custkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def rotate_text(text: str, stride: int, rep: int) -> str:
    toks = text.split(" ")
    if len(toks) < 2:
        return text
    k = stride % len(toks)
    toks = toks[k:] + toks[:k]
    # substitute every 3rd token so replica token SETS differ (~1/3),
    # not just their order — see module docstring
    return " ".join(
        f"{t}r{rep}" if j % 3 == 0 else t for j, t in enumerate(toks)
    )


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    strides: dict[str, int] = {}
    for tbl, col in set(STRIDE_OF.values()):
        arr = pq.read_table(os.path.join(SRC, f"{tbl}.parquet"), columns=[col])
        # +1: 0-based id spaces would otherwise collide at the seam
        strides[(tbl, col)] = int(arr[col].to_numpy().max()) + 1

    for tbl in ("region", "nation", "supplier"):
        shutil.copy(
            os.path.join(SRC, f"{tbl}.parquet"), os.path.join(OUT, f"{tbl}.parquet")
        )
        print(f"{tbl}: copied")

    for tbl, cols in OFFSET_COLS.items():
        t = pq.read_table(os.path.join(SRC, f"{tbl}.parquet"))
        pieces = []
        for i in range(REPS):
            piece = t
            for c in cols:
                stride = strides[STRIDE_OF[c]]
                vals = piece[c].to_numpy() + i * stride
                piece = piece.set_column(
                    piece.schema.get_field_index(c),
                    piece.schema.field(c),
                    pa.array(vals, type=piece.schema.field(c).type),
                )
            if tbl == "documents" and i > 0:
                texts = piece["text"].to_pylist()
                rotated = [rotate_text(s, 7 * i + 3, i) for s in texts]
                idx = piece.schema.get_field_index("text")
                piece = piece.set_column(
                    idx, piece.schema.field("text"), pa.array(rotated, type=pa.string())
                )
            if tbl == "embeddings" and i > 0:
                vecs = piece["embedding"].to_pylist()
                shifted = [v[i % len(v):] + v[: i % len(v)] if v else v for v in vecs]
                idx = piece.schema.get_field_index("embedding")
                piece = piece.set_column(
                    idx,
                    piece.schema.field("embedding"),
                    pa.array(shifted, type=piece.schema.field("embedding").type),
                )
            pieces.append(piece)
        out = pa.concat_tables(pieces)
        # 256k-row row groups: pyarrow's ~1M-row default makes Spark's
        # byte-range splits mostly EMPTY (a split yields rows only if a
        # row-group midpoint lands in it), silently capping scan
        # parallelism — an sf3 orders scan planned 17 splits but
        # executed as 5 non-empty tasks. Finer groups keep the derived
        # dataset's scan layout faithful to a real multi-file table.
        pq.write_table(
            out, os.path.join(OUT, f"{tbl}.parquet"), row_group_size=262144
        )
        print(f"{tbl}: {t.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
