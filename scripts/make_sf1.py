#!/usr/bin/env python
"""Synthesize the sf1 TIMING tier by key-shifted replication of sf0.1.

VERDICT r7 next-round #3: the 100 TB scaling claims had three measured
points (sf0.001/0.01/0.1); this adds a fourth at ~10x sf0.1 so the
scale-curve gate can catch super-linear behavior one decade further
out.  Oracle checks stay at <= sf0.1 (DuckDB is the bottleneck); sf1
is a timing/plan tier only, so small perturbations that keep the
workload's *structure* honest do not need cross-engine parity.

Construction (deterministic, no RNG outside fixed seeds):

- region/nation: copied unchanged (fixed dimensions, as in TPC-H).
- customer/supplier/part/orders/lineitem/events: 10 replicas.  Every
  key column is shifted by ``replica * OFFSET`` where OFFSET is the
  power of 10 above the key's sf0.1 max, per key FAMILY, so
  referential integrity holds within each replica (o_custkey moves
  with c_custkey, l_orderkey with o_orderkey, ...).  events.user_id
  shares the custkey offset because the streaming static-join maps
  user_id -> c_custkey.  KEY-DERIVED attributes move with their key:
  c_name/s_name encode the entity key ("Customer#%09d"), so they are
  re-rendered from the shifted key — otherwise every name appears 10
  times and any name-blocked join (er_fuzzy_blocked) degenerates
  100x, a replication artifact (found by the r8 scale sweep: 0.36 s
  -> 18 s).  Genuinely non-key attributes (dates, prices, flags,
  props, p_name's word pairs) stay byte-identical across replicas:
  per-key group sizes, skew shape, and duplicate-PK density stay
  exactly sf0.1's.
- documents: 10 replicas; doc_id shifted; replica i > 0 text runs
  through a per-replica LETTER CIPHER (fixed a-z permutation per
  replica, spaces untouched).  The cipher is a BIJECTION on
  character n-grams and on tokens, so within each replica every
  exact-dup group, Jaccard/containment pair, and df histogram is
  isomorphic to sf0.1's (dup density stays exactly sf0.1's), while
  across replicas vocabularies are disjoint up to chance collisions
  -- the Heaps-law behavior of a real 10x corpus: rare shingles STAY
  rare, vocabulary grows ~10x.  History: v1 tagged 1/3 of tokens
  (untagged rare shingles shared by all replicas inflated candidate
  joins ~100x); v2 (r8) suffixed EVERY token, which fixed df but is
  not bijective on 5-grams -- the shared "<tag> " boundary patterns
  inflated true containment pairs 151x beyond linear (measured r9,
  CONTAINSTUDY.json: 455k pairs at sf1 vs 10 x 301 at sf0.1).  Both
  were replication artifacts, not corpus growth behavior; the cipher
  eliminates the class (structure preserved per replica by
  construction, 10x output by counting).
- embeddings: 4 replicas (matching the observed 0.01 -> 0.1 growth
  factor of 4); vec_id shifted; replica > 0 vectors get seeded
  N(0, 0.01) jitter so ANN/cosine ops see distinct points rather
  than 4-way exact ties.

Output: /root/repo/.testdata/sf1/*.parquet (gitignored, ~170 MB).
Rerunning overwrites; byte-deterministic given the same sf0.1 input.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parents[1]
SRC = Path("/root/testdata/sf0.1")
DST = REPO / ".testdata" / "sf1"

# key family -> (offset, columns per table)
CUST_OFF = 100_000  # c_custkey max 14999; shared with events.user_id
ORD_OFF = 1_000_000  # o_orderkey max 149999
PART_OFF = 100_000  # p_partkey max 19999
SUPP_OFF = 1_000  # s_suppkey max 999
EVT_OFF = 1_000_000  # event_id max 99999
DOC_OFF = 10_000  # doc_id max 4999
VEC_OFF = 10_000  # vec_id max 1999

SHIFTS: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": CUST_OFF},
    "supplier": {"s_suppkey": SUPP_OFF},
    "part": {"p_partkey": PART_OFF},
    "orders": {"o_orderkey": ORD_OFF, "o_custkey": CUST_OFF},
    "lineitem": {
        "l_orderkey": ORD_OFF,
        "l_partkey": PART_OFF,
        "l_suppkey": SUPP_OFF,
    },
    "events": {"event_id": EVT_OFF, "user_id": CUST_OFF},
    "documents": {"doc_id": DOC_OFF},
    "embeddings": {"vec_id": VEC_OFF},
}
COPIES = {"embeddings": 4}  # everything else in SHIFTS: 10


def _replicate(table: str, src: pa.Table) -> pa.Table:
    copies = COPIES.get(table, 10)
    shifts = SHIFTS[table]
    parts: list[pa.Table] = []
    for i in range(copies):
        cols = []
        for name in src.column_names:
            col = src.column(name)
            if name in shifts and i:
                shifted = pa.compute.add(col, shifts[name] * i)
                col = shifted.cast(src.schema.field(name).type)
            cols.append(col)
        rep = pa.table(dict(zip(src.column_names, cols)), schema=src.schema)
        if table in ("customer", "supplier") and i:
            key, namecol, prefix = {
                "customer": ("c_custkey", "c_name", "Customer#"),
                "supplier": ("s_suppkey", "s_name", "Supplier#"),
            }[table]
            names = pa.array(
                [
                    None if k is None else f"{prefix}{k:09d}"
                    for k in rep.column(key).to_pylist()
                ],
                type=src.schema.field(namecol).type,
            )
            rep = rep.set_column(
                rep.schema.get_field_index(namecol), namecol, names
            )
        if table == "documents" and i:
            # Per-replica LETTER CIPHER (round 9; replaces the r8
            # token-suffix tagging).  A fixed permutation of a-z maps
            # every character 5-gram BIJECTIVELY, so each replica's
            # shingle-overlap structure — exact-dup groups, Jaccard,
            # containment, tf-idf shape — is isomorphic to sf0.1's,
            # while replica vocabularies are disjoint up to chance
            # collisions (expected <1 shingle per replica pair: 2k
            # images scattered over 26^5 strings).  The r8 suffix
            # tagging was NOT bijective on character shingles: every
            # token ending in the same tag created new shared 5-grams
            # across all docs of a replica, inflating true containment
            # pairs 151x beyond linear (455k at sf1 vs 10 x 301 —
            # measured, CONTAINSTUDY.json r9) — a replication artifact
            # masquerading as super-linear operator cost.  Token
            # lengths are preserved, so n_chars needs no recompute.
            import string

            rng = np.random.RandomState(777 + i)
            perm = rng.permutation(26)
            cipher = str.maketrans(
                string.ascii_lowercase,
                "".join(string.ascii_lowercase[p] for p in perm),
            )
            txt = pa.array(
                [
                    None if t is None else t.translate(cipher)
                    for t in rep.column("text").to_pylist()
                ],
                type=src.schema.field("text").type,
            )
            rep = rep.set_column(
                rep.schema.get_field_index("text"), "text", txt
            )
        if table == "embeddings" and i:
            rng = np.random.RandomState(1234 + i)
            flat = np.asarray(
                rep.column("embedding").combine_chunks().flatten(), dtype=np.float32
            )
            flat = flat + rng.normal(0.0, 0.01, size=flat.shape).astype(np.float32)
            n = len(rep)
            dim = len(flat) // n
            emb = pa.FixedSizeListArray.from_arrays(
                pa.array(flat, type=pa.float32()), dim
            ).cast(src.schema.field("embedding").type)
            rep = rep.set_column(
                rep.schema.get_field_index("embedding"), "embedding", emb
            )
        parts.append(rep)
    return pa.concat_tables(parts)


def main() -> int:
    DST.mkdir(parents=True, exist_ok=True)
    for table in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]:
        src = pq.read_table(SRC / f"{table}.parquet")
        out = _replicate(table, src) if table in SHIFTS else src
        pq.write_table(out, DST / f"{table}.parquet", compression="snappy")
        print(f"{table}: {len(src)} -> {len(out)} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
