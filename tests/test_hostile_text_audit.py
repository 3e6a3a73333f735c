"""Hostile-string robustness: a 100 TB crawl carries unicode,
metacharacters, embedded structure, and empty/degenerate documents that
the pure-``[a-z ]`` synthetic corpus never shows.
scripts/audit_hostile_text.py sweeps all 313 ids against an injected
mirror tier at round close (HOSTILETEXT.json); these tests pin the tier
builder and the specific regression classes the first round-7 sweep
found and fixed.
"""

from __future__ import annotations

import importlib.util
import tempfile
from pathlib import Path

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "audit_hostile_text",
    Path(__file__).resolve().parent.parent / "scripts" / "audit_hostile_text.py",
)
_MOD = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_MOD)


@pytest.fixture(scope="module")
def hostile_tier(sf_smoke) -> str:
    tmp = tempfile.mkdtemp(prefix="pserv_hostile_pin_")
    _MOD.build_hostile_tier(sf_smoke, tmp)
    return tmp


@pytest.fixture()
def fresh_catalog(spark):
    from pserv_spark.catalog import _REGISTERED

    _REGISTERED.pop(id(spark), None)
    yield
    _REGISTERED.pop(id(spark), None)


def test_tier_contains_every_payload_class(spark, hostile_tier):
    """Each of the ten hostile classes must land in at least one doc,
    and n_chars must stay consistent with the new text (codepoints)."""
    docs = spark.read.parquet(f"{hostile_tier}/documents.parquet").collect()
    by_class: dict[int, int] = {}
    for r in docs:
        if r.text is None:
            continue
        assert r.n_chars == len(r.text), r.doc_id
        k = r.doc_id % 11
        if k < 10 and (
            r.text == _MOD.PAYLOADS[k] or r.text.endswith(" " + _MOD.PAYLOADS[k])
        ):
            by_class[k] = by_class.get(k, 0) + 1
    assert sorted(by_class) == list(range(10)), by_class


def test_allowlist_entries_are_registered_and_reasoned():
    from pserv_spark.registry import build_queries

    names = set(build_queries())
    for name, reason in _MOD.HOSTILE_ALLOWED.items():
        assert name in names, f"stale HOSTILE_ALLOWED entry: {name}"
        assert len(reason) > 20, f"{name}: reason too thin to review"


def test_one_token_documents_do_not_crash_ngram_ops(spark, hostile_tier, fresh_catalog):
    """Finding #1: ANSI element_at threw on 1-token docs (the 1-kB
    unbroken token and the empty string).  The degenerate bigram is the
    lone token — same as the oracle's NULL-skipping concat_ws."""
    from pserv_spark.operators.quality_ops import text_repetition_ratio

    rows = {r.doc_id: r for r in text_repetition_ratio(spark, hostile_tier).collect()}
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{hostile_tier}/documents.parquet").collect()
    }
    lone = [d for d, t in docs.items() if t is not None and " " not in t]
    assert lone, "vacuous: no single-token docs in the tier"
    for d in lone:
        assert rows[d].dup_word_frac == 0.0
        assert rows[d].top_word_frac == 1.0


def test_empty_document_quality_score_is_null_not_crash(
    spark, hostile_tier, fresh_catalog
):
    """Finding #2: length(text)=0 divided by zero under ANSI.  The
    alpha ratio is honestly NULL and keep stays False."""
    from pserv_spark.operators.textanalysis import text_quality_score

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{hostile_tier}/documents.parquet").collect()
    }
    empty = [d for d, t in docs.items() if t == ""]
    assert empty, "vacuous: no empty docs in the tier"
    rows = {r.doc_id: r for r in text_quality_score(spark, hostile_tier).collect()}
    for d in empty:
        assert rows[d].alpha_ratio is None
        assert rows[d].keep is False


def test_mixed_type_props_keep_their_keys(spark, hostile_tier, fresh_catalog):
    """Finding #3: from_json(map<string,int>) nulled the ENTIRE map
    when one value was a string; keys must survive and k_val still
    parse.  ADVICE r8 #3 rotated the planted k payloads through the
    representations where naive string->int casts diverge
    (audit_hostile_text._hostile_props); the expected k_val is the
    floor-through-double normalization of each variant:
    i%100 -> i%100, 5.7 / "5.7" / 5.0 -> 5, 1e2 -> 100, and the
    boolean True -> NULL (not castable to DOUBLE on either engine)."""
    from pserv_spark.operators.extras import fn_map_props

    rows = fn_map_props(spark, hostile_tier).collect()
    with_s = [r for r in rows if r.keys == "k,s"]
    assert with_s, "vacuous: no mixed-type props rows under user_id < 40"
    expected_by_variant = [None, 5, 5, 5, 100, None]  # index 0 -> i % 100
    seen_variants = set()
    for r in with_s:
        variant = (r.event_id // 13) % 6
        seen_variants.add(variant)
        expected = r.event_id % 100 if variant == 0 else expected_by_variant[variant]
        assert r.k_val == expected, (r.event_id, variant, r.k_val, expected)
    assert len(seen_variants) >= 3, "vacuous: payload rotation not exercised"


def test_frame_digest_is_byte_true_for_multibyte_text(
    spark, hostile_tier, fresh_catalog
):
    """Finding #4: the mm oracles indexed CHARS; frames are BYTES.  The
    engine digest must equal a direct byte-slice recompute for docs
    whose UTF-8 length differs from their codepoint length."""
    import hashlib

    from pserv_spark.operators.multimodal import FRAME_BYTES, mm_frame_sample

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{hostile_tier}/documents.parquet").collect()
    }
    multi = {
        d: t.encode()
        for d, t in docs.items()
        if t is not None and len(t.encode()) != len(t)
    }
    assert multi, "vacuous: no multi-byte docs in the tier"
    got: dict = {}
    for r in mm_frame_sample(spark, hostile_tier).collect():
        got.setdefault(r.doc_id, {})[r.frame_idx] = r.frame_md5
    for d, data in multi.items():
        for idx, digest in got[d].items():
            frame = data[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES]
            assert digest == hashlib.md5(frame.hex().encode()).hexdigest(), (d, idx)


def test_megabyte_document_flows_through_text_family(spark, tmp_path, fresh_catalog):
    """A single pathological ~1 MB document (one crawl page) must flow
    through the tokenizer/shingle/quality lanes without error — gram
    expansion is linear in bytes, never quadratic.

    NB the fixture is written with pyarrow, NOT a Spark ``F.lit(big)``
    patch: a megabyte literal embedded in the Catalyst plan stalls
    constant-handling/codegen for many minutes (measured) — data of
    that size must arrive as DATA, never as plan constants."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pserv_spark import catalog
    from pserv_spark.operators.quality_ops import text_repetition_ratio
    from pserv_spark.operators.textanalysis import text_quality_score

    src = "/root/testdata/sf0.001"
    d = tmp_path / "sf_bigdoc"
    d.mkdir()
    for name in catalog.TABLE_NAMES:
        shutil.copy(f"{src}/{name}.parquet", d / f"{name}.parquet")
    big = ("lorem ipsum dolor sit amet " * 40000).strip()  # ~1.05 MB
    # doc 1: the adversarial opposite — 100k DISTINCT tokens (pins the
    # linear run-length top_count; the distinct×filter form is
    # quadratic on high-entropy docs)
    entropy = " ".join(f"w{i}" for i in range(100_000))
    tbl = pq.read_table(f"{src}/documents.parquet").to_pandas()
    tbl.loc[tbl.doc_id == 0, "text"] = big
    tbl.loc[tbl.doc_id == 0, "n_chars"] = len(big)
    tbl.loc[tbl.doc_id == 1, "text"] = entropy
    tbl.loc[tbl.doc_id == 1, "n_chars"] = len(entropy)
    pq.write_table(
        pa.Table.from_pandas(tbl, preserve_index=False),
        str(d / "documents.parquet"),
    )
    import time

    t0 = time.time()
    rep = {r.doc_id: r for r in text_repetition_ratio(spark, str(d)).collect()}
    # 5 distinct tokens over 200k tokens: extreme repetition, kept exact
    assert rep[0].dup_word_frac > 0.99 and rep[0].keep is False
    # 100k distinct tokens: zero repetition, max multiplicity 1
    assert rep[1].dup_word_frac == 0.0 and rep[1].top_word_frac == 1.0 / 100_000
    q = {r.doc_id: r for r in text_quality_score(spark, str(d)).collect()}
    assert q[0].n_tokens == 200000 and q[0].keep is False  # > 500-token cap
    # regression guard: the pre-fix quadratic took >900 s on this input
    assert time.time() - t0 < 120, "megabyte-doc path regressed to quadratic"
