"""Fixture machinery: content-fingerprinted keys, atomic peer-tolerant
publication, and crash recovery (ADVICE r2 / VERDICT r2 next-round #5:
"a test that plants a half-built fixture and shows the op rebuilds
instead of trusting it")."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from pserv_spark.fixtures import (
    fixture_key,
    fixture_path,
    publish_dir,
    staging_path,
)


def _plant_parquet(d, name, content=b"x" * 64):
    with open(os.path.join(d, name), "wb") as fh:
        fh.write(content)


def test_fixture_key_changes_on_content_change(tmp_path):
    d = str(tmp_path / "sf")
    os.makedirs(d)
    _plant_parquet(d, "a.parquet")
    k1 = fixture_key(d)
    assert k1 == fixture_key(d)  # stable while untouched
    # regen in place: same path, new bytes (size change)
    _plant_parquet(d, "a.parquet", b"y" * 65)
    k2 = fixture_key(d)
    assert k2 != k1
    # mtime-only change (same size) also invalidates
    os.utime(os.path.join(d, "a.parquet"), ns=(1, 1))
    assert fixture_key(d) not in (k1, k2)
    # a new table file invalidates too
    _plant_parquet(d, "b.parquet")
    assert fixture_key(d) != k2


def test_fixture_key_ignores_non_parquet(tmp_path):
    d = str(tmp_path / "sf")
    os.makedirs(d)
    _plant_parquet(d, "a.parquet")
    k1 = fixture_key(d)
    with open(os.path.join(d, "README.txt"), "w") as fh:
        fh.write("not data")
    assert fixture_key(d) == k1


def test_publish_dir_atomic_and_peer_tolerant(tmp_path):
    final = str(tmp_path / "fixture")
    s1, s2 = f"{final}.tmp.1", f"{final}.tmp.2"
    for s, payload in ((s1, "one"), (s2, "two")):
        os.makedirs(s)
        with open(os.path.join(s, "data.json"), "w") as fh:
            json.dump(payload, fh)
    publish_dir(s1, final)
    assert json.load(open(os.path.join(final, "data.json"))) == "one"
    # the losing peer's publish is a silent no-op, staging is cleaned
    publish_dir(s2, final)
    assert json.load(open(os.path.join(final, "data.json"))) == "one"
    assert not os.path.exists(s2)


def test_publish_dir_raises_when_destination_is_not_a_dir(tmp_path):
    final = str(tmp_path / "fixture")
    staging = f"{final}.tmp.1"
    os.makedirs(staging)
    # destination parent missing → a real error must surface, not be
    # swallowed as "peer published"
    with pytest.raises(OSError):
        publish_dir(staging, str(tmp_path / "no" / "such" / "parent"))


def test_bloom_fixture_rebuilds_from_half_built_dir(spark, sf_oracle):
    """Plant the exact debris a crashed round-2 builder could leave —
    a data directory WITHOUT its manifest — and show the op rebuilds
    and answers correctly instead of trusting the debris."""
    from pserv_spark.operators.pipeline_ops import layout_bloom_file_skip

    out = fixture_path(sf_oracle, "bloomskip")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    _plant_parquet(out, "part-00000-debris.snappy.parquet", b"not parquet")
    rows = layout_bloom_file_skip(spark, sf_oracle).collect()
    assert len(rows) == 1 and rows[0].n_orders > 0
    assert os.path.exists(os.path.join(out, "_bloom_manifest.json"))


def test_derby_fixture_survives_stale_staging(spark, sf_oracle):
    """A crashed builder's staging directory (the only place a crash
    can now leave debris) must not poison the next run."""
    from pserv_spark.operators.jdbc_ops import _derby_url, source_jdbc_registry

    _url, _props, db = _derby_url(spark, sf_oracle)
    shutil.rmtree(db, ignore_errors=True)
    stale = staging_path(db)
    shutil.rmtree(stale, ignore_errors=True)
    os.makedirs(stale)
    with open(os.path.join(stale, "db.lck"), "w") as fh:
        fh.write("debris")
    n = source_jdbc_registry(spark, sf_oracle).count()
    assert n > 0
    assert os.path.isdir(db)


def test_zonemap_fixture_rebuilds_from_half_built_dir(spark, sf_oracle):
    from pserv_spark.operators.pipeline_ops import layout_zonemap_prune

    out = fixture_path(sf_oracle, "zonemap")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    _plant_parquet(out, "part-00000-debris.snappy.parquet", b"not parquet")
    rows = layout_zonemap_prune(spark, sf_oracle).collect()
    assert {r.l_returnflag for r in rows} <= {"A", "N", "R"} and rows
    assert os.path.exists(os.path.join(out, "_manifest.json"))


def test_bpe_cache_keyed_by_corpus_fingerprint(tmp_path, monkeypatch):
    """ADVICE r2: the lru_cache key must include the corpus
    fingerprint so an in-place regen can't serve stale merges.  Proven
    without Spark: fingerprint the call-through key function."""
    import pserv_spark.operators.tokenize_ops as tok

    calls = []

    def fake_cached(sf_dir, fingerprint):
        calls.append((sf_dir, fingerprint))
        return ((), ())

    monkeypatch.setattr(tok, "_train_cached", fake_cached)
    d = str(tmp_path / "sf")
    os.makedirs(d)
    _plant_parquet(d, "documents.parquet")
    tok._train(d)
    _plant_parquet(d, "documents.parquet", b"y" * 999)  # in-place regen
    tok._train(d)
    assert calls[0][0] == calls[1][0] == d
    assert calls[0][1] != calls[1][1]
