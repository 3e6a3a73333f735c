r"""Golden ingestion tests (mirrors the reference's round-trip strategy,
SURVEY §5.1: FITS→CSV field-by-field golden compare + load-and-select-
back — here CSV→DataFrame→CSV with \N sentinels, NaN, column maps)."""

from __future__ import annotations

import datetime
import math

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pserv_spark.sources import (
    apply_column_mapping,
    calibrate_flux,
    export_csv,
    load_csv,
    write_partitioned,
)

SCHEMA = T.StructType(
    [
        T.StructField("obj_id", T.LongType()),
        T.StructField("flux_counts", T.DoubleType()),
        T.StructField("zp", T.DoubleType()),
        T.StructField("band", T.StringType()),
        T.StructField("obs", T.TimestampNTZType()),
    ]
)


@pytest.fixture()
def golden_csv(tmp_path):
    r"""Handwritten CSV: \N nulls, NaN floats, exercised exactly like
    the reference's golden files."""
    p = tmp_path / "golden"
    p.mkdir()
    (p / "part-000.csv").write_text(
        "obj_id,flux_counts,zp,band,obs\n"
        "1,100.5,31.2,r,2024-01-01 12:00:00\n"
        "2,\\N,31.2,g,2024-01-02 00:00:00\n"
        "3,NaN,30.0,\\N,2024-01-03 06:30:00\n"
    )
    return str(p)


def test_load_csv_golden(spark, golden_csv):
    rows = load_csv(spark, golden_csv, SCHEMA).orderBy("obj_id").collect()
    assert [r.obj_id for r in rows] == [1, 2, 3]
    assert rows[0].flux_counts == 100.5
    assert rows[1].flux_counts is None  # \N sentinel → NULL
    assert math.isnan(rows[2].flux_counts)  # NaN survives distinctly
    assert rows[2].band is None
    assert rows[0].obs == datetime.datetime(2024, 1, 1, 12, 0, 0)


def test_load_csv_column_mapping(spark, golden_csv):
    df = load_csv(
        spark, golden_csv, SCHEMA, mapping={"objectId": "obj_id", "psFlux": "flux_counts"}
    )
    assert df.columns == ["objectId", "psFlux"]
    assert df.count() == 3


def test_export_load_roundtrip(spark, tmp_path):
    src = spark.createDataFrame(
        [
            (1, 0.125, 31.5, "r", datetime.datetime(2024, 3, 1, 1, 2, 3)),
            (2, None, 30.25, None, datetime.datetime(2024, 3, 2, 0, 0, 0)),
            (3, float("nan"), 29.0, "i", None),
        ],
        SCHEMA,
    )
    path = str(tmp_path / "roundtrip")
    export_csv(src, path)
    back = load_csv(spark, path, SCHEMA)
    a = sorted([tuple(r) for r in src.collect()], key=lambda t: t[0])
    b = sorted([tuple(r) for r in back.collect()], key=lambda t: t[0])
    # NaN != NaN, so compare via repr-canonicalization
    assert repr(a) == repr(b)


def test_calibrate_flux(spark):
    df = spark.createDataFrame([(1000.0, 30.0)], "counts double, zero_point double")
    out = calibrate_flux(df).collect()[0]
    assert out.flux == pytest.approx(1000.0 * 10 ** (-0.4 * 30.0))


def test_write_partitioned_zone_layout(spark, tmp_path):
    """Zone-partitioned parquet sink: layout exists, data survives,
    and a zone predicate prunes partitions (SURVEY §4.3 at rest)."""
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 5).alias("zone"),
        F.rand(seed=7).alias("v"),
    )
    path = str(tmp_path / "zoned")
    write_partitioned(df, path, ["zone"])
    import os

    assert sorted(d for d in os.listdir(path) if d.startswith("zone="))[:2] == [
        "zone=0",
        "zone=1",
    ]
    back = spark.read.parquet(path)
    assert back.count() == 100
    pruned = back.where(F.col("zone") == 3)
    assert pruned.count() == 20
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "zone=3" in plan


def test_mapping_preserves_order(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a int, b int, c int")
    out = apply_column_mapping(df, {"z": "c", "y": "a"})
    assert out.columns == ["z", "y"]
    assert out.collect() == [(3, 1)]


def test_pk_layout_files_are_object_clustered(spark, sf_oracle):
    """The PK-dedup ingest must land physically clustered: inside every
    parquet file, rows are non-decreasing on (user_id, ts_us) — the
    property that gives row-group min/max stats their pruning power
    for per-object light-curve lookups."""
    import glob
    import os

    import pandas as pd

    from pserv_spark.fixtures import fixture_path
    from pserv_spark.operators.ingest_ops import ingest_pk_dedup_layout

    ingest_pk_dedup_layout(spark, sf_oracle)  # (re)writes the store
    # the op's real store path (fingerprint-keyed since the ADVICE r2
    # migration) — deriving it any other way checks a stale directory
    out = fixture_path(sf_oracle, "pk_layout")
    files = glob.glob(os.path.join(out, "part-*.parquet"))
    assert len(files) > 1, "expected a multi-file clustered store"
    for f in files:
        pdf = pd.read_parquet(f, columns=["user_id", "ts_us"])
        keys = list(zip(pdf.user_id, pdf.ts_us))
        assert keys == sorted(keys), f"{os.path.basename(f)} not sorted"


def test_fitslike_datasource_roundtrip(spark, tmp_path):
    """Custom Python DataSource: header-declared schema, block
    partitioning, NaN→NULL, string padding strip."""
    from pserv_spark.sources.fitslike import (
        FitsLikeDataSource,
        read_header,
        write_fitslike,
    )

    path = str(tmp_path / "t.dat")
    rows = [(i, float(i) if i % 5 else float("nan"), f"s{i}") for i in range(257)]
    write_fitslike(path, [("k", "K"), ("v", "D"), ("tag", "4A")], rows)
    colspec, nrows, row_bytes, _off, _sk = read_header(path)
    assert colspec == [("k", "K"), ("v", "D"), ("tag", "4A")]
    assert (nrows, row_bytes) == (257, 8 + 8 + 4)

    try:
        spark.dataSource.register(FitsLikeDataSource)
    except Exception:
        pass  # already registered in this session
    df = (
        spark.read.format("fitslike")
        .option("path", path)
        .option("rowsPerBlock", 100)
        .load()
    )
    assert df.schema.simpleString() == "struct<k:bigint,v:double,tag:string>"
    assert df.rdd.getNumPartitions() == 3  # ceil(257/100) row blocks
    got = {r.k: (r.v, r.tag) for r in df.collect()}
    assert len(got) == 257
    assert got[7] == (7.0, "s7")
    assert got[10][0] is None  # NaN -> NULL
    assert got[256] == (256.0, "s256")  # exactly fills the 4A field


def test_fitslike_filter_pushdown_prunes_blocks(spark, tmp_path):
    """pushFilters on the SORTKEY column narrows the row-block list;
    results are identical because all filters stay residual."""
    from pserv_spark.sources.fitslike import FitsLikeDataSource, write_fitslike

    path = str(tmp_path / "sorted.dat")
    write_fitslike(
        path,
        [("k", "K"), ("v", "D")],
        [(i, float(i) * 0.5) for i in range(1000)],
        sort_key="k",
    )
    try:
        spark.dataSource.register(FitsLikeDataSource)
    except Exception:
        pass
    base = (
        spark.read.format("fitslike")
        .option("path", path)
        .option("rowsPerBlock", 100)
        .load()
    )
    assert base.rdd.getNumPartitions() == 10  # no filter: all blocks
    filtered = base.where("k >= 250 AND k < 440")
    # planning happens in a Python worker, so audit via the partition
    # count of the planned scan: rows 250..439 span blocks 2,3,4 ->
    # 3 of 10 blocks survive pruning.
    assert filtered.rdd.getNumPartitions() == 3
    got = sorted(r.k for r in filtered.collect())
    assert got == list(range(250, 440))
    # disjoint range -> zero data blocks survive, still a valid plan
    empty = base.where("k > 5000")
    assert empty.rdd.getNumPartitions() == 1  # the sentinel empty range
    assert empty.count() == 0


def test_quarantine_captures_raw_corrupt_lines(spark, sf_oracle):
    """Both dispositions non-empty; quarantined = exactly the seeded
    corruption pattern."""
    from pserv_spark.operators.ingest_ops import ingest_badrows_quarantine

    rows = {r.disposition: r for r in ingest_badrows_quarantine(spark, sf_oracle).collect()}
    assert set(rows) == {"loaded", "quarantined"}
    assert rows["quarantined"].n_rows > 0
    assert rows["loaded"].n_rows > 10 * rows["quarantined"].n_rows


def test_fits_container_is_strictly_compliant(tmp_path):
    """Pin the real-FITS container grammar (FITS Standard 4.0): a
    dataless primary HDU, fixed-format cards, mandatory BINTABLE
    keywords in standard order, 2880-byte records throughout — so any
    conforming reader (astropy/cfitsio) can open the file."""
    from pserv_spark.sources.fitslike import _BLOCK, read_header, write_fitslike

    path = str(tmp_path / "t.fits")
    rows = [(i, float(i) / 7.0, f"s{i}") for i in range(5)]
    write_fitslike(path, [("k", "K"), ("v", "D"), ("tag", "4A")], rows, sort_key="k")
    raw = open(path, "rb").read()

    assert len(raw) % _BLOCK == 0
    # primary HDU: SIMPLE=T with the logical at byte 30 (fixed format)
    assert raw[:30] == b"SIMPLE  = " + b" " * 19 + b"T"
    prim = raw[:_BLOCK].decode("ascii")
    prim_keys = [prim[i : i + 8].strip() for i in range(0, _BLOCK, 80)]
    assert prim_keys[:4] == ["SIMPLE", "BITPIX", "NAXIS", "END"]
    # extension HDU: mandatory keywords in standard order (§7.3.1)
    ext = raw[_BLOCK : 2 * _BLOCK].decode("ascii")
    ext_keys = [ext[i : i + 8].strip() for i in range(0, _BLOCK, 80)]
    assert ext_keys[:8] == [
        "XTENSION", "BITPIX", "NAXIS", "NAXIS1", "NAXIS2",
        "PCOUNT", "GCOUNT", "TFIELDS",
    ]
    assert ext[:20] == "XTENSION= 'BINTABLE'"
    # every integer card is right-justified to byte 30
    for key, want in [("BITPIX", 8), ("NAXIS", 2), ("NAXIS1", 20),
                      ("NAXIS2", 5), ("PCOUNT", 0), ("GCOUNT", 1),
                      ("TFIELDS", 3)]:
        card = next(ext[i : i + 80] for i in range(0, _BLOCK, 80)
                    if ext[i : i + 8].strip() == key)
        assert card[:30] == f"{key:<8}= {want:>20}", card[:30]
    # data begins at the third record and the header walk agrees
    colspec, n, rb, off, _sk = read_header(path)
    assert off == 2 * _BLOCK and (n, rb) == (5, 20)
    assert colspec == [("k", "K"), ("v", "D"), ("tag", "4A")]


def test_fits_reader_skips_foreign_hdus(tmp_path):
    """A conforming file may carry a non-table extension (e.g. an
    image HDU) before the table — the header walk must skip its data
    area using the §4.4.1 size rule, not assume HDU #2 is the table."""
    from pserv_spark.sources.fitslike import (
        _BLOCK,
        _card_int,
        _card_str,
        _pack_cards,
        primary_hdu,
        read_header,
        write_fitslike,
    )

    table = str(tmp_path / "table_only.fits")
    write_fitslike(table, [("k", "K")], [(7,), (8,)])
    table_raw = open(table, "rb").read()[_BLOCK:]  # ext header + data

    # splice an 1x100-byte IMAGE extension between primary and table
    image_hdr = _pack_cards([
        _card_str("XTENSION", "IMAGE"),
        _card_int("BITPIX", 8),
        _card_int("NAXIS", 2),
        _card_int("NAXIS1", 10),
        _card_int("NAXIS2", 10),
        _card_int("PCOUNT", 0),
        _card_int("GCOUNT", 1),
        "END",
    ])
    image_data = bytes(100) + b"\x00" * ((-100) % _BLOCK)
    spliced = str(tmp_path / "spliced.fits")
    with open(spliced, "wb") as f:
        f.write(primary_hdu() + image_hdr + image_data + table_raw)

    colspec, n, rb, off, _sk = read_header(spliced)
    assert colspec == [("k", "K")] and n == 2 and rb == 8
    assert off == 4 * _BLOCK  # primary + image hdr + image data + table hdr


def _register_fitslike(spark):
    from pserv_spark.sources.fitslike import FitsLikeDataSource

    try:
        spark.dataSource.register(FitsLikeDataSource)
    except Exception:
        pass  # already registered in this session


def test_fitslike_tscal_tzero_scaling(spark, tmp_path):
    """§7.3.2 linear scaling, the astropy conventions: an unsigned-
    integer shift (TSCAL=1, TZERO=2^31 on J) decodes to LongType with
    exact values, and a quantized-float column (TSCAL=0.01 on J)
    decodes to DoubleType; the writer stores (v−TZERO)/TSCAL so the
    round-trip is physical-value-exact."""
    from pserv_spark.sources.fitslike import read_header_ex, write_fitslike

    path = str(tmp_path / "scaled.dat")
    rows = [
        (i, 2147483648 + i * 1000, i * 0.25)  # 0.25 is exact in 0.01? no — see below
        for i in range(100)
    ]
    # use physically-exact quantized values: v = stored*0.01 with stored int
    rows = [(i, 2147483648 + i * 1000, (i * 7) * 0.01) for i in range(100)]
    write_fitslike(
        path,
        [("k", "K"), ("u", "J"), ("flux", "J")],
        rows,
        scales={"u": (1, 2147483648), "flux": (0.01, 0.0)},
    )
    hdr = read_header_ex(path)
    assert hdr.cols[1].int_shift and hdr.cols[1].dtype.simpleString() == "bigint"
    assert hdr.cols[2].dtype.simpleString() == "double"

    _register_fitslike(spark)
    df = spark.read.format("fitslike").option("path", path).load()
    assert (
        df.schema.simpleString() == "struct<k:bigint,u:bigint,flux:double>"
    )
    got = {r.k: (r.u, r.flux) for r in df.collect()}
    assert got[0] == (2147483648, 0.0)
    assert got[3] == (2147483648 + 3000, 21 * 0.01)
    assert got[99] == (2147483648 + 99000, 693 * 0.01)


def test_fitslike_repeat_count_array_column(spark, tmp_path):
    """Fixed repeat counts: '3E' is a 3-element float array column,
    '1D' is a scalar (as astropy writes it)."""
    from pserv_spark.sources.fitslike import write_fitslike

    path = str(tmp_path / "rep.dat")
    rows = [(i, [float(i), float(i + 1), float(i + 2)], float(i) * 0.5) for i in range(50)]
    write_fitslike(path, [("k", "K"), ("vec", "3E"), ("x", "1D")], rows)
    _register_fitslike(spark)
    df = spark.read.format("fitslike").option("path", path).load()
    assert df.schema.simpleString() == "struct<k:bigint,vec:array<float>,x:double>"
    got = {r.k: (r.vec, r.x) for r in df.collect()}
    assert got[4] == ([4.0, 5.0, 6.0], 2.0)
    assert len(got) == 50


def test_fitslike_varlen_p_column_roundtrip(spark, tmp_path):
    """§7.3.5 variable-length arrays: 'PD(n)' descriptors + PCOUNT
    heap.  Lists of different lengths (including empty) round-trip
    exactly, and the header's PCOUNT equals the heap bytes."""
    from pserv_spark.sources.fitslike import read_header_ex, write_fitslike

    path = str(tmp_path / "varlen.dat")
    rows = [
        (i, [float(j) * 0.5 for j in range(i % 4)], f"r{i}")
        for i in range(123)
    ]
    write_fitslike(path, [("k", "K"), ("samples", "PD(3)"), ("tag", "4A")], rows)
    hdr = read_header_ex(path)
    n_elems = sum(i % 4 for i in range(123))
    assert hdr.cols[1].kind == "varlen"
    assert hdr.row_bytes == 8 + 8 + 4  # K + (count, offset) descriptor + 4A

    _register_fitslike(spark)
    df = spark.read.format("fitslike").option("path", path).load()
    assert (
        df.schema.simpleString()
        == "struct<k:bigint,samples:array<double>,tag:string>"
    )
    got = {r.k: (r.samples, r.tag) for r in df.collect()}
    assert got[0] == ([], "r0")
    assert got[7] == ([0.0, 0.5, 1.0], "r7")
    assert got[122] == ([0.0, 0.5], "r122")
    # PCOUNT == heap bytes (doubles)
    import os as _os

    import pserv_spark.sources.fitslike as fl

    with open(path, "rb") as fh:
        fh.seek(0)
        # walk to the bintable header and read PCOUNT directly
        while True:
            cards = fl._read_one_header(fh)
            if "TFIELDS" in cards:
                break
            fh.seek(fl._hdu_data_bytes(cards), _os.SEEK_CUR)
    assert int(cards["PCOUNT"]) == n_elems * 8


def test_fitslike_varlen_streams_identically(spark, tmp_path):
    """The streaming reader shares the row codec, so P-columns stream
    byte-identically to the batch scan."""
    import pyspark.sql.functions as F

    from pserv_spark.sources.fitslike import write_fitslike

    path = str(tmp_path / "vstream.dat")
    rows = [(i, [float(i)] * (i % 3)) for i in range(40)]
    write_fitslike(path, [("k", "K"), ("s", "PE(2)")], rows)
    _register_fitslike(spark)
    stream = (
        spark.readStream.format("fitslike")
        .option("path", path)
        .option("rowsPerBatch", 17)
        .load()
    )
    agg = stream.agg(
        F.count("*").alias("n"), F.sum(F.size("s")).alias("total_elems")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("vstream_sink")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    row = spark.table("vstream_sink").collect()[0]
    assert (row.n, row.total_elems) == (40, sum(i % 3 for i in range(40)))
