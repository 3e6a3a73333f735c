"""Independent invariants for the round-3 model-eval / featurization
family (sf0.001).

The exact-correctness burden sits on the DuckDB oracles
(tests/test_extensions.py runs each new op through the hash gate);
these re-derive the semantics a second way — a pure-Python midrank
AUC over the raw parquet, confusion-matrix identities, per-document
mass conservation — so an engine+oracle co-refactor cannot silently
change meaning.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pyarrow.parquet as pq

from pserv_spark.registry import build_queries


def _rows(spark, sf_smoke, name):
    return build_queries()[name](spark, sf_smoke).collect()


def _events(sf_smoke):
    t = pq.read_table(f"{sf_smoke}/events.parquet", columns=["event_type", "value"])
    return list(zip(t.column("event_type").to_pylist(), t.column("value").to_pylist()))


def test_auc_matches_python_midrank_recount(spark, sf_smoke):
    (r,) = _rows(spark, sf_smoke, "ml_auc_rank")
    ev = [(et, v) for et, v in _events(sf_smoke) if v is not None]
    by_score = Counter(v for _, v in ev)
    pos_by_score = Counter(v for et, v in ev if et == "purchase")
    cum = 0
    r2 = 0  # sum over positives of 2*midrank
    for s in sorted(by_score):
        n = by_score[s]
        r2 += pos_by_score.get(s, 0) * (2 * cum + n + 1)
        cum += n
    npos = sum(pos_by_score.values())
    nneg = cum - npos
    auc = (r2 - npos * (npos + 1)) / (2.0 * npos * nneg)
    assert r.n_pos == npos and r.n_neg == nneg
    assert abs(r.auc - auc) < 1e-6
    assert 0.0 <= r.auc <= 1.0


def test_auc_pr_matches_python_step_recount(spark, sf_smoke):
    import math

    (r,) = _rows(spark, sf_smoke, "ml_auc_pr")
    ev = [(et, v) for et, v in _events(sf_smoke) if v is not None]
    by_score = Counter(v for _, v in ev)
    pos_by_score = Counter(v for et, v in ev if et == "purchase")
    npos = sum(pos_by_score.values())
    cumn = cump = acc = 0
    for s in sorted(by_score, reverse=True):
        n = by_score[s]
        np_ = pos_by_score.get(s, 0)
        cumn += n
        cump += np_
        acc += np_ * math.floor(1e9 * (cump / cumn))
    ap = acc / (1e9 * npos)
    assert r.n_pos == npos and r.n_neg == len(ev) - npos
    assert abs(r.avg_precision - ap) < 1e-6
    # Random scores => AP concentrates near the positive base rate.
    base = npos / len(ev)
    assert 0.5 * base < r.avg_precision < 2.0 * base


def test_auc_label_independent_score_is_near_half(spark, sf_smoke):
    # The synthetic value column is independent of the event type, so
    # the exact AUC must sit near 0.5 (a rank statistic over ~1.2k
    # positives concentrates tightly).
    (r,) = _rows(spark, sf_smoke, "ml_auc_rank")
    assert 0.4 < r.auc < 0.6


def test_calibration_bins_conserve_mass(spark, sf_smoke):
    rows = _rows(spark, sf_smoke, "ml_calibration_bins")
    ev = [(et, v) for et, v in _events(sf_smoke) if v is not None]
    assert sum(r.n for r in rows) == len(ev)
    assert sum(r.n * r.frac_pos for r in rows) - sum(
        1 for et, _ in ev if et == "purchase"
    ) < 1e-3
    for r in rows:
        assert 0 <= r.bin <= 9
        # bin k holds scores in [k/10, (k+1)/10) => mean_pred inside it
        # (bin 9 also absorbs the clamp).
        assert r.bin / 10.0 <= r.mean_pred + 1e-9
        if r.bin < 9:
            assert r.mean_pred < (r.bin + 1) / 10.0 + 1e-9
        assert 0.0 <= r.frac_pos <= 1.0
        assert abs(r.abs_gap - abs(r.mean_pred - r.frac_pos)) < 2e-6


def test_prf1_identities_vs_confusion_matrix(spark, sf_smoke):
    prf1 = {r.lang: r for r in _rows(spark, sf_smoke, "text_langid_prf1")}
    cells = _rows(spark, sf_smoke, "text_langid_confusion")
    diag = {r.true_lang: r.n for r in cells if r.true_lang == r.pred_lang}
    row_tot, col_tot = defaultdict(int), defaultdict(int)
    for c in cells:
        row_tot[c.true_lang] += c.n
        col_tot[c.pred_lang] += c.n
    assert set(prf1) == set(row_tot) | set(col_tot)
    for lang, r in prf1.items():
        assert r.n_tp == diag.get(lang, 0)
        assert r.n_true == row_tot.get(lang, 0)
        assert r.n_pred == col_tot.get(lang, 0)
        if r.n_pred:
            assert abs(r.precision - r.n_tp / r.n_pred) < 1e-6
        else:
            assert r.precision is None
        if r.n_true:
            assert abs(r.recall - r.n_tp / r.n_true) < 1e-6
        # F1 = 2PR/(P+R) == 2*tp/(n_pred+n_true)
        assert abs(r.f1 - 2.0 * r.n_tp / (r.n_pred + r.n_true)) < 1e-6


def test_bm25_ndcg_matches_python_recount(spark, sf_smoke):
    import math

    from pserv_spark.operators.search_ops import _QUERY_TERMS, _TOPK

    (r,) = _rows(spark, sf_smoke, "text_bm25_ndcg")
    ranked = sorted(_rows(spark, sf_smoke, "text_bm25_topk"), key=lambda x: x.rk)
    t = pq.read_table(f"{sf_smoke}/documents.parquet", columns=["doc_id", "text"])
    rel = {}
    for d, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        g = sum(1 for q in _QUERY_TERMS if q in x.split(" "))
        if g:
            rel[d] = g

    def gain(g, pos):
        return math.floor(1e9 * (2.0**g - 1.0) / math.log2(pos + 1.0))

    dcg = sum(gain(rel.get(row.doc_id, 0), i + 1) for i, row in enumerate(ranked))
    ideal = sorted(rel.items(), key=lambda kv: (-kv[1], kv[0]))[:_TOPK]
    idcg = sum(gain(g, i + 1) for i, (_, g) in enumerate(ideal))
    assert r.n_ranked == len(ranked) <= _TOPK
    assert abs(r.dcg - dcg / 1e9) < 1e-6
    assert abs(r.idcg - idcg / 1e9) < 1e-6
    assert abs(r.ndcg - dcg / idcg) < 1e-6
    assert 0.0 <= r.ndcg <= 1.0


def test_hashing_trick_conserves_tokens(spark, sf_smoke):
    rows = _rows(spark, sf_smoke, "feat_hashing_trick")
    t = pq.read_table(f"{sf_smoke}/documents.parquet", columns=["doc_id", "text"])
    docs = {
        d: len(x.split(" "))
        for d, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
        if d < 30
    }
    per_doc_cnt, per_doc_tf = defaultdict(int), defaultdict(float)
    for r in rows:
        assert 0 <= r.bucket < 64
        assert r.cnt >= 1
        per_doc_cnt[r.doc_id] += r.cnt
        per_doc_tf[r.doc_id] += r.tf
    assert per_doc_cnt == docs  # every token lands in exactly one bucket
    for d, s in per_doc_tf.items():
        assert abs(s - 1.0) < 1e-4  # tf sums to 1 per document


def test_psi_matches_python_recount(spark, sf_smoke):
    """Pure-Python replay of profile_psi_drift: same midpoint split,
    same 10-bin histogram, same Laplace smoothing and term
    quantization — over the raw parquet, independent of both
    engines."""
    import math

    t = pq.read_table(
        f"{sf_smoke}/events.parquet", columns=["event_type", "value", "ts"]
    )
    ev = [
        (e, v, ts)
        for e, v, ts in zip(
            t.column("event_type").to_pylist(),
            t.column("value").to_pylist(),
            t.column("ts").cast("int64").to_pylist(),  # epoch micros = ts_us
        )
        if v is not None
    ]
    lo = min(ts for _, _, ts in ev)
    hi = max(ts for _, _, ts in ev)
    per = defaultdict(lambda: (Counter(), Counter()))
    for e, v, ts in ev:
        b = min(int(math.floor(v / 50.0)), 9)
        per[e][0 if 2 * ts <= lo + hi else 1][b] += 1
    out = {r.event_type: r for r in _rows(spark, sf_smoke, "profile_psi_drift")}
    assert set(out) == set(per)
    for e, (c1, c2) in per.items():
        n1, n2 = sum(c1.values()), sum(c2.values())
        acc = 0
        for b in range(10):
            p1 = (c1.get(b, 0) + 1) / (n1 + 10)
            p2 = (c2.get(b, 0) + 1) / (n2 + 10)
            acc += math.floor(1e9 * ((p2 - p1) * math.log(p2 / p1)))
        r = out[e]
        assert r.n_early == n1 and r.n_late == n2
        assert abs(r.psi - acc / 1e9) < 1e-6
        # every PSI term is (p2-p1)*ln(p2/p1) >= 0
        assert r.psi >= 0.0


def test_l_diversity_matches_python_recount(spark, sf_smoke):
    """Pure-Python replay of privacy_l_diversity over the raw parquet:
    class sizes, distinct sensitive counts, compliance flags and the
    homogeneity-attack share, plus release-mass conservation."""
    o = pq.read_table(
        f"{sf_smoke}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )
    c = pq.read_table(
        f"{sf_smoke}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_mktsegment"],
    )
    qi = {
        k: (n, s)
        for k, n, s in zip(
            c.column("c_custkey").to_pylist(),
            c.column("c_nationkey").to_pylist(),
            c.column("c_mktsegment").to_pylist(),
        )
    }
    per_class = defaultdict(Counter)
    joined = 0
    for k, p in zip(
        o.column("o_custkey").to_pylist(), o.column("o_orderpriority").to_pylist()
    ):
        if k in qi:
            per_class[qi[k]][p] += 1
            joined += 1
    rows = _rows(spark, sf_smoke, "privacy_l_diversity")
    assert len(rows) == len(per_class)
    total = 0
    for r in rows:
        sens = per_class[(r.c_nationkey, r.c_mktsegment)]
        size = sum(sens.values())
        assert r.class_size == size
        assert r.n_sensitive_distinct == len(sens)
        assert r.meets_l == (len(sens) >= 3)
        assert abs(r.top_sensitive_share - max(sens.values()) / size) < 1e-6
        total += size
    assert total == joined  # the audit covers the whole release


def test_curate_funnel_matches_python_replay(spark, sf_smoke):
    """Pure-Python replay of the composed curation funnel: every stage
    (exact dedup by content hash, the four quality rules, per-language
    1024-token bin packing) recomputed from the raw parquet, plus the
    monotone-funnel invariant."""
    import math

    rows = {r.stage: r for r in _rows(spark, sf_smoke, "pipeline_curate_e2e")}
    assert [rows[s].stage_ord for s in ("raw", "exact_dedup", "quality", "packed")] == [
        1,
        2,
        3,
        4,
    ]
    t = pq.read_table(
        f"{sf_smoke}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    docs = sorted(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("lang").to_pylist(),
            t.column("text").to_pylist(),
        )
    )
    ntok = {d: len(x.split(" ")) for d, _, x in docs}
    assert rows["raw"].n_docs == len(docs)
    assert rows["raw"].n_tokens == sum(ntok.values())

    first_by_text = {}
    for d, _, x in docs:
        first_by_text.setdefault(x, d)
    dd = {first_by_text[x] for x in first_by_text}
    assert rows["exact_dedup"].n_docs == len(dd)
    assert rows["exact_dedup"].n_tokens == sum(ntok[d] for d in dd)

    kept = []
    for d, lang, x in docs:
        if d not in dd:
            continue
        ws = x.split(" ")
        n = len(ws)
        dr = len(set(ws)) / n
        sr = sum(1 for w in ws if w in ("the", "a")) / n
        if 15 <= n <= 500 and dr >= 0.35 and sr <= 0.12:
            kept.append((d, lang, n))
    assert rows["quality"].n_docs == len(kept)
    assert rows["packed"].n_docs == len(kept)
    assert rows["quality"].n_tokens == rows["packed"].n_tokens

    bins = set()
    cum = Counter()
    for d, lang, n in kept:  # kept is doc_id-sorted
        bins.add((lang, math.floor(cum[lang] / 1024)))
        cum[lang] += n
    assert rows["packed"].n_bins == len(bins)
    # funnel is monotone and only the final stage reports bins
    assert rows["raw"].n_docs >= rows["exact_dedup"].n_docs >= rows["quality"].n_docs
    assert rows["raw"].n_bins == rows["exact_dedup"].n_bins == 0


def test_lift_gains_matches_python_recount(spark, sf_smoke):
    """Pure-Python replay of the gains/lift table: distinct-score
    descending cumulative counts, tie groups assigned to the decile of
    their last row, per-decile maxima — plus the structural
    invariants (gain monotone, final gain = 1, final lift = 1)."""
    import math

    rows = sorted(
        _rows(spark, sf_smoke, "ml_lift_gains_curve"), key=lambda r: r.decile
    )
    ev = [(et, v) for et, v in _events(sf_smoke) if v is not None]
    by_score = Counter(v for _, v in ev)
    pos_by_score = Counter(v for et, v in ev if et == "purchase")
    nt = len(ev)
    pt = sum(pos_by_score.values())
    per_dec = {}
    cumn = cump = 0
    for s in sorted(by_score, reverse=True):
        cumn += by_score[s]
        cump += pos_by_score.get(s, 0)
        dec = math.ceil(cumn * 10.0 / nt)
        per_dec[dec] = (cumn, cump)  # later (larger-cum) rows win = MAX
    assert [r.decile for r in rows] == sorted(per_dec)
    for r in rows:
        cn, cp = per_dec[r.decile]
        assert (r.n_cum, r.pos_cum) == (cn, cp)
        assert abs(r.gain - cp / pt) < 1e-6
        assert abs(r.lift - (cp / pt) / (cn / nt)) < 1e-6
    gains = [r.gain for r in rows]
    assert gains == sorted(gains)  # cumulative gain is monotone
    assert abs(rows[-1].gain - 1.0) < 1e-9  # all positives captured
    assert abs(rows[-1].lift - 1.0) < 1e-9  # lift at 100% depth is 1


def test_target_encode_matches_python_recount(spark, sf_smoke):
    """Per-row leave-one-out replay over the raw parquet: every
    encoded value equals (category sum - own label) / (n - 1)."""
    t = pq.read_table(
        f"{sf_smoke}/orders.parquet", columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    )
    from decimal import ROUND_HALF_UP, Decimal

    cents = {}
    agg = defaultdict(lambda: [0, 0])  # category -> [n, sum_cents]
    for k, cat, p in zip(
        t.column("o_orderkey").to_pylist(),
        t.column("o_orderpriority").to_pylist(),
        t.column("o_totalprice").to_pylist(),
    ):
        c = int(Decimal(str(p)).quantize(Decimal("0.01"), ROUND_HALF_UP) * 100)
        cents[k] = (cat, c)
        agg[cat][0] += 1
        agg[cat][1] += c
    rows = _rows(spark, sf_smoke, "feat_target_encode")
    assert len(rows) == t.num_rows
    for r in rows:
        cat, c = cents[r.o_orderkey]
        n, s = agg[cat]
        assert r.category == cat and r.n_cat == n
        assert abs(r.loo_target_mean - (s - c) / (100.0 * (n - 1))) < 1e-6


def test_stream_psi_monitor_invariants(spark, sf_smoke):
    """The streaming drift monitor's store must conserve event mass
    (sum of per-day counts == non-null-value events) and every per-day
    PSI vs the all-time reference is non-negative (each term is
    (p-q)*ln(p/q) >= 0)."""
    rows = _rows(spark, sf_smoke, "stream_psi_monitor")
    ev = [v for _, v in _events(sf_smoke) if v is not None]
    assert sum(r.n_day for r in rows) == len(ev)
    assert len(rows) > 1  # multiple daily windows actually emitted
    for r in rows:
        assert r.psi >= 0.0
