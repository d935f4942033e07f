"""Frequency sketches: exact heavy hitters (Space-Saving + recount)
and the Count-Min artifact (functions/sketch.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.functions import sketch as sk
from xarray_spatial_spark.functions import sketch as sk_mod


def _zipf_df(spark, n=20_000, n_keys=400, seed=7):
    """Deterministic zipfian key stream: key i appears ~ n/(i+1)."""
    rows = []
    i = 0
    while len(rows) < n:
        key = f"host{i % n_keys:04d}"
        reps = max(1, n_keys // (i % n_keys + 1))
        rows.extend([(key,)] * reps)
        i += 1
    return spark.createDataFrame(rows[:n], ["host"])


def _exact_topk(df, col, k):
    return [
        (r[col], r["cnt"])
        for r in df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col(col).asc()).limit(k).collect()
    ]


class TestHeavyHitters:
    def test_matches_exact_topk_on_zipf(self, spark):
        df = _zipf_df(spark).repartition(8)
        got = sk.heavy_hitters(df, "host", k=10, m=128).collect()
        assert [(r["host"], r["cnt"]) for r in got] == _exact_topk(df, "host", 10)
        assert all(r["guaranteed"] for r in got)

    def test_parallelism_invariance(self, spark):
        df = _zipf_df(spark)
        a = sk.heavy_hitters(df.repartition(3), "host", k=5, m=256).collect()
        b = sk.heavy_hitters(df.repartition(17), "host", k=5, m=256).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]

    def test_planted_heavy_key_always_found(self, spark):
        base = spark.range(5000).select(
            F.concat(F.lit("k"), (F.col("id") % 997).cast("string")).alias("host"))
        heavy = spark.range(1200).select(F.lit("MEGAHOST").alias("host"))
        df = base.unionAll(heavy).repartition(16)
        got = sk.heavy_hitters(df, "host", k=1, m=64).collect()
        assert got[0]["host"] == "MEGAHOST" and got[0]["cnt"] == 1200
        assert got[0]["guaranteed"]

    def test_uniform_small_m_counts_still_exact(self, spark):
        # near-uniform keys with a tiny summary: the certificate must
        # withdraw, but every returned count is still a real recount
        df = spark.range(4000).select(
            (F.col("id") % 1000).cast("string").alias("host")).repartition(8)
        got = sk.heavy_hitters(df, "host", k=5, m=8)
        exact = {r["host"]: r["cnt"]
                 for r in df.groupBy("host").agg(
                     F.count(F.lit(1)).alias("cnt")).collect()}
        for r in got.collect():
            assert r["cnt"] == exact[r["host"]]
            assert not r["guaranteed"]

    def test_uniform_still_returns_k_rows(self, spark):
        # regression: a batched Misra-Gries decrement can wipe every
        # counter on near-uniform data and return NOTHING; the
        # Space-Saving summary never empties, so top-k always has
        # min(k, distinct) rows
        df = spark.range(20_000).select(
            (F.col("id") % 37).cast("string").alias("host")).repartition(8)
        got = sk.heavy_hitters(df, "host", k=3, m=16).collect()
        assert len(got) == 3
        exact = dict(_exact_topk(df, "host", 37))
        for r in got:
            assert r["cnt"] == exact[r["host"]]

    def test_lossless_certificate_when_no_eviction(self, spark):
        # 3 distinct keys, m=64: no partition ever evicts, so the
        # top-k is certified even though counts sit under any N/m bar
        df = spark.createDataFrame(
            [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2, ["host"]).repartition(4)
        got = sk.heavy_hitters(df, "host", k=3, m=64).collect()
        assert [(r["host"], r["cnt"]) for r in got] == [("a", 5), ("b", 3), ("c", 2)]
        assert all(r["guaranteed"] for r in got)

    def test_m_smaller_than_k_raises(self, spark):
        with pytest.raises(ValueError):
            sk.heavy_hitters(_zipf_df(spark, n=100), "host", k=10, m=4)


class TestCountMin:
    def test_never_undercounts_and_bounded_over(self, spark):
        df = _zipf_df(spark, n=10_000).repartition(8)
        w, d = sk.cms_params(eps=0.005, delta=0.01)
        sketch = sk.cms_build(df, "host", w, d)
        n_total = df.count()
        exact = {r["host"]: r["cnt"]
                 for r in df.groupBy("host").agg(
                     F.count(F.lit(1)).alias("cnt")).collect()}
        keys = spark.createDataFrame([(h,) for h in exact], ["host"])
        est = {r["host"]: r["est"]
               for r in keys.select(
                   "host", sk.cms_estimate(spark, sketch, "host").alias("est"))
               .collect()}
        for h, true in exact.items():
            assert est[h] >= true, h
            assert est[h] <= true + 0.005 * n_total + 1, h

    def test_merge_equals_build_over_union(self, spark):
        a = _zipf_df(spark, n=3000, seed=1)
        b = _zipf_df(spark, n=2000, seed=2).withColumn(
            "host", F.concat(F.lit("x"), F.col("host")))
        w, d = 1024, 4
        merged = sk.cms_merge(sk.cms_build(a, "host", w, d),
                              sk.cms_build(b, "host", w, d))
        whole = sk.cms_build(a.unionAll(b), "host", w, d)
        assert np.array_equal(merged, whole)

    def test_save_load_roundtrip(self, spark, tmp_path):
        df = _zipf_df(spark, n=1000)
        sketch = sk.cms_build(df, "host", 512, 3)
        p = str(tmp_path / "cms.parquet")
        sk.cms_save(sketch, p)
        loaded = sk.cms_load(p)
        assert loaded.shape == (3, 512)
        assert np.array_equal(loaded, sketch)

    def test_load_rejects_non_artifact(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        p = str(tmp_path / "not_cms.parquet")
        pq.write_table(pa.table({"cnt": pa.array([1, 2])}), p)
        with pytest.raises(ValueError):
            sk.cms_load(p)

    def test_merge_rejects_mismatched_shapes(self, spark):
        with pytest.raises(ValueError):
            sk.cms_merge(np.zeros((2, 8), np.int64), np.zeros((2, 16), np.int64))

    def test_params_sane(self):
        w, d = sk.cms_params(eps=0.001, delta=0.01)
        assert w >= int(np.e / 0.001) and d >= 5


class TestHLL:
    def test_idx_rho_match_python_bit_ops(self, spark):
        # known longs through the Catalyst extraction vs plain python
        p = 12
        vals = [1, -1, 0, 2**63 - 1, -2**63, 123456789123456789,
                -42, 1 << 52, (1 << 52) - 1, 7]
        df = spark.createDataFrame([(v,) for v in vals], "h long")
        idx, rho = sk._hll_idx_rho(F.col("h"), p)
        got = {r["h"]: (r["i"], r["r"])
               for r in df.select("h", idx.alias("i"), rho.alias("r")).collect()}
        for v in vals:
            u = v & 0xFFFFFFFFFFFFFFFF
            exp_idx = u >> (64 - p)
            w = (u << p) & 0xFFFFFFFFFFFFFFFF
            exp_rho = (64 - p + 1) if w == 0 else (65 - w.bit_length())
            assert got[v] == (exp_idx, exp_rho), v

    def test_cardinality_accuracy(self, spark):
        p = 12  # stderr ~= 1.04/sqrt(4096) = 1.6%
        n = 20_000
        df = spark.range(n).select(
            F.concat(F.lit("url"), F.col("id")).alias("u"))
        est = sk.hll_cardinality(sk.hll_build(df, "u", p))
        assert abs(est / n - 1) < 3 * 1.04 / np.sqrt(1 << p)

    def test_small_range_linear_counting_is_near_exact(self, spark):
        df = spark.range(1000).select(
            F.concat(F.lit("h"), (F.col("id") % 10).cast("string")).alias("u"))
        est = sk.hll_cardinality(sk.hll_build(df, "u", p=14))
        assert round(est) == 10

    def test_merge_equals_concatenated_build(self, spark):
        a = spark.range(0, 6000).select(F.concat(F.lit("u"), F.col("id")).alias("u"))
        b = spark.range(4000, 9000).select(F.concat(F.lit("u"), F.col("id")).alias("u"))
        merged = sk.hll_merge(sk.hll_build(a, "u", 10), sk.hll_build(b, "u", 10))
        both = sk.hll_build(a.unionAll(b), "u", 10)
        assert np.array_equal(merged, both)

    def test_parallelism_invariance(self, spark):
        df = spark.range(5000).select(F.concat(F.lit("u"), F.col("id")).alias("u"))
        r1 = sk.hll_build(df.repartition(1), "u", 11)
        r2 = sk.hll_build(df.repartition(16), "u", 11)
        assert np.array_equal(r1, r2)

    def test_save_load_roundtrip(self, spark, tmp_path):
        df = spark.range(3000).select(F.concat(F.lit("u"), F.col("id")).alias("u"))
        regs = sk.hll_build(df, "u", 10)
        path = str(tmp_path / "hll.parquet")
        sk.hll_save(regs, path)
        back = sk.hll_load(path)
        assert np.array_equal(regs, back)
        assert sk.hll_cardinality(back) == sk.hll_cardinality(regs)

    def test_load_rejects_foreign_artifact(self, spark, tmp_path):
        path = str(tmp_path / "cms.parquet")
        sk.cms_save(np.zeros((2, 8), np.int64), path)
        with pytest.raises(ValueError, match="hll_save artifact"):
            sk.hll_load(path)

    def test_grouped_matches_global_formula(self, spark):
        # per-key Catalyst estimate == numpy estimate on that key's slice
        df = spark.range(12_000).select(
            (F.col("id") % 3).cast("string").alias("k"),
            F.concat(F.lit("u"), (F.col("id") % 2000).cast("string")).alias("u"),
        )
        grouped = {r["k"]: r["distinct_est"]
                   for r in sk.hll_distinct(df, "k", "u", p=10).collect()}
        assert set(grouped) == {"0", "1", "2"}
        for k in grouped:
            regs = sk.hll_build(df.filter(F.col("k") == k), "u", 10)
            assert grouped[k] == pytest.approx(sk.hll_cardinality(regs), rel=1e-9)

    def test_grouped_accuracy_and_null_drop(self, spark):
        df = spark.range(8000).select(
            F.lit("a").alias("k"),
            F.when(F.col("id") % 8 != 7,
                   F.concat(F.lit("u"), F.col("id"))).alias("u"))
        n = 7000  # 1/8 of rows are NULL and must not hash into a register
        est = sk.hll_distinct(df, "k", "u", p=12).collect()[0]["distinct_est"]
        assert abs(est / n - 1) < 3 * 1.04 / np.sqrt(1 << 12)

    def test_merge_rejects_mismatched_sizes(self):
        with pytest.raises(ValueError, match="mismatched"):
            sk.hll_merge(np.zeros(16, np.uint8), np.zeros(32, np.uint8))
        with pytest.raises(ValueError, match="at least one"):
            sk.hll_merge()

    def test_bad_precision_rejected(self, spark):
        df = spark.range(5).select(F.col("id").cast("string").alias("u"))
        with pytest.raises(ValueError, match="outside"):
            sk.hll_build(df, "u", p=3)
        with pytest.raises(ValueError, match="outside"):
            sk.hll_distinct(df, "u", "u", p=19)


class TestKLL:
    def test_small_n_is_exact(self, spark):
        # below the compaction budget nothing is ever discarded
        df = spark.range(100).select((F.col("id") * 3).cast("double").alias("v"))
        sk = sk_kll = sk_mod.kll_build(df, "v", k=200)
        assert sk.n == 100
        got = sk.quantiles([0.0, 0.25, 0.5, 1.0])
        assert list(got) == [0.0, 72.0, 147.0, 297.0]
        assert sk.rank(147.0) == 50

    def test_rank_error_bound_across_layouts(self, spark):
        n = 60_000
        df = spark.range(n).select(
            (F.pow(F.col("id") % 1000, 2.0)).alias("v"))  # skewed
        exact = np.sort(np.array([(i % 1000) ** 2 for i in range(n)], float))
        for parts in (1, 7, 32):
            sk = sk_mod.kll_build(df.repartition(parts), "v", k=200)
            assert sk.n == n
            qs = np.linspace(0.05, 0.95, 19)
            est = sk.quantiles(qs)
            err = max(abs(np.searchsorted(exact, e, side="right") / n - q)
                      for e, q in zip(est, qs))
            assert err < 0.03, (parts, err)

    def test_fixed_layout_reproducible(self, spark):
        df = spark.range(30_000).select(
            ((F.col("id") * 2654435761) % 100_000).cast("double").alias("v")
        ).repartition(8, "v")
        a = sk_mod.kll_build(df, "v", k=128)
        b = sk_mod.kll_build(df, "v", k=128)
        assert a.n == b.n
        assert all(np.array_equal(x, y) for x, y in zip(a.levels, b.levels))

    def test_merge_preserves_bound_and_n(self, spark):
        n = 40_000
        df = spark.range(n).select((F.col("id") % 5000).cast("double").alias("v"))
        lo = sk_mod.kll_build(df.filter(F.col("v") < 2500), "v", 200)
        hi = sk_mod.kll_build(df.filter(F.col("v") >= 2500), "v", 200)
        m = sk_mod.kll_merge(lo, hi)
        assert m.n == n
        qs = [0.1, 0.5, 0.9]
        exact = np.sort(np.array([i % 5000 for i in range(n)], float))
        for e, q in zip(m.quantiles(qs), qs):
            assert abs(np.searchsorted(exact, e, side="right") / n - q) < 0.03

    def test_merge_rejects_mismatched_k(self):
        with pytest.raises(ValueError, match="mismatched k"):
            sk_mod.kll_merge(sk_mod.KLL(64), sk_mod.KLL(128))

    def test_save_load_roundtrip(self, spark, tmp_path):
        df = spark.range(25_000).select(
            (F.col("id") % 777).cast("double").alias("v"))
        sk = sk_mod.kll_build(df, "v", 200)
        path = str(tmp_path / "kll.parquet")
        sk_mod.kll_save(sk, path)
        back = sk_mod.kll_load(path)
        assert back.n == sk.n and back.k == sk.k
        assert np.array_equal(back.quantiles([0.1, 0.5, 0.9]),
                              sk.quantiles([0.1, 0.5, 0.9]))

    def test_load_rejects_foreign_artifact(self, tmp_path):
        path = str(tmp_path / "hll.parquet")
        sk_mod.hll_save(np.zeros(16, np.uint8), path)
        with pytest.raises(ValueError, match="kll_save artifact"):
            sk_mod.kll_load(path)

    def test_rank_col_probe(self, spark):
        n = 50_000
        df = spark.range(n).select((F.col("id") % 10_000).cast("double").alias("v"))
        sk = sk_mod.kll_build(df, "v", 256)
        probe = df.limit(0).sparkSession.createDataFrame(
            [(0.0,), (2500.0,), (5000.0,), (9999.0,), (None,)], "v double")
        got = {r["v"]: r["p"] for r in probe.select(
            "v", sk_mod.kll_rank_col(spark, sk, "v").alias("p")).collect()}
        assert abs(got[2500.0] - 0.25) < 0.03
        assert abs(got[5000.0] - 0.50) < 0.03
        assert abs(got[9999.0] - 1.00) < 0.03
        assert got[None] is None or np.isnan(got[None])

    def test_bad_inputs(self, spark):
        with pytest.raises(ValueError, match=">= 8"):
            sk_mod.KLL(4)
        sk = sk_mod.KLL(64)
        with pytest.raises(ValueError, match="empty sketch"):
            sk.quantiles([0.5])
        sk.update(np.array([1.0, 2.0]))
        with pytest.raises(ValueError, match="in \\[0, 1\\]"):
            sk.quantiles([1.5])
        with pytest.raises(ValueError, match="at least one"):
            sk_mod.kll_merge()


class TestKLLGrouped:
    def test_group_quantiles_within_band(self, spark):
        n = 30_000
        df = spark.range(n).select(
            (F.col("id") % 3).cast("string").alias("g"),
            # per-group distinct shapes: g scales the value range
            ((F.col("id") % 1000) * (F.col("id") % 3 + 1)).cast("double").alias("v"))
        got = sk_mod.kll_group_quantiles(df, "g", "v", [0.25, 0.5, 0.9], k=256)
        rows = got.collect()
        assert len(rows) == 9
        by = {}
        for r in rows:
            by.setdefault(r["g"], {})[r["q"]] = r["value"]
        import numpy as np_
        for g in ("0", "1", "2"):
            vals = np.sort(np.array(
                [(i % 1000) * (i % 3 + 1) for i in range(n) if i % 3 == int(g)],
                float))
            for q, est in by[g].items():
                rank = np.searchsorted(vals, est, side="right") / len(vals)
                assert abs(rank - q) < 0.03, (g, q, rank)

    def test_group_quantiles_multi_key_and_empty_qs(self, spark):
        df = spark.range(1000).select(
            (F.col("id") % 2).alias("a"), (F.col("id") % 5).alias("b"),
            F.col("id").cast("double").alias("v"))
        got = sk_mod.kll_group_quantiles(df, ["a", "b"], "v", [0.5])
        assert got.count() == 10
        with pytest.raises(ValueError, match="non-empty"):
            sk_mod.kll_group_quantiles(df, "a", "v", [])

    def test_ks_distance(self, spark):
        base = spark.range(20_000).select(
            (F.col("id") % 4000).cast("double").alias("v"))
        same = sk_mod.kll_build(base, "v", 256)
        assert sk_mod.kll_ks_distance(same, same) == 0.0
        shifted = sk_mod.kll_build(
            base.select((F.col("v") + 10_000).alias("v")), "v", 256)
        assert sk_mod.kll_ks_distance(same, shifted) > 0.99
        # half the mass moved -> KS ~= 0.5 within the rank-error band
        half = sk_mod.kll_build(
            base.select(F.when(F.col("v") < 2000, F.col("v"))
                        .otherwise(F.col("v") + 10_000).alias("v")), "v", 256)
        assert abs(sk_mod.kll_ks_distance(same, half) - 0.5) < 0.03
        with pytest.raises(ValueError, match="non-empty"):
            sk_mod.kll_ks_distance(sk_mod.KLL(64), same)


class TestKMV:
    def test_cardinality_accuracy_and_small_exact(self, spark):
        df = spark.range(50_000).select(
            F.concat(F.lit("u"), F.col("id")).alias("u"))
        sk = sk_mod.kmv_build(df, "u", k=1024)
        est = sk_mod.kmv_cardinality(sk, k=1024)
        assert abs(est / 50_000 - 1) < 3 / np.sqrt(1022)
        tiny = sk_mod.kmv_build(df.limit(100), "u", k=1024)
        assert sk_mod.kmv_cardinality(tiny, k=1024) == 100.0

    def test_union_equals_build_over_union(self, spark):
        a = spark.range(0, 30_000).select(F.concat(F.lit("u"), F.col("id")).alias("u"))
        b = spark.range(20_000, 45_000).select(F.concat(F.lit("u"), F.col("id")).alias("u"))
        u = sk_mod.kmv_union(sk_mod.kmv_build(a, "u", 512),
                             sk_mod.kmv_build(b, "u", 512), k=512)
        both = sk_mod.kmv_build(a.unionAll(b), "u", 512)
        assert np.array_equal(u, both)

    def test_intersection_of_snapshots(self, spark):
        # crawl A: urls 0..40k; crawl B: urls 30k..70k -> overlap 10k
        a = spark.range(0, 40_000).select(F.concat(F.lit("u"), F.col("id")).alias("u"))
        b = spark.range(30_000, 70_000).select(F.concat(F.lit("u"), F.col("id")).alias("u"))
        ska = sk_mod.kmv_build(a, "u", 2048)
        skb = sk_mod.kmv_build(b, "u", 2048)
        est = sk_mod.kmv_intersection(ska, skb, k=2048)
        # intersection error scales with the UNION size over theta;
        # generous 20% band for a 1/7 overlap at k=2048
        assert abs(est / 10_000 - 1) < 0.20, est
        # disjoint sets -> (near) zero
        c = spark.range(100_000, 140_000).select(
            F.concat(F.lit("u"), F.col("id")).alias("u"))
        skc = sk_mod.kmv_build(c, "u", 2048)
        assert sk_mod.kmv_intersection(ska, skc, k=2048) < 500

    def test_exact_small_sets_intersect_exactly(self, spark):
        a = spark.range(0, 300).select(F.concat(F.lit("u"), F.col("id")).alias("u"))
        b = spark.range(200, 500).select(F.concat(F.lit("u"), F.col("id")).alias("u"))
        est = sk_mod.kmv_intersection(
            sk_mod.kmv_build(a, "u", 1024), sk_mod.kmv_build(b, "u", 1024),
            k=1024)
        assert est == 100.0  # both sketches below k: EXACT

    def test_parallelism_invariance_and_dedup(self, spark):
        df = spark.range(9000).select((F.col("id") % 3000).alias("v"))
        s1 = sk_mod.kmv_build(df.repartition(1), "v", 256)
        s2 = sk_mod.kmv_build(df.repartition(17), "v", 256)
        assert np.array_equal(s1, s2)  # k global minima: layout-free
        assert abs(sk_mod.kmv_cardinality(s1, 256) / 3000 - 1) < 3 / np.sqrt(254)

    def test_save_load_and_bad_inputs(self, spark, tmp_path):
        df = spark.range(5000).select(F.concat(F.lit("u"), F.col("id")).alias("u"))
        sk = sk_mod.kmv_build(df, "u", 256)
        path = str(tmp_path / "kmv.parquet")
        sk_mod.kmv_save(sk, 256, path)
        back, k = sk_mod.kmv_load(path)
        assert k == 256 and np.array_equal(back, sk)
        sk_mod.hll_save(np.zeros(16, np.uint8), str(tmp_path / "hll.parquet"))
        with pytest.raises(ValueError, match="kmv_save artifact"):
            sk_mod.kmv_load(str(tmp_path / "hll.parquet"))
        with pytest.raises(ValueError, match=">= 16"):
            sk_mod.kmv_build(df, "u", k=4)

    def test_duplicate_skew_does_not_collapse_theta(self, spark):
        # one url repeated 50k times next to 3k distinct others: the
        # megaurl's hash must occupy ONE slot, not flood the k minima
        mega = spark.range(50_000).select(F.lit("https://mega").alias("u"))
        rest = spark.range(3000).select(
            F.concat(F.lit("u"), F.col("id")).alias("u"))
        sk = sk_mod.kmv_build(mega.unionAll(rest).repartition(16), "u", 256)
        assert np.unique(sk).size == sk.size == 256
        est = sk_mod.kmv_cardinality(sk, 256)
        assert abs(est / 3001 - 1) < 3 / np.sqrt(254)
