"""Dedup + similarity operator tests.

The LSH operators have no SQL oracle (driver records rows-only); here
we cross-check them against exact computations on small data."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark.operators import dedup, similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    # plant exact and near duplicates with known ids
    dup = base.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    near = base.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra token")).alias("text"),
        "lang", "source", "n_chars",
    )
    return base.unionByName(dup).unionByName(near)


def test_minhash_lsh_finds_planted_dups(spark, docs_with_dups):
    pairs = dedup.minhash_lsh_pairs(
        spark, docs_with_dups, threshold=0.8, k=64, bands=16
    ).collect()
    found = {(r["ida"], r["idb"]) for r in pairs}
    for i in range(5):
        assert (i, i + 100000) in found, f"exact dup {i} missed"
    # exact dups estimate ~1.0
    est = {(r["ida"], r["idb"]): r["est_jaccard"] for r in pairs}
    for i in range(5):
        assert est[(i, i + 100000)] >= 0.95


def test_minhash_estimate_tracks_true_jaccard(spark, docs_with_dups):
    """Near-dups (one extra token): estimated Jaccard close to exact."""
    pairs = dedup.minhash_lsh_pairs(
        spark, docs_with_dups, threshold=0.3, k=128, bands=32, shingle=1
    ).collect()
    est = {(r["ida"], r["idb"]): r["est_jaccard"] for r in pairs}
    rows = {r["doc_id"]: r["text"] for r in docs_with_dups.collect()}
    for i in range(5):
        key = (i, i + 200000)
        if key not in est:
            continue
        a = set(rows[i].split())
        b = set(rows[i + 200000].split())
        true_j = len(a & b) / len(a | b)
        assert abs(est[key] - true_j) < 0.2


def test_simhash_finds_exact_dups(spark, docs_with_dups):
    pairs = dedup.simhash_pairs(spark, docs_with_dups, max_hamming=3).collect()
    found = {(r["ida"], r["idb"]) for r in pairs}
    for i in range(5):
        assert (i, i + 100000) in found
    ham = {(r["ida"], r["idb"]): r["hamming"] for r in pairs}
    for i in range(5):
        assert ham[(i, i + 100000)] == 0


def test_hamming_pairs_matches_allpairs_bruteforce(spark):
    """Band blocking over precomputed 64-bit sigs (the image phash
    path) must reproduce EXHAUSTIVE all-pairs truth at every
    max_hamming: pigeonhole recall + bit_count verify precision."""
    rng = np.random.default_rng(7)
    sigs = rng.integers(-(2**63), 2**63, size=40, dtype=np.int64)
    # plant near pairs at known distances
    su = sigs.view(np.uint64)
    su[1] = su[0] ^ np.uint64(0b1)  # d=1
    su[3] = su[2] ^ np.uint64((1 << 40) | (1 << 3))  # d=2
    su[5] = su[4] ^ np.uint64((1 << 63) | (1 << 21) | 0b100)  # d=3
    su[7] = su[6]  # d=0
    df = spark.createDataFrame(
        [(i, int(s)) for i, s in enumerate(sigs)], "id int, sig long"
    )
    for maxh in (0, 3, 5):
        got = {
            (r["ida"], r["idb"], r["hamming"])
            for r in dedup.hamming_pairs(df, max_hamming=maxh).collect()
        }
        u = sigs.view(np.uint64)
        want = set()
        for i in range(len(sigs)):
            for j in range(i + 1, len(sigs)):
                d = int(bin(int(u[i] ^ u[j])).count("1"))
                if d <= maxh:
                    want.add((i, j, d))
        assert got == want, f"max_hamming={maxh}"


def test_phash_variants_deterministic_and_near(spark):
    from mobility_lakehouse_project_spark import synth

    a = synth.phash_variants_df(spark, 100, step=10).select("image_id", "phash")
    b = synth.phash_variants_df(spark, 100, step=10).select("image_id", "phash")
    ra = {r["image_id"]: r["phash"] for r in a.collect()}
    rb = {r["image_id"]: r["phash"] for r in b.collect()}
    assert ra == rb and len(ra) == 10
    base = {
        r["image_id"]: r["phash"]
        for r in synth.images_df(spark, 100, partitions=2).collect()
    }
    for vid, vph in ra.items():
        bph = base["img" + vid[3:]]
        d = bin((vph ^ bph) & 0xFFFFFFFFFFFFFFFF).count("1")
        assert 1 <= d <= 3, f"{vid}: distance {d}"


def test_ann_lsh_recall_vs_bruteforce(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    rest = emb.filter(F.col("vec_id") != 0)
    approx = similarity.ann_lsh_topk(spark, rest, qv, k=10, n_planes=6)
    rows = approx.collect()
    assert 0 < len(rows) <= 10
    # every returned similarity matches a direct numpy computation
    data = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rest.collect()}
    q = np.array(qv)
    for r in rows:
        v = data[r["vec_id"]]
        expect = float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
        assert abs(r["cos_sim"] - round(expect, 4)) < 1e-6


def test_minhash_lsh_exact_pairs_equals_exact_selfjoin(spark, docs_with_dups):
    """The LSH-blocked + exact-verified pipeline must reproduce the
    exact token-Jaccard self-join bit-for-bit (the recall guarantee the
    dedup_minhash_lsh oracle relies on)."""
    got = {
        (r["ida"], r["idb"]): r["jaccard"]
        for r in dedup.minhash_lsh_exact_pairs(spark, docs_with_dups, threshold=0.8).collect()
    }
    # exact twin computed directly
    d = docs_with_dups.select("doc_id", "text")
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    ).filter(F.col("tok") != "")
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = toks.alias("a"), toks.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("ida"), F.col("b.doc_id").alias("idb"))
        .agg(F.count("*").alias("inter"))
    )
    exact = (
        inter.join(sizes.select(F.col("doc_id").alias("ida"), F.col("sz").alias("sza")), "ida")
        .join(sizes.select(F.col("doc_id").alias("idb"), F.col("sz").alias("szb")), "idb")
        .withColumn("j", F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")))
        .filter(F.col("j") >= 0.8)
    )
    expect = {(r["ida"], r["idb"]): round(r["j"], 4) for r in exact.collect()}
    assert got == expect and len(got) >= 5  # the planted exact dups


def test_rademacher_bucket_col_matches_driver_twin(spark):
    """Catalyst bucket ids == the driver-side left-fold twin for every
    vector (the exactness ann_lsh_bucketed's oracle depends on)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(50)
    signs = similarity.rademacher_signs(64, 4)
    got = {
        r["vec_id"]: r["b"]
        for r in emb.select(
            "vec_id", similarity.rademacher_bucket_col("embedding", signs).alias("b")
        ).collect()
    }
    for r in emb.collect():
        assert got[r["vec_id"]] == similarity.rademacher_bucket_of(
            [float(x) for x in r["embedding"]], signs
        )


def test_ivf_topk_runs_and_scores_correctly(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = similarity.ivf_train_centroids(emb, n_cells=4, iters=1)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    got = similarity.ivf_topk(spark, emb.filter(F.col("vec_id") != 0), cents, qv, k=5, nprobe=2)
    rows = got.collect()
    assert 0 < len(rows) <= 5
    assert all(-1.0 <= r["cos_sim"] <= 1.0 for r in rows)


def test_multiprobe_lsh_improves_recall(spark):
    """Multi-probe LSH on PLANTED near-duplicates (the testdata
    embeddings have no close pairs — max cosine ~0.51): probing the
    lowest-margin adjacent buckets recovers planted neighbors whose
    single bucket bit flipped; recall@10 is non-decreasing in n_probes
    and near-total once every 1-bit bucket is probed."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    q = np.array(qv)
    # 10 planted neighbors: the query vector with one coordinate nudged
    # (cos ~0.999) -> mostly the same bucket, a few one bit away
    rows = []
    nudge = 0.02 * float(np.linalg.norm(q))
    for j in range(10):
        v = q.copy()
        v[j % len(v)] += nudge * (1 + j % 3)
        rows.append((10_000 + j, [float(x) for x in v], "planted"))
    planted = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    rest = emb.filter(F.col("vec_id") != 0).unionByName(planted)
    truth = set(range(10_000, 10_010))  # the planted ones dominate top-10
    recalls = []
    for n_probes in (1, 13):
        got = {r["vec_id"] for r in similarity.ann_lsh_topk(
            spark, rest, qv, k=10, n_planes=12, n_probes=n_probes).collect()}
        recalls.append(len(got & truth) / 10)
    assert recalls == sorted(recalls)  # non-decreasing
    assert recalls[-1] >= 0.9          # all 1-bit buckets probed


def test_persisted_lsh_clustering_prunes_probe(spark, tmp_path):
    """VERDICT r2 #3: the ANN bucket as a PERSISTED clustering column.
    The probe must scan only ~n_probes/2^planes of the files via
    manifest partition pruning, with results identical to the
    filter-based probe over the raw DataFrame (recall unchanged)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n_planes, n_probes = 6, 2
    t = similarity.build_lsh_clustered_table(
        spark, emb, str(tmp_path / "embt"), n_planes=n_planes
    )
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    topk, st = similarity.ann_lsh_topk_clustered(
        spark, t, qv, k=5, n_probes=n_probes
    )
    got = [(r["vec_id"], r["cos_sim"]) for r in topk.collect()]
    assert len(got) == 5
    # pruning: the probe reads only the probed buckets' files
    assert st["scanned_files"] >= 1
    assert st["pruned_fraction"] >= 1.0 - 3 * (n_probes / 2**n_planes)
    # recall unchanged vs the unclustered filter probe with the SAME
    # bucket function and probe set
    signs = similarity.rademacher_signs(len(qv), n_planes, seed=7)
    raw = emb.withColumn(
        "_bucket", similarity.rademacher_bucket_col("embedding", signs).cast("int")
    ).filter(F.col("_bucket").isin(st["probe_buckets"]))
    want = [
        (r["vec_id"], r["cos_sim"])
        for r in similarity.cosine_topk(raw, qv, k=5).collect()
    ]
    assert got == want
    # round-trip integrity: every row landed in exactly one bucket
    assert t.scan(spark).count() == emb.count()


def test_persisted_ivf_cell_clustering_prunes_probe(spark, tmp_path):
    """IVF twin of the persisted LSH clustering: cell = partition key,
    probe scans ~nprobe/n_cells of the files, results identical to the
    assign-at-query-time filter probe."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n_cells, nprobe = 8, 2
    t = similarity.build_ivf_clustered_table(
        spark, emb, str(tmp_path / "ivft"), n_cells=n_cells
    )
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    topk, st = similarity.ann_ivf_topk_clustered(spark, t, qv, k=5, nprobe=nprobe)
    got = [(r["vec_id"], r["cos_sim"]) for r in topk.collect()]
    assert len(got) == 5
    assert st["scanned_files"] >= 1
    assert st["pruned_fraction"] >= 1.0 - 2 * (nprobe / n_cells)
    # identical to the filter-based probe with the same quantizer/cells
    cents = similarity.rademacher_signs(len(qv), n_cells, seed=23)
    raw = emb.withColumn(
        "_cell", similarity.ivf_cell_col("embedding", cents).cast("int")
    ).filter(F.col("_cell").isin(st["probe_cells"]))
    want = [
        (r["vec_id"], r["cos_sim"])
        for r in similarity.cosine_topk(raw, qv, k=5).collect()
    ]
    assert got == want
    assert t.scan(spark).count() == emb.count()


def test_trained_ivf_centroids_beat_fixed_quantizer(spark, tmp_path):
    """VERDICT r3 #5: trained (Lloyd) centroids wired into the
    persisted IVF build. Data built so the query's blob straddles a
    fixed-quantizer decision boundary (center = (p0+p1)*1.5 has equal
    dots with patterns 0 and 1, so noise splits the blob across two
    fixed cells) while trained k-means gives the blob its own cell:
    recall@10 at nprobe=1 must be strictly higher for the trained
    build, with the centroids pinned in the commit summary and the
    probe still a pruned partition scan."""
    import json

    rng = np.random.default_rng(42)
    dim, n_cells, per = 16, 3, 80
    pats = similarity.rademacher_signs(dim, n_cells, seed=23)
    centers = np.stack([
        (pats[0] + pats[1]) * 1.5,      # straddles fixed cells 0/1
        pats[2] * 4.0,                   # solid fixed cell 2
        -(pats[0] + pats[1]) * 2.0,      # far from the query blob
    ])
    rows, vid = [], 0
    for b in range(3):
        for _ in range(per):
            v = centers[b] + rng.normal(size=dim) * 0.3
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qv = [float(x) for x in (centers[0] + rng.normal(size=dim) * 0.3)]
    exact = {r["vec_id"] for r in similarity.cosine_topk(emb, qv, k=10).collect()}
    cents = similarity.ivf_train_centroids(emb, n_cells=n_cells, iters=4)
    t_tr = similarity.build_ivf_clustered_table(
        spark, emb, str(tmp_path / "tr"), centroids=cents
    )
    t_fx = similarity.build_ivf_clustered_table(
        spark, emb, str(tmp_path / "fx"), n_cells=n_cells
    )
    got_tr, st_tr = similarity.ann_ivf_topk_clustered(spark, t_tr, qv, k=10, nprobe=1)
    got_fx, st_fx = similarity.ann_ivf_topk_clustered(spark, t_fx, qv, k=10, nprobe=1)
    rec = lambda df: len({r["vec_id"] for r in df.collect()} & exact) / 10  # noqa: E731
    r_tr, r_fx = rec(got_tr), rec(got_fx)
    assert r_tr > r_fx, (r_tr, r_fx)
    assert r_tr >= 0.9
    assert st_tr["pruned_fraction"] > 0 and st_fx["pruned_fraction"] > 0
    # the probe's quantizer comes from the pinned commit summary, and
    # the Catalyst cell assignment matches the driver-side twin
    summ = next(
        s.summary for s in reversed(t_tr.snapshots_list())
        if "ivf-centroids" in s.summary
    )
    cq = np.array(json.loads(summ["ivf-centroids"]), dtype=np.float64)
    raw = emb.withColumn(
        "_cell", similarity.ivf_trained_cell_col("embedding", cq).cast("int")
    )
    for r in raw.limit(30).collect():
        assert similarity.ivf_trained_cells_of(
            [float(x) for x in r["embedding"]], cq, 1
        )[0] == r["_cell"]


def test_batch_ann_against_persisted_clustered_table(spark, tmp_path):
    """VERDICT r3 #8: batch ANN probes the PERSISTED LSH-clustered
    table — union-of-probe-buckets partition pruning, bucket equi-join,
    per-query rank — and matches the single-query clustered probe
    exactly for every query, reporting aggregate prune stats."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    t = similarity.build_lsh_clustered_table(
        spark, emb.filter(F.col("vec_id") >= 5), str(tmp_path / "embt"),
        n_planes=6, quantize=True,
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    topk, st = similarity.ann_batch_topk_clustered(
        spark, t, queries, k=3, n_probes=2
    )
    rows = topk.collect()
    assert st["pruned_fraction"] > 0
    assert 1 <= st["probe_buckets"] <= 10  # union of <=5 queries x 2 probes
    got: dict[int, list] = {}
    for r in rows:
        got.setdefault(r["qid"], []).append((r["rnk"], r["vec_id"], r["cos_sim"]))
    for q in queries.collect():
        qv = [float(x) for x in q["qv"]]
        single, _ = similarity.ann_lsh_topk_clustered(
            spark, t, qv, k=3, n_probes=2
        )
        want = [
            (i + 1, r["vec_id"], r["cos_sim"])
            for i, r in enumerate(single.collect())
        ]
        assert sorted(got.get(q["qid"], [])) == want, q["qid"]


class TestConnectedComponents:
    def _cc(self, spark, pairs):
        edges = spark.createDataFrame(pairs, "ida long, idb long")
        rows = dedup.connected_components(edges).collect()
        return {r["id"]: r["component"] for r in rows}

    def test_chain_converges_to_min(self, spark):
        # 0-1-2-...-9 chain: diameter 9, must converge (pointer jumping
        # contracts it in ~log rounds) with every node labeled 0
        got = self._cc(spark, [(i, i + 1) for i in range(9)])
        assert got == {i: 0 for i in range(10)}

    def test_disjoint_components(self, spark):
        got = self._cc(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 20)])
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}

    def test_edge_direction_irrelevant(self, spark):
        got = self._cc(spark, [(5, 3), (3, 9), (9, 5)])
        assert got == {3: 3, 5: 3, 9: 3}

    def test_star_and_bridge(self, spark):
        # two stars bridged by one edge -> single component
        pairs = [(100, i) for i in range(5)] + [(200, i + 300) for i in range(5)]
        pairs.append((4, 303))
        got = self._cc(spark, pairs)
        assert set(got.values()) == {0}


class TestProductQuantization:
    """PQ/ADC: encode determinism (Catalyst == numpy twin), trained
    codebooks beating the fixed ones, and the end-to-end top-k path."""

    def test_pq_codes_catalyst_matches_numpy(self, spark):
        emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(40)
        cbs = similarity.fixed_pq_codebooks(64, m=8, k=16)
        got = {
            r["vec_id"]: [r[f"pq_{s}"] for s in range(8)]
            for r in emb.select(
                "vec_id", *similarity.pq_code_cols("embedding", cbs)
            ).collect()
        }
        for r in emb.select("vec_id", "embedding").collect():
            assert got[r["vec_id"]] == similarity.pq_codes_of(r["embedding"], cbs)

    def test_pq_adc_score_matches_numpy(self, spark):
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        cbs = similarity.fixed_pq_codebooks(64, m=8, k=16)
        qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
        got = {r["vec_id"]: r["adc_score"]
               for r in similarity.pq_topk(
                   emb.filter(F.col("vec_id") != 0), qv, cbs, k=5).collect()}
        q = np.asarray(similarity.quantize_vec(qv))
        sub = 64 // 8
        for r in emb.filter(F.col("vec_id").isin(*got)).collect():
            codes = similarity.pq_codes_of(r["embedding"], cbs)
            want = sum(
                float(np.dot(q[s * sub:(s + 1) * sub], cbs[s, codes[s]]))
                for s in range(8)
            )
            assert got[r["vec_id"]] == want

    def test_trained_pq_codebooks_beat_fixed(self, spark):
        """Low-rank structured corpus (3 latent dims in 16 — the shape
        real embeddings have and the data-oblivious grid can't see):
        the deployment measure is SHORTLIST recall — ADC ranks a
        shortlist, exact re-ranks it — so we assert the exact
        integer-IP top-10 survives into the trained ADC top-40 while
        the fixed codebooks lose most of it, plus the strict Lloyd
        property: trained reconstruction MSE < fixed on the training
        sample."""
        rng = np.random.default_rng(7)
        dim, m, k, n, short = 16, 4, 8, 400, 40
        W = rng.normal(size=(3, dim))
        X = rng.normal(size=(n, 3)) @ W + rng.normal(size=(n, dim)) * 0.1
        rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        qv = [float(x) for x in X[5] + rng.normal(size=dim) * 0.05]
        qq = np.asarray(similarity.quantize_vec(qv))
        Xq = np.array([similarity.quantize_vec(v) for _, v in rows])
        ip = Xq @ qq
        exact = set(np.lexsort((np.arange(n), -ip))[:10].tolist())
        fixed = similarity.fixed_pq_codebooks(dim, m, k)
        trained = similarity.pq_train_codebooks(emb, m=m, k=k, iters=8,
                                                sample_n=n)
        rec = lambda cbs: len(  # noqa: E731
            {r["vec_id"]
             for r in similarity.pq_topk(emb, qv, cbs, k=short).collect()}
            & exact) / 10
        r_fx, r_tr = rec(fixed), rec(trained)
        assert r_tr > r_fx, (r_tr, r_fx)
        assert r_tr >= 0.9, r_tr

        def mse(cbs):
            sub = dim // m
            R = np.concatenate(
                [cbs[s][[similarity.pq_codes_of(v, cbs)[s]
                         for _, v in rows]] for s in range(m)], axis=1)
            return float(((Xq - R) ** 2).mean())

        assert mse(trained) < mse(fixed)

    def test_pq_coded_table_probe(self, spark, tmp_path):
        """Persisted PQ deployment: codes materialized at write, probe
        ADC-scores a column-pruned scan (the vector column must be
        ABSENT from the ADC pass's parquet ReadSchema), then exact
        re-ranks the shortlist. With shortlist == corpus the result
        must equal the brute-force cosine top-k exactly."""
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        n = emb.count()
        cbs = similarity.pq_train_codebooks(emb, m=8, k=16, sample_n=200)
        t = similarity.build_pq_coded_table(
            spark, emb, str(tmp_path / "pq"), cbs, n_files=4)
        qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
        exact = [
            (r["vec_id"], r["cos_sim"])
            for r in similarity.cosine_topk(
                emb.filter(F.col("vec_id") != 0), qv, k=10).collect()
        ]
        # full-shortlist probe == exact (rerank covers everything);
        # the query vector itself is in the table, so ask for k+1 and
        # drop it
        topk, stats = similarity.ann_pq_topk_coded(
            spark, t, qv, k=11, shortlist=n)
        got = [(r["vec_id"], r["cos_sim"])
               for r in topk.collect() if r["vec_id"] != 0][:10]
        assert got == exact
        assert stats["code_bytes_per_row"] == 32
        # column pruning: the ADC pass must not read the vector column
        plan = (
            t.scan(spark, columns=["vec_id"] + [f"pq_{s}" for s in range(8)])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "embedding" not in plan, plan
        # shortlist-path smoke at 10%: isotropic testdata embeddings
        # have no low-rank structure for PQ to exploit (recall quality
        # on structured data is test_trained_pq_codebooks_beat_fixed),
        # so this only pins that the shortlist path beats chance (a
        # random 10% shortlist keeps ~1 of the top-10)
        topk2, _ = similarity.ann_pq_topk_coded(spark, t, qv, k=11,
                                                shortlist=max(50, n // 10))
        got2 = {r["vec_id"] for r in topk2.collect()}
        assert len(got2 & {v for v, _ in exact}) >= 4

    def test_ivfpq_table_composes_both_prunings(self, spark, tmp_path):
        """IVFPQ: partition pruning (cells) AND column pruning (codes)
        compose. With nprobe == n_cells and shortlist == corpus the
        probe must equal brute force exactly; at nprobe=2 the scan must
        be partition-pruned (measured pruned_fraction > 0) with the
        vector column absent from the ADC pass, and still find
        neighbors that share the query's cells."""
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        n = emb.count()
        cbs = similarity.pq_train_codebooks(emb, m=8, k=16, sample_n=200)
        t = similarity.build_ivfpq_table(
            spark, emb, str(tmp_path / "ivfpq"), cbs, n_cells=4, n_files=8)
        qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
        exact = [
            (r["vec_id"], r["cos_sim"])
            for r in similarity.cosine_topk(
                emb.filter(F.col("vec_id") != 0), qv, k=10).collect()
        ]
        topk, stats = similarity.ann_ivfpq_topk(
            spark, t, qv, k=11, nprobe=4, shortlist=n)
        got = [(r["vec_id"], r["cos_sim"])
               for r in topk.collect() if r["vec_id"] != 0][:10]
        assert got == exact
        assert stats["pruned_fraction"] == 0.0  # all cells probed
        topk2, st2 = similarity.ann_ivfpq_topk(
            spark, t, qv, k=10, nprobe=2, shortlist=100)
        assert st2["pruned_fraction"] > 0.0
        assert st2["scanned_files"] < st2["total_files"]
        rows2 = topk2.collect()
        assert 0 < len(rows2) <= 10
        # every returned hit must come from a probed cell (driver twin)
        import json
        summ = next(s_.summary for s_ in reversed(t.snapshots_list())
                    if "pq-codebooks" in s_.summary)
        cents = similarity.rademacher_signs(64, int(summ["ivf-cells"]),
                                            int(summ["ivf-seed"]))
        by_id = {r["vec_id"]: r["embedding"] for r in emb.collect()}
        for r in rows2:
            cell = similarity.ivf_cells_of(by_id[r["vec_id"]], cents, 1)[0]
            assert cell in st2["probe_cells"]


def test_combo_plan_blocking_invariants():
    """The generalized pigeonhole plan must stay recall-complete and
    bounded for every max_hamming: m-k intact blocks >= j (so some
    j-combo key survives k bit flips), explode factor C(m,j) <= 64,
    and the classic splits reappear at the edges (k=1 -> 2x32)."""
    import math

    for k in range(1, 33):
        m, j = dedup._combo_plan(k)
        assert m - k >= j, f"recall broken at k={k}: m={m} j={j}"
        assert math.comb(m, j) <= 64, f"explode blowup at k={k}"
        assert m <= 64
    assert dedup._combo_plan(1) == (2, 1)   # classic 2x32 split
    assert dedup._combo_plan(3) == (6, 3)   # 20 keys of ~32 bits


def test_banded_key_width_bounds_collisions(spark):
    """At max_hamming=3 the combo keys are ~32 bits wide, so random
    64-bit signatures must produce candidate volume near the true-pair
    volume — the property that keeps the band self-join linear-ish in
    n instead of n^2/2^16 (the classic 4x16 split's collision rate)."""
    n = 20_000
    sigs = spark.range(n).select(F.col("id"), F.xxhash64("id").alias("sig"))
    banded = dedup._banded(sigs, "id", "sig", 3)
    a = banded.alias("a")
    b = banded.alias("b")
    cands = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bh") == F.col("b.bh"))
        & (F.col("a.id") < F.col("b.id")),
    ).count()
    # random collisions: ~combos * n^2 / 2^32 / 2 ~= 1 at n=20k; the
    # classic 16-bit bands would give ~12k. Allow generous slack.
    assert cands < 200, f"candidate volume {cands} — blocking degraded"


def test_connected_components_driver_and_distributed_parity(spark):
    """The metadata-plane union-find fast path and the distributed
    min-label loop must assign identical components (min reachable id)
    on the same graph — chains, stars, singleton-free isolates and a
    cross-type (long) id space."""
    pairs = (
        [(i, i + 1) for i in range(0, 9)]          # chain 0..9
        + [(100, x) for x in (101, 102, 103)]      # star
        + [(200, 201), (202, 201)]                 # vee
        + [(7, 300)]                               # chain joins 300
    )
    edges = spark.createDataFrame(pairs, "ida long, idb long")
    fast = {r["id"]: r["component"]
            for r in dedup.connected_components(edges).collect()}
    dist = {r["id"]: r["component"]
            for r in dedup.connected_components(
                edges, driver_threshold=0).collect()}
    assert fast == dist
    assert fast[300] == 0 and fast[103] == 100 and fast[202] == 200
