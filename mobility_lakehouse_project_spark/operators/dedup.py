"""Near-duplicate detection operators for the documents table.

The training-data dedup ladder, each a DataFrame program:

 * exact          — md5 fingerprint hash-groupBy (plans/relational.py
                    txt_fingerprint_dedup, oracle-checked)
 * token Jaccard  — exact set-similarity via token self-join
                    (plans/relational.py dedup_token_jaccard,
                    oracle-checked)
 * MinHash + LSH  — this module: shingle -> k minhashes (one Arrow UDF)
                    -> band buckets -> bucket equi-join -> candidate
                    pairs -> estimated Jaccard. The scale path: the
                    only join key is the band bucket hash, so work is
                    proportional to colliding candidates, never O(n^2).
 * SimHash        — this module: 64-bit hyperplane-free simhash from
                    token hashes; near-dups = equal 16-bit bands
                    (hamming blocking), verified by popcount distance.

MinHash math (Broder 1997): P[minhash_i(A)=minhash_i(B)] = J(A,B);
k independent permutations approximated by k splitmix64-salted hashes.
LSH banding (Leskovec/Rajaraman/Ullman, "Mining of Massive Datasets"
ch.3): b bands of r rows -> candidate iff some band matches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix64(x: np.ndarray) -> np.ndarray:
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def minhash_udf(k: int = 64, shingle: int = 2):
    """Arrow-batched UDF: text -> array<long> of k minhash values.

    Python's own str hash is salted per-process — NOT usable across
    executors; we use a deterministic FNV-1a base hash instead."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def mh(texts: pd.Series) -> pd.Series:
        salts = _mix64(np.arange(1, k + 1, dtype=np.uint64))
        out = []
        for t in texts:
            toks = t.split()
            if shingle > 1:
                toks = [" ".join(toks[i : i + shingle]) for i in range(max(len(toks) - shingle + 1, 1))]
            if not toks:
                out.append([0] * k)
                continue
            base = np.array([_fnv1a(s) for s in set(toks)], dtype=np.uint64)
            # k salted hashes of every shingle: (S, k) via broadcasting
            m = _mix64(base[:, None] ^ salts[None, :]).min(axis=0)
            out.append(m.view(np.int64).tolist())
        return pd.Series(out)

    return mh


def _fnv1a(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode():
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _lsh_candidates(sigs: DataFrame, k: int, bands: int) -> DataFrame:
    """Band-blocked candidate pairs from a (id, sig) signature frame:
    explode band hashes -> self-join on (band_idx, band_hash). The only
    join key is the bucket hash, so the shuffle carries (id, band_hash)
    pairs and work is proportional to colliding candidates — never
    O(n^2)."""
    r = k // bands
    band_hash = F.xxhash64(F.concat_ws(",", F.slice("sig", F.col("band") * r + 1, r)), F.col("band"))
    banded = (
        sigs.select("id", "sig", F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"))
        .select("id", "band", band_hash.alias("bh"))
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("ida"), F.col("b.id").alias("idb"))
        .distinct()
    )


def minhash_lsh_pairs(
    spark: SparkSession,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 64,
    bands: int = 16,
    shingle: int = 2,
    threshold: float = 0.6,
) -> DataFrame:
    """Candidate near-dup pairs with estimated Jaccard >= threshold.

    Plan: one UDF pass -> explode k/bands band-hashes -> self-join on
    (band_idx, band_hash) -> groupBy pair -> estimate = matching
    minhashes / k. Candidate generation is blocking-based (bucket
    equi-join), so the shuffle carries (id, band_hash) pairs only."""
    sigs = docs.select(F.col(id_col).alias("id"), minhash_udf(k, shingle)(F.col(text_col)).alias("sig"))
    sigs = sigs.persist()
    cands = _lsh_candidates(sigs, k, bands)
    sa = sigs.select(F.col("id").alias("ida"), F.col("sig").alias("siga"))
    sb = sigs.select(F.col("id").alias("idb"), F.col("sig").alias("sigb"))
    est = F.size(F.filter(F.zip_with("siga", "sigb", lambda x, y: x == y), lambda m: m)) / F.lit(k)
    return (
        cands.join(sa, "ida")
        .join(sb, "idb")
        .select("ida", "idb", F.round(est, 4).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def minhash_lsh_exact_pairs(
    spark: SparkSession,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 128,
    bands: int = 64,
    threshold: float = 0.8,
) -> DataFrame:
    """LSH-blocked near-dup pairs with EXACT token-Jaccard verification
    — the standard two-stage dedup of a training pipeline (candidates
    by banding, then verify), and the form that admits a SQL oracle:
    its output equals the exact token-Jaccard self-join
    (plans/relational.py dedup_token_jaccard) whenever banding recall
    holds, which at r=2, b=64 misses a J>=0.8 pair with probability
    (1 - 0.8^2)^64 ~= 5e-29 — deterministic for any practical input.

    Scale shape: candidate generation shuffles (id, band_hash) only;
    the verify stage explodes tokens ONLY for docs appearing in some
    candidate pair (semi-join pushdown), so verify cost is proportional
    to near-duplicate volume, not corpus size."""
    # sigs feed ONLY candidate generation here (no estimate stage), so
    # no persist — caching single-use frames just pins executor memory
    sigs = docs.select(
        F.col(id_col).alias("id"), minhash_udf(k, shingle=1)(F.col(text_col)).alias("sig")
    )
    # cands is consumed three times (cand_ids union + the pair join)
    cands = _lsh_candidates(sigs, k, bands).persist()

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok"),
    ).filter(F.col("tok") != "")
    # verify only docs that occur in a candidate pair
    cand_ids = (
        cands.select(F.col("ida").alias("doc_id"))
        .union(cands.select(F.col("idb").alias("doc_id")))
        .distinct()
    )
    # candidate-doc tokens feed FOUR branches (ta, tb and the two size
    # sides) — persist so the scan+tokenize+semi-join runs once, not
    # once per branch; bounded by candidate-pair volume, not corpus
    toks = toks.join(cand_ids, "doc_id", "left_semi").persist()
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    ta = toks.select(F.col("doc_id").alias("ida"), "tok")
    tb = toks.select(F.col("doc_id").alias("idb"), "tok")
    inter = (
        cands.join(ta, "ida")
        .join(tb, ["idb", "tok"])
        .groupBy("ida", "idb")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("ida"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("idb"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "ida")
        .join(sb, "idb")
        .withColumn("jaccard", F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("ida", "idb", F.round("jaccard", 4).alias("jaccard"))
    )


def simhash_udf(bits: int = 64):
    """Arrow-batched UDF: text -> 64-bit SimHash (Charikar 2002):
    sign of the per-bit sum of token-hash bit vectors."""

    @F.pandas_udf(T.LongType())
    def sh(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        powers = np.uint64(1) << np.arange(bits, dtype=np.uint64)
        for i, t in enumerate(texts):
            toks = set(t.split())
            if not toks:
                out[i] = 0
                continue
            hs = np.array([_fnv1a(s) for s in toks], dtype=np.uint64)
            bitvec = ((hs[:, None] & powers[None, :]) != 0).sum(axis=0)
            sig = np.uint64(0)
            half = len(toks) / 2.0
            sig = (powers[bitvec > half]).sum(dtype=np.uint64)
            out[i] = np.int64(sig.astype(np.int64))
        return pd.Series(out)

    return sh


def simhash_pairs(
    spark: SparkSession,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming:
    compute the signatures (one Arrow UDF), then block/verify via
    :func:`hamming_pairs`."""
    sigs = docs.select(F.col(id_col).alias("id"), simhash_udf()(F.col(text_col)).alias("sig"))
    return hamming_pairs(sigs, id_col="id", sig_col="sig", max_hamming=max_hamming)


def hamming_pairs(
    sigs: DataFrame,
    id_col: str = "id",
    sig_col: str = "sig",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs among PRECOMPUTED 64-bit signatures — SimHash,
    image perceptual hash (the input table's ``phash`` column,
    BASELINE.json input_hint), any 64-bit sketch — by hamming distance
    <= ``max_hamming``. Returns ``(ida, idb, hamming)`` with
    ``ida < idb``.

    Blocking: split the 64-bit signature into ``max_hamming + 1`` bands
    (pigeonhole: a pair with <= max_hamming differing bits must match on
    at least one full band) -> candidate join per band, verify with
    bit_count(xor). Band count is DERIVED from max_hamming so recall is
    guaranteed for any threshold (a fixed 4-band split would silently
    miss pairs at max_hamming >= 4).

    Scale: the only join key is (band, band_hash) — work is
    proportional to colliding candidates, never O(n^2) — and the
    banded relation carries just (id, sig, band, hash), so at 10^12
    rows the shuffle moves ~32 B/row x (max_hamming+1), never payload
    columns. The band expressions are pure Catalyst (shift/mask), no
    Python."""
    banded = _banded(sigs, id_col, sig_col, max_hamming)
    a = banded.alias("a")
    # shuffle_hash: the banded relation is metadata-sized but many
    # rows; a sort-merge join pays a full sort of both exploded sides
    # (measured 23.5s vs 4.8s at 1.4M sigs x 20 combos), while the
    # hash build per partition is combos*32B/partitions — safely small
    b = banded.hint("shuffle_hash").alias("b")
    ham = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("ida"), F.col("b.id").alias("idb"), ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def _combo_plan(max_hamming: int) -> tuple[int, int]:
    """Choose (m, j) for generalized pigeonhole blocking: the 64-bit
    signature splits into ``m`` blocks and every combination of ``j``
    blocks is one candidate key (``C(m, j)`` keys of ~``64*j/m`` bits).

    Recall proof: <= k differing bits touch <= k distinct blocks, so
    >= m-k = j blocks are intact on both sides, and any j of them form
    one of the combo keys — a guaranteed match (HmSearch-style
    generalization of the classic k+1-band split, which is j=1).

    Why not always j=1: candidate volume per key is ~n^2 / 2^width, so
    key width is THE scale knob. k=3 with the classic 4x16-bit bands
    collides quadratically (measured: 1.5M sigs -> ~60M candidate
    pairs, dominating the dedup stage); j=3 gives 20 keys of ~32 bits
    -> collision volume drops by ~2^16 for a 5x wider (but still
    metadata-sized) banded relation. Chosen deterministically: among
    feasible splits (combos <= 64), maximize key width capped at 32
    bits (past 32 the random-collision volume is already below the
    explode volume for any n the 64-bit sig space can hold distinct;
    extra width would only multiply banded rows), tiebreak fewer
    combos. k=1 resolves to the classic 2x32 split, k=3 to 20 keys of
    ~32 bits, large k degrades gracefully toward classic banding."""
    import math

    best = None
    for j in range(1, 64 - max_hamming + 1):
        m = max_hamming + j
        if m > 64:
            break
        combos = math.comb(m, j)
        if combos > 64:
            continue
        width = 64 * j // m
        key = (min(width, 32), -combos, width)
        if best is None or key > best[0]:
            best = (key, m, j)
    assert best is not None  # j=1 (classic banding) is always feasible
    return best[1], best[2]


def _banded(sigs: DataFrame, id_col: str, sig_col: str,
            max_hamming: int) -> DataFrame:
    """Explode each 64-bit signature into its (band, band_hash) keys —
    the pigeonhole blocking relation both hamming joins build on.
    ``band`` indexes a j-block combination and ``bh`` concatenates the
    combo's block values (see :func:`_combo_plan`); results are
    identical to any other recall-complete blocking because the
    ``bit_count`` verify predicate decides membership."""
    if max_hamming + 1 > 64:
        raise ValueError(f"max_hamming={max_hamming} needs >64 bands of a 64-bit sig")
    sigs = sigs.select(F.col(id_col).alias("id"), F.col(sig_col).alias("sig"))
    if max_hamming == 0:
        return sigs.select("id", "sig", F.lit(0).alias("band"),
                           F.col("sig").alias("bh"))
    m, j = _combo_plan(max_hamming)
    base, extra = divmod(64, m)
    widths = [base + (1 if b < extra else 0) for b in range(m)]
    offs = [sum(widths[:b]) for b in range(m)]

    def block(b: int) -> str:
        return f"(shiftrightunsigned(sig, {offs[b]}) & {(1 << widths[b]) - 1})"

    from itertools import combinations

    band_exprs = []
    for idx, combo in enumerate(combinations(range(m), j)):
        shift = 0
        parts = []
        for b in combo:
            parts.append(f"shiftleft({block(b)}, {shift})" if shift
                         else block(b))
            shift += widths[b]
        band_exprs.append(
            F.struct(F.lit(idx).alias("band"),
                     F.expr(" | ".join(parts)).alias("bh"))
        )
    return sigs.select(
        "id", "sig", F.explode(F.array(*band_exprs)).alias("bb")
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))


def hamming_join(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "id",
    sig_col: str = "sig",
    max_hamming: int = 3,
) -> DataFrame:
    """Two-sided hamming band join: pairs (ida from ``left``, idb from
    ``right``) with hamming(sig_a, sig_b) <= ``max_hamming`` — the
    cross-corpus form of :func:`hamming_pairs` (e.g. training images
    vs a held-out eval set's phashes for decontamination). Same
    pigeonhole banding and guarantees; no ``ida < idb`` constraint
    since the sides are distinct relations. When one side is an
    eval-sized set its banded relation stays broadcast-able, so the
    corpus side never shuffles."""
    a = _banded(left, id_col, sig_col, max_hamming).alias("a")
    # no shuffle_hash hint here (unlike hamming_pairs): the right side
    # is typically eval-sized and the planner's automatic broadcast —
    # which a join hint would override — keeps the corpus side
    # unshuffled entirely
    b = _banded(right, id_col, sig_col, max_hamming).alias("b")
    ham = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bh") == F.col("b.bh")))
        .select(F.col("a.id").alias("ida"), F.col("b.id").alias("idb"),
                ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def connected_components(
    edges: DataFrame,
    src: str = "ida",
    dst: str = "idb",
    max_iter: int = 25,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """Connected components over an undirected near-dup pair graph:
    returns ``(id, component)`` where component = MIN node id reachable
    from ``id`` — the canonical-document assignment step that turns
    pairwise near-dup hits (MinHash/SimHash/Jaccard) into dedup groups
    ("keep one doc per component" is the standard training-corpus
    dedup contract; the reference keeps MAX-per-key instead,
    dags/Silver_Transform_Dag.py:118-131, which is the 1-hop special
    case of this).

    Algorithm: iterative min-label propagation PLUS pointer jumping
    (label-of-label contraction), so convergence is O(log diameter)
    rounds, not O(diameter) — the difference between 2 and 40 shuffle
    rounds on a 100 TB corpus with chain-shaped components (cf.
    Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14 — same two-phase min-propagation idea as large-star/
    small-star). Each round materializes the new labels (persist +
    count) so the lineage stays one-round deep; at cluster scale the
    persist would be a checkpoint to survive executor loss.

    Convergence detection is a single scalar aggregate per round:
    labels only ever DECREASE under min-propagation, so
    ``sum(component)`` strictly decreases until the fixpoint — no
    join-based change diff needed. The sum runs in decimal(38,0):
    node ids may be full-range 64-bit values (e.g. phash sigs), whose
    long sum overflows under ANSI mode.
    """
    sym = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).union(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    )
    sym = sym.persist()
    # Metadata-plane fast path: the edge set is bounded by NEAR-DUP
    # volume (band-collision candidates that passed verification), not
    # corpus size — in a mostly-unique corpus it is tiny while each
    # distributed label round costs ~4 fixed-latency jobs. Below the
    # threshold (~32 MB of id pairs on the driver, the same bound the
    # engine's other metadata collects honor), union-find on the
    # driver replaces O(log diameter) shuffle rounds with one collect;
    # the label assignment (component = min reachable id) is identical
    # by construction. Dup-heavy graphs past the threshold take the
    # distributed loop below unchanged.
    n_edges = sym.count()  # also materializes the persist ONCE — the
    # first round otherwise computed both union branches separately
    if n_edges <= driver_threshold:
        rows = sym.collect()
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for r in rows:
            a, b = find(r["s"]), find(r["d"])
            if a != b:
                # union by min: the smaller id becomes the root, so
                # every root IS its component's min id
                if b < a:
                    a, b = b, a
                parent[b] = a
        nodes = {r["s"] for r in rows}
        out = [(n, find(n)) for n in sorted(nodes)]
        sym.unpersist()
        spark = edges.sparkSession
        schema = T.StructType([
            T.StructField("id", edges.schema[src].dataType),
            T.StructField("component", edges.schema[src].dataType),
        ])
        # Arrow upload via pandas, not a local-list createDataFrame: the
        # list path parallelizes PICKLED rows through a Python RDD — a
        # "Scan ExistingRDD[... PythonRDD]" relation in every consumer's
        # plan (flagged by the NO-PYTHON plan audit) and a row-at-a-time
        # deserialization of up to driver_threshold edges; the pandas
        # path ships the same rows as Arrow record batches.
        pdf = pd.DataFrame(out, columns=["id", "component"])
        return spark.createDataFrame(pdf, schema)
    # Each round is cut with an EAGER localCheckpoint, not a bare
    # persist: the round plan references the previous labels twice
    # (union + pointer-jump join), so an uncut lineage grows ~4x per
    # round — after k rounds the RETURNED frame embeds a 4^k-node tree
    # that the analyzer must walk again inside every caller's query
    # (measured: a CC-over-jaccard query carried a 100k-scan plan and
    # spent its time in driver-side analysis, not execution). The
    # checkpoint truncates the plan to the materialized result; on a
    # cluster a reliable checkpoint would also survive executor loss.
    labels = (
        sym.select(F.col("s").alias("id")).distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(
        F.sum(F.col("component").cast("decimal(38,0)"))
    ).collect()[0][0]
    for _ in range(max_iter):
        # 1-hop propagation: every neighbour offers its current label
        prop = (
            sym.join(labels, sym["s"] == labels["id"])
            .select(F.col("d").alias("id"), F.col("component"))
        )
        hop = (
            labels.select("id", "component").unionByName(prop)
            .groupBy("id").agg(F.min("component").alias("component"))
        )
        # pointer jumping: follow component -> its component (contracts
        # label chains geometrically)
        l2 = hop.select(
            F.col("id").alias("cid"), F.col("component").alias("ccomp")
        )
        jumped = (
            hop.join(l2, hop["component"] == l2["cid"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("ccomp"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        new_sum = jumped.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).collect()[0][0]
        labels = jumped
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    sym.unpersist()
    return labels
