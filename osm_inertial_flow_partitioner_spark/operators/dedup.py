"""Deduplication operators over a documents table.

Every variant is shuffle-conscious and has a DuckDB oracle:

- exact: hash-groupBy on a normalized fingerprint (one shuffle,
  map-side combine);
- minhash + LSH: token-hash -> P permutations via (a*x+b) mod P (all
  JVM), band buckets, candidate pairs via bucket equi-join — the
  standard shingle->minhash->band->bucket-join pipeline. Signatures are
  agg columns (no explode of perms): one shuffle for signatures, one
  self-join on (band, value);
- simhash: 64-bit sign-sum of token hashes, computed as 64 agg columns;
  near-dup pairs = equal simhash (exact-bit variant keeps the oracle
  SQL-expressible; hamming<k refine is a trivial extra filter);
- n-gram/word Jaccard: explode distinct tokens, self-join on token,
  |intersection| / |union| threshold;
- embedding cosine near-dup: see similarity.py.

All hashing goes through the portable md5 path (functions/hashing.py)
so the oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_small, minhash_expr, minhash_params
from .textops import tokens


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup on normalized text hash: keep min doc_id per group.
    Returns (doc_id, n_copies) for the kept representative."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return (
        docs.select("doc_id", F.md5(norm).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
        .select("doc_id", "n_copies")
    )


def _doc_tokens(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok")
    )


def minhash_signatures(
    docs: DataFrame, num_perm: int = 16, text_col: str = "text", seed: int = 42
) -> DataFrame:
    """(doc_id, mh0..mh{P-1}): min over distinct tokens of each
    permutation of the 28-bit token hash. One explode + one groupBy."""
    params = minhash_params(num_perm, seed)
    toks = _doc_tokens(docs, text_col).withColumn("th", md5_small(F.col("tok")))
    aggs = [
        F.min(minhash_expr(F.col("th"), a, b)).alias(f"mh{i}")
        for i, (a, b) in enumerate(params)
    ]
    return toks.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    docs: DataFrame,
    num_perm: int = 16,
    bands: int = 4,
    text_col: str = "text",
    seed: int = 42,
    bucket_cap: int | None = None,
) -> DataFrame:
    """LSH banding: rows-per-band = num_perm/bands; docs sharing any
    band bucket become a candidate pair (doc1 < doc2, distinct).

    ``bucket_cap`` is the degenerate-bucket guard for corpus scale: a
    (band, bucket) holding d docs emits d^2 join rows, and a
    mass-duplicated document (boilerplate pages at CC scale) creates one
    bucket with d ~ millions. Buckets with > bucket_cap docs are
    EXCLUDED from the pairwise join. This is a RECALL TRADE-OFF, not
    lossless routing: a hot bucket only certifies agreement on that ONE
    band (num_perm/bands hashes). ``lsh_dup_groups`` recovers the
    dominant case (exact full-signature duplicates — boilerplate — as
    one linear row per group), but near-dups whose only collision was
    the capped bucket are lost; raise bucket_cap or add bands to trade
    compute for recall. The oracle row runs uncapped (cap semantics are
    tested with a planted hot bucket in pytest)."""
    assert num_perm % bands == 0
    rows = num_perm // bands
    sigs = minhash_signatures(docs, num_perm, text_col, seed)
    # single posexplode instead of a bands-way union of selects over the
    # signatures aggregate: the union form re-runs the post-shuffle
    # merge aggregation once per band (only the exchange is reused) and
    # unions `bands` branches; one array-posexplode scans the aggregate
    # once (same trick as simhash banding, round 2).
    if bucket_cap is not None:
        # capped path: a pair's earliest matching band may have been
        # removed by the cap, so first-match emission (below) cannot be
        # derived from the signatures alone — keep the distinct.
        band_cols = [
            F.concat_ws("_", *[F.col(f"mh{b * rows + r}") for r in range(rows)])
            for b in range(bands)
        ]
        stacked = sigs.select(
            "doc_id",
            F.posexplode(F.array(*band_cols)).alias("band", "bucket"),
        )
        small = (
            stacked.groupBy("band", "bucket")
            .agg(F.count("*").alias("_bn"))
            .filter(F.col("_bn") <= bucket_cap)
            .select("band", "bucket")
        )
        capped = stacked.join(small, ["band", "bucket"], "left_semi")
        left = capped.select(F.col("doc_id").alias("doc1"), "band", "bucket")
        right = capped.select(F.col("doc_id").alias("doc2"), "band", "bucket")
        return (
            left.join(right, ["band", "bucket"])
            .filter(F.col("doc1") < F.col("doc2"))
            .select("doc1", "doc2")
            .distinct()
        )
    # Materialize the (doc, band keys, band, bucket) table ONCE before
    # the self-join (the two sides carry different projections, so
    # exchange reuse never fires and the tokenize -> md5 -> P-perm
    # aggregation would run twice), then emit each pair ONLY from its
    # FIRST matching band: both sides carry every band's key, so
    # "some earlier band also matched" is a per-row JVM predicate, the
    # output is distinct BY CONSTRUCTION, and the 9M-pair / 40M-row
    # dedup aggregate the old `.distinct()` paid for disappears
    # (round-6 measurement: 40.6M join rows -> 9.2M pairs at sf0.1,
    # the distinct exchange+agg dominated the query).
    #
    # Band keys are PACKED, not concatenated: each mh value is < P <
    # 2^31, so two of them pack injectively into one long (v0 * 2^31 +
    # v1 < 2^62) — a band of `rows` values becomes ceil(rows/2) longs.
    # The join key and the carried per-band keys are then all-integer:
    # the former string buckets + 16 raw signature columns put ~2x the
    # bytes through the 40M-row join and paid string hashing/equality
    # per probe (round-6: 2.8s -> 2.1s warm isolated). Packing is
    # injective, so the pair set (and the first-match band) is
    # IDENTICAL to the string-bucket formulation.
    nk = (rows + 1) // 2

    def _packed(b: int, j: int) -> "F.Column":
        i0 = b * rows + 2 * j
        c = F.col(f"mh{i0}").cast("long")
        if 2 * j + 1 < rows:
            c = c * F.lit(1 << 31).cast("long") + F.col(f"mh{i0 + 1}")
        return c

    pk_cols = [
        _packed(b, j).alias(f"p{b}_{j}")
        for b in range(bands)
        for j in range(nk)
    ]
    band_structs = [
        F.struct(*[F.col(f"p{b}_{j}").alias(f"k{j}") for j in range(nk)])
        for b in range(bands)
    ]
    packed = (
        sigs.select("doc_id", *pk_cols)
        .select(
            "doc_id",
            *[f"p{b}_{j}" for b in range(bands) for j in range(nk)],
            F.posexplode(F.array(*band_structs)).alias("band", "bk"),
        )
        .select(
            "doc_id",
            *[f"p{b}_{j}" for b in range(bands) for j in range(nk)],
            "band",
            *[F.col(f"bk.k{j}").alias(f"bucket{j}") for j in range(nk)],
        )
        .localCheckpoint(eager=True)
    )
    carry = [f"p{b}_{j}" for b in range(bands) for j in range(nk)]
    left = packed.select(
        F.col("doc_id").alias("doc1"),
        *[F.col(c).alias(f"l_{c}") for c in carry],
        "band",
        *[f"bucket{j}" for j in range(nk)],
    )
    right = packed.select(
        F.col("doc_id").alias("doc2"),
        *[F.col(c).alias(f"r_{c}") for c in carry],
        "band",
        *[f"bucket{j}" for j in range(nk)],
    )
    band_eq = [
        None
        if b == 0
        else _all_eq(
            [(f"l_p{b2}_{j}", f"r_p{b2}_{j}") for j in range(nk)]
            for b2 in range(b)
        )
        for b in range(bands)
    ]
    first_match = None
    for b in range(bands):
        cond = F.lit(True) if b == 0 else ~band_eq[b]
        first_match = (
            F.when(F.col("band") == b, cond)
            if first_match is None
            else first_match.when(F.col("band") == b, cond)
        )
    return (
        left.join(right, ["band"] + [f"bucket{j}" for j in range(nk)])
        .filter(F.col("doc1") < F.col("doc2"))
        .filter(first_match)
        .select("doc1", "doc2")
    )


def _all_eq(band_pairs) -> "F.Column":
    """OR over bands of (AND over that band's (left, right) column
    pairs being equal) — 'some earlier band already matched'."""
    any_band = None
    for pairs in band_pairs:
        this_band = None
        for lc, rc in pairs:
            eq = F.col(lc) == F.col(rc)
            this_band = eq if this_band is None else (this_band & eq)
        any_band = this_band if any_band is None else (any_band | this_band)
    return any_band


def lsh_dup_groups(
    docs: DataFrame,
    num_perm: int = 16,
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """Linear-output companion to the bucket cap: docs sharing the FULL
    minhash signature form one dup group (group representative = min
    doc_id). A degenerate million-doc bucket becomes ONE row here
    instead of 10^12 pair rows."""
    sigs = minhash_signatures(docs, num_perm, text_col, seed)
    key = F.concat_ws("_", *[F.col(f"mh{i}") for i in range(num_perm)])
    return (
        sigs.groupBy(key.alias("sig"))
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .select("doc_id", "n_docs")
    )


def simhash(docs: DataFrame, bits: int = 32, text_col: str = "text") -> DataFrame:
    """SimHash over distinct tokens: bit j set iff sum of sign((h>>j)&1)
    > 0. Computed as ``bits`` plain bit-sum agg columns + one count
    (one shuffle): sum of signs = 2*cnt_j - n, so sign > 0 iff
    2*cnt_j > n — identical bits to the conditional +/-1 sums the
    oracle runs, minus a branch per row per column (round 6: ~13%
    off the agg warm time)."""
    toks = _doc_tokens(docs, text_col).withColumn("th", md5_small(F.col("tok")))
    aggs = [
        F.sum(F.shiftright(F.col("th"), j).bitwiseAND(F.lit(1))).alias(f"c{j}")
        for j in range(bits)
    ] + [F.count("*").alias("_n")]
    sums = toks.groupBy("doc_id").agg(*aggs)
    sh = F.lit(0).cast("long")
    for j in range(bits):
        sh = sh + F.when(
            2 * F.col(f"c{j}") > F.col("_n"), F.lit(1 << j)
        ).otherwise(F.lit(0))
    return sums.select("doc_id", sh.alias("simhash"))


def simhash_dup_groups(docs: DataFrame, bits: int = 32, text_col: str = "text") -> DataFrame:
    """Docs sharing an identical simhash (near-dup at 0 hamming)."""
    sh = simhash(docs, bits, text_col)
    return (
        sh.groupBy("simhash")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .select("doc_id", "n_docs")
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    df_cap: int = 1000,
) -> DataFrame:
    """Word-set Jaccard similarity pairs >= threshold.

    |A ∩ B| via token self-join + count, |A ∪ B| = |A| + |B| - |A ∩ B|.
    The token self-join is O(sum df^2): a token in d docs generates d^2
    candidate rows, so ultra-frequent tokens (stopwords at CC scale) are
    dropped FIRST via a document-frequency cap — tokens with df > df_cap
    are removed from every token set (sizes and intersections both see
    the capped sets, so the Jaccard stays internally consistent). This
    bounds the join at O(n * df_cap) rows; MinHash-LSH remains the
    production path for full-corpus near-dup."""
    toks = _doc_tokens(docs, text_col)
    if df_cap is not None:
        df_counts = toks.groupBy("tok").agg(F.count("*").alias("df"))
        keep = df_counts.filter(F.col("df") <= df_cap).select("tok")
        toks = toks.join(keep, "tok", "left_semi")
    # the capped token table feeds THREE subtrees (sizes + both join
    # sides); materialize it once instead of re-running tokenize + the
    # df-cap semi-join per consumer (round-6 single-evaluation pass)
    toks = toks.localCheckpoint(eager=True)
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        toks.alias("a")
        .join(toks.alias("b"), "tok")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "doc1", "sz": "sz1"}), "doc1")
        .join(sizes.withColumnsRenamed({"doc_id": "doc2", "sz": "sz2"}), "doc2")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc1", "doc2", "jaccard")
    )


# ---------------------------------------------------------------------------
# 64-bit SimHash + hamming-k refine (the production near-dup shape; the
# 32-bit `simhash` above keeps the original exact-bit oracle row)
# ---------------------------------------------------------------------------


def _md5_slice32(col, off: int):
    """32 hash bits from md5 hex chars [off, off+8) — portable to the
    DuckDB oracle as ('0x' || substr(md5(x), off, 8))::BIGINT."""
    return F.conv(F.substring(F.md5(col), off, 8), 16, 10).cast("long")


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash as two independent 32-bit halves (doc_id, sim_hi,
    sim_lo). Two md5 slices supply 64 independent token-hash bits (the
    28-bit md5_small of the 32-bit variant can't reach past bit 27);
    the halves stay separate so neither engine touches the sign bit of
    a 64-bit integer. One shuffle: 64 conditional-sum agg columns."""
    toks = _doc_tokens(docs, text_col)
    # stage the md5 hex ONCE — the two 32-bit slices previously carried
    # independent F.md5 trees, hashing every token twice (round 6;
    # values identical, the slices read the same staged digest)
    toks = (
        toks.withColumn("_md5", F.md5(F.col("tok")))
        .withColumn("tlo", F.conv(F.substring(F.col("_md5"), 1, 8), 16, 10).cast("long"))
        .withColumn("thi", F.conv(F.substring(F.col("_md5"), 9, 8), 16, 10).cast("long"))
    )
    # plain bit sums + one count instead of 64 conditional +/-1 sums:
    # sign-sum > 0 iff 2*cnt > n (see `simhash`) — identical halves
    aggs = [
        F.sum(F.shiftright(F.col(src), j).bitwiseAND(F.lit(1))).alias(
            f"c{half}{j}"
        )
        for half, src in (("lo", "tlo"), ("hi", "thi"))
        for j in range(32)
    ] + [F.count("*").alias("_n")]
    sums = toks.groupBy("doc_id").agg(*aggs)
    out = {}
    for half in ("lo", "hi"):
        acc = F.lit(0).cast("long")
        for j in range(32):
            acc = acc + F.when(
                2 * F.col(f"c{half}{j}") > F.col("_n"), F.lit(1 << j)
            ).otherwise(F.lit(0))
        out[half] = acc
    return sums.select(
        "doc_id", out["hi"].alias("sim_hi"), out["lo"].alias("sim_lo")
    )


def simhash64_near_dups(
    docs: DataFrame, k: int = 3, text_col: str = "text"
) -> DataFrame:
    """Near-dup pairs with hamming(simhash64) <= k.

    Scale path: band the 64 bits into 4 x 16-bit keys and equi-join on
    (band, key) — by pigeonhole any pair within hamming 3 shares at
    least one clean band, so the bucket join is LOSSLESS for k <= 3
    (for k > 3 it is the standard probabilistic candidate generator).
    Refine = popcount of the XOR of both halves. No all-pairs product;
    a degenerate bucket (mass-identical docs) is the same skew case as
    LSH and takes the same salting remedy."""
    sh = simhash64(docs, text_col)
    # posexplode of the 4 band keys — ONE computation of the 64-agg
    # signature (a 4-way union would recompute the whole aggregation
    # per branch: 4x the scan and shuffle)
    band_keys = F.array(
        *[
            F.shiftright(F.col(col), sh_amt).bitwiseAND(F.lit(0xFFFF))
            for col, sh_amt in [
                ("sim_lo", 0),
                ("sim_lo", 16),
                ("sim_hi", 0),
                ("sim_hi", 16),
            ]
        ]
    )
    stacked = sh.select(
        "doc_id",
        "sim_hi",
        "sim_lo",
        F.posexplode(band_keys).alias("band", "key"),
    )
    # same single-evaluation discipline as lsh_candidate_pairs: the
    # 64-conditional-sum signature aggregation would otherwise be
    # computed once per join side (no exchange reuse across differing
    # projections); checkpoint the 4-rows-per-doc band table once.
    stacked = stacked.localCheckpoint(eager=True)
    a, b_ = stacked.alias("a"), stacked.alias("b")
    ham = F.bit_count(
        F.col("a.sim_lo").bitwiseXOR(F.col("b.sim_lo"))
    ) + F.bit_count(F.col("a.sim_hi").bitwiseXOR(F.col("b.sim_hi")))
    # first-match emission (see lsh_candidate_pairs): the 4 band keys
    # are bit slices of (sim_lo, sim_hi), which BOTH join sides already
    # carry for the hamming refine, so "an earlier band also matched"
    # is a per-row predicate and the result is distinct by construction
    # — no pair-dedup aggregate over the full candidate set.
    band_defs = [("sim_lo", 0), ("sim_lo", 16), ("sim_hi", 0), ("sim_hi", 16)]

    def _key_eq(col: str, sh_amt: int):
        mask = F.lit(0xFFFF)
        return (
            F.shiftright(F.col(f"a.{col}"), sh_amt).bitwiseAND(mask)
            == F.shiftright(F.col(f"b.{col}"), sh_amt).bitwiseAND(mask)
        )

    first_match = None
    for bi in range(len(band_defs)):
        if bi == 0:
            cond = F.lit(True)
        else:
            earlier = None
            for col, sh_amt in band_defs[:bi]:
                eq = _key_eq(col, sh_amt)
                earlier = eq if earlier is None else (earlier | eq)
            cond = ~earlier
        first_match = (
            F.when(F.col("band") == bi, cond)
            if first_match is None
            else first_match.when(F.col("band") == bi, cond)
        )
    return (
        a.join(b_, ["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(first_match)
        .select(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
            ham.cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= k)
    )
