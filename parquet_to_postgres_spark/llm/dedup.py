"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All near-dup signatures use *arithmetic* hash families over a dense token
dictionary — ``h_j(id) = (a_j·id + b_j) mod p`` — instead of engine hash
builtins (Spark's murmur3 ``hash()`` and DuckDB's ``hash()`` disagree), so
the DuckDB oracle reproduces every signature bit-for-bit.

Scale notes: the token dictionary is a distinct+rank over the vocabulary,
which is tiny relative to the corpus (Heaps' law); the banded LSH join
groups by (band, key) so candidate generation is an equi-shuffle, never a
cross join.  Exact dedup is a single hash-aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Fixed hash family: h_j(id) = (A + STEP_A*j)*id + (B + STEP_B*j) mod P.
# Two pitfalls, both hit and fixed during development:
# 1. P must be MUCH larger than the vocabulary — with a small modulus the
#    min over a doc's token hashes concentrates near 0 and band keys
#    collide for unrelated docs (LSH degenerates to an all-pairs join).
# 2. A_j must be LARGER than P — otherwise A_j*id never wraps the
#    modulus, h_j is order-preserving in id, every hash function picks
#    the same argmin token, and the 8 "independent" signatures are one.
# Products stay < 2^63 (A_j < 10^7, token ids < 10^6 → < 10^13), and all
# arithmetic is done in int64 on both engines (explicit long casts on the
# Spark side; DuckDB ints are 64-bit natively).
MINHASH_P = 1_000_003
A0, STEP_A, B0, STEP_B = 1_103_245, 999_983, 12_289, 271_829


def hash_params(j: int) -> tuple[int, int]:
    return A0 + STEP_A * j, B0 + STEP_B * j


def tokenize(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, token) pairs, set semantics (distinct per doc)."""
    return (
        df.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .distinct()
    )


def token_dictionary(tokens: DataFrame) -> DataFrame:
    """Dense 1-based token ids, ordered by token text (deterministic).

    Ranking is the two-phase :func:`~..operators.distributed_rank`
    (range-repartition → per-partition rank → broadcast offsets), NOT a
    single-partition global window: under Heaps' law a 100 TB corpus has
    a vocabulary of billions of tokens, and funneling it through one
    ranking task would be the pipeline's scale ceiling.  Ids are
    identical to ``row_number() OVER (ORDER BY token)`` — token text is
    a total order — so the generated oracle SQL is unchanged."""
    from ..operators import distributed_rank

    return distributed_rank(
        tokens.select("token").distinct(), [F.col("token")], rank_col="token_id"
    ).withColumn("token_id", F.col("token_id").cast("int"))


def _minhash_aggs(num_hashes: int) -> list[Column]:
    aggs = []
    for j in range(num_hashes):
        a, b = hash_params(j)
        aggs.append(
            F.min(
                (F.lit(a).cast("long") * F.col("token_id").cast("long") + F.lit(b))
                % MINHASH_P
            ).alias(
                f"mh{j}"
            )
        )
    return aggs


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc MinHash signature: one min-aggregate per hash function
    (single shuffle on doc id; map-side partial mins)."""
    toks = tokenize(df, text_col, id_col)
    with_ids = toks.join(token_dictionary(toks), "token")
    return with_ids.groupBy(id_col).agg(*_minhash_aggs(num_hashes))


def minhash_profiles(
    df: DataFrame,
    num_hashes: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Signature *and* token-id set in ONE aggregation per doc.

    The token-id set rides along as a sorted int array so the LSH verify
    stage can compute exact Jaccard with a per-row ``array_intersect``
    instead of re-tokenizing the corpus and shuffle-joining candidate
    pairs against every (doc, token) row — the latter is quadratic in
    duplicate-cluster size × tokens-per-doc and dominated the runtime."""
    toks = tokenize(df, text_col, id_col)
    with_ids = toks.join(token_dictionary(toks), "token")
    return with_ids.groupBy(id_col).agg(
        F.sort_array(F.collect_set("token_id")).alias("tokset"),
        F.count(F.lit(1)).alias("sz"),
        *_minhash_aggs(num_hashes),
    )


def minhash_band_pairs(
    signatures: DataFrame,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH banding: docs sharing any band key become candidate pairs.

    Bands are exploded to (band, key) rows and self-joined on the band
    key — an equi-join that shuffles on (band, key), linear in candidate
    count rather than quadratic in corpus size."""
    n_bands = num_hashes // rows_per_band
    band_structs = []
    for bidx in range(n_bands):
        cols = [
            F.col(f"mh{bidx * rows_per_band + r}") for r in range(rows_per_band)
        ]
        band_structs.append(
            F.struct(
                F.lit(bidx).alias("band"),
                F.concat_ws("_", *cols).alias("key"),
            )
        )
    bands = signatures.select(
        F.col(id_col).alias("id"), F.explode(F.array(*band_structs)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, [F.col("a.band") == F.col("b.band"), F.col("a.key") == F.col("b.key"), F.col("a.id") < F.col("b.id")])
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def profile_jaccard(profiles: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact token-set Jaccard for candidate pairs, from the precomputed
    token-id arrays in :func:`minhash_profiles`.

    Per-pair cost is one ``array_intersect`` over two small int arrays —
    no shuffle beyond the two equi-joins that attach the arrays.  At
    100 TB the profiles side is hash-partitioned on doc id and the pair
    list is the small side; only candidates pay the exact cost."""
    pa = profiles.select(
        F.col("doc_id").alias("id_a"),
        F.col("tokset").alias("ts_a"),
        F.col("sz").alias("sz_a"),
    )
    pb = profiles.select(
        F.col("doc_id").alias("id_b"),
        F.col("tokset").alias("ts_b"),
        F.col("sz").alias("sz_b"),
    )
    n_inter = F.size(F.array_intersect("ts_a", "ts_b"))
    return (
        pairs.join(pa, "id_a")
        .join(pb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                n_inter.cast("double") / (F.col("sz_a") + F.col("sz_b") - n_inter)
            ).alias("jaccard"),
        )
    )


def simhash(
    df: DataFrame,
    n_bits: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash fingerprint: weighted sign-sum of token-hash bits.

    Weight = token frequency in the doc.  bit_j(doc) = 1 iff
    Σ_tokens w·(2·bit_j(h(token)) − 1) > 0, with h the arithmetic hash —
    reproducible in plain SQL on both engines."""
    toks = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("token")
    )
    weighted = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("w"))
    dictionary = token_dictionary(weighted.select(id_col, "token"))
    a, b = hash_params(0)
    g = (F.lit(a).cast("long") * F.col("token_id").cast("long") + F.lit(b)) % F.lit(
        1 << n_bits
    )
    with_bits = weighted.join(dictionary, "token").withColumn("g", g)
    bit_sums = with_bits.groupBy(id_col).agg(
        *[
            F.sum(
                F.col("w")
                * (F.shiftright(F.col("g"), j).bitwiseAND(F.lit(1)) * 2 - 1)
            ).alias(f"s{j}")
            for j in range(n_bits)
        ]
    )
    sim = F.lit(0).cast("long")
    for j in range(n_bits):
        sim = sim + F.shiftleft((F.col(f"s{j}") > 0).cast("long"), j)
    return bit_sums.select(id_col, sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    n_bits: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, bit-band blocked.

    The signature is split into ``max_hamming + 1`` disjoint bit bands;
    by pigeonhole, any pair within ``max_hamming`` differing bits agrees
    EXACTLY on at least one band, so banding is recall-lossless.
    Candidate generation is therefore an equi-join on (band, band-bits)
    — the same shuffle shape as MinHash LSH, linear in candidates — and
    exact hamming is computed only within blocks, never all-pairs
    (an O(n²) non-equi self-join would be catastrophic at 100 TB)."""
    sigs = simhash(df, n_bits, text_col, id_col)
    n_bands = max_hamming + 1
    band_bits = n_bits // n_bands
    bands = []
    for bidx in range(n_bands):
        lo = bidx * band_bits
        # last band absorbs the remainder bits so all n_bits are covered
        width = band_bits if bidx < n_bands - 1 else n_bits - lo
        key = F.shiftright(F.col("simhash"), lo).bitwiseAND(F.lit((1 << width) - 1))
        bands.append(F.struct(F.lit(bidx).alias("band"), key.alias("key")))
    banded = sigs.select(
        F.col(id_col).alias("id"),
        F.col("simhash").alias("sh"),
        F.explode(F.array(*bands)).alias("bk"),
    ).select("id", "sh", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            [
                F.col("a.band") == F.col("b.band"),
                F.col("a.key") == F.col("b.key"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        # a pair can match on several bands; hamming is functionally
        # dependent on the pair, so distinct dedups the candidates
        .distinct()
    )


def char_ngrams(text_col: Column | str, n: int = 3) -> Column:
    """Distinct character n-grams via sequence+transform (JVM-side)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, length({text_col}) - {n - 1}), "
            f"i -> substring({text_col}, i, {n}))"
        )
    )


def exact_dedup(
    df: DataFrame, key: Column | str, id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup by arbitrary key expression: keep the lowest id as the
    representative, count collapsed copies.  One hash-aggregate shuffle."""
    k = F.col(key) if isinstance(key, str) else key
    return (
        df.select(F.col(id_col), k.alias("dedup_key"))
        .groupBy("dedup_key")
        .agg(
            F.min(id_col).alias("representative"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
