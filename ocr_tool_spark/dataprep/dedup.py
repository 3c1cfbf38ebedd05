"""Deduplication operators for training-data pipelines.

Four families, all expressed in native Spark SQL expressions (JVM-side,
whole-stage-codegen'd; zero Python UDFs):

- exact:      hash-groupBy on normalized text (md5 — cross-engine
              comparable, so the DuckDB oracle can replay it)
- MinHash+LSH: word-shingles → H universal-hashed min signatures →
              banded bucket join → candidate pairs → exact-Jaccard
              verify. The classic Broder/LSH pipeline; at 100 TB the
              only shuffles are the band groupBy and the final
              distinct, and bucket size is capped to keep degenerate
              buckets (boilerplate shingles) from exploding the
              candidate join.
- SimHash:    Charikar 64-bit signature via per-bit voting over token
              hashes; candidates share one of four 16-bit chunks
              (pigeonhole: hamming ≤ 3 ⇒ some chunk equal), verified
              by bit_count(sig_a XOR sig_b).
- n-gram Jaccard: exact token-set Jaccard for candidate verification
              and for the SQL-checkable adjacent-pair query.

All hashes are xxhash64 (Spark built-in) mixed with fixed odd
multipliers — deterministic across runs and partitionings (J5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: universal-hash modulus. Shingle hashes are
# first reduced mod P so a*x+b stays well inside the signed-long range
# (ANSI mode makes overflow a hard error in Spark 4).
_P = (1 << 31) - 1


def normalize_text(c: Column) -> Column:
    """Canonical text form shared by every dedup family (and the SQL
    oracles): lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(c: Column) -> Column:
    return F.split(normalize_text(c), " ")


def shingles(c: Column, k: int = 3) -> Column:
    """Distinct word k-shingles as strings ('w1 w2 w3')."""
    t = tokens(c)
    n = F.size(t)
    return F.array_distinct(
        F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(0), n - k),
                lambda i: F.concat_ws(" ", F.slice(t, i + 1, k)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", t)))
    )


# ---------------------------------------------------------------- exact


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Group identical (normalized) texts: (text_hash, keep_id, n_copies).
    keep_id = min doc_id, the canonical survivor."""
    return (
        docs.select("doc_id", F.md5(normalize_text(F.col(text_col))).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


# ------------------------------------------------------------- minhash


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", num_hashes: int = 32, k: int = 3
) -> DataFrame:
    """(doc_id, _sh: distinct shingles, sig: array of num_hashes mins).

    Three projection steps so each expensive expression is evaluated
    exactly ONCE per row: shingle construction, then xxhash64 of every
    shingle, then the num_hashes universal-hash min-folds as pure
    integer arithmetic over the materialized hash array. (Inlining the
    shingle expression into every lane re-evaluates it num_hashes
    times — measured 30x slower.)"""
    def lane(i: int) -> Column:
        a, b = 2 * i + 1, 0x9E3779B9 * (i + 1) & 0x7FFFFFFF
        return F.array_min(
            F.transform("_hs", lambda x: F.pmod(x * a + b, F.lit(_P)))
        )

    return (
        docs.select("doc_id", shingles(F.col(text_col), k).alias("_sh"))
        .withColumn(
            "_hs", F.transform("_sh", lambda s: F.pmod(F.xxhash64(s), F.lit(_P)))
        )
        .select(
            "doc_id", "_sh", F.array(*[lane(i) for i in range(num_hashes)]).alias("sig")
        )
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    threshold: float = 0.8,
    max_bucket: int = 64,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard ≥ threshold).

    Plan shape: sig → explode bands (rows ×bands, but each row is just
    (doc_id, band hash)) → groupBy bucket w/ size cap → in-bucket pair
    generation via double posexplode i<j → distinct → exact-Jaccard
    verify on the shingle sets (join back twice, broadcast-eligible at
    fixture scale, shuffled at 100 TB where AQE skew-split applies).
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, text_col, num_hashes, k).persist()

    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ":",
                        b,
                        F.concat_ws(",", F.slice("sig", b * rows_per_band + 1, rows_per_band)),
                    )
                ),
            )
        ).alias("band", "bucket"),
    )
    buckets = (
        banded.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    cand = (
        buckets.select(F.posexplode("ids").alias("i", "id_a"), "ids")
        .select("i", "id_a", F.posexplode("ids").alias("j", "id_b"))
        .filter(F.col("i") < F.col("j"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = sigs.select(F.col("doc_id").alias("id_a"), F.col("_sh").alias("_sha"))
    b = sigs.select(F.col("doc_id").alias("id_b"), F.col("_sh").alias("_shb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("_sha", "_shb"))
                / F.size(F.array_union("_sha", "_shb"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ------------------------------------------------------------- simhash


def with_simhash(df: DataFrame, text_col: str = "text", out_col: str = "sig") -> DataFrame:
    """Add a Charikar 64-bit simhash column (signed long). Two
    projections: the per-bit vote fold, then the bit assembly — kept as
    separate selects so the 64-lane vote expression appears exactly
    once in the plan instead of 64 times."""
    return df.withColumn("_votes", _vote_expr(F.col(text_col))).withColumn(
        out_col, _sig_from_votes(F.col("_votes"))
    ).drop("_votes")


def _vote_expr(c: Column) -> Column:
    """Per-bit vote: +1 if token-hash bit set else -1, summed over the
    token multiset → array<int> of 64 vote totals."""
    hashes = F.transform(tokens(c), lambda t: F.xxhash64(t))
    # shift amounts must be literals, so the 64 bit-lanes are unrolled
    # Python-side into one array constructor (still a single JVM expr)
    return F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
                    ).otherwise(-1)
                    for j in range(64)
                ]
            ),
            lambda x, y: x + y,
        ),
    )


def _sig_from_votes(votes: Column) -> Column:
    sig = F.lit(0).cast("long")
    for j in range(64):
        sig = sig.bitwiseOR(
            F.when(
                F.element_at(votes, j + 1) > 0,
                F.lit(1 << j if j < 63 else -(1 << 63)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        )
    return sig


def simhash_pairs(
    docs: DataFrame, text_col: str = "text", max_hamming: int = 3, max_bucket: int = 64
) -> DataFrame:
    """Near-dup pairs with hamming(sig_a, sig_b) ≤ max_hamming.
    Candidates via 16-bit chunk equality (4 chunks; hamming ≤ 3 over 64
    bits ⇒ at least one chunk identical — pigeonhole-complete)."""
    sigs = with_simhash(docs.select("doc_id", text_col), text_col).select(
        "doc_id", "sig"
    ).persist()
    chunked = sigs.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("sig", i * 16).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    buckets = (
        chunked.groupBy("chunk_idx", "chunk")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "sig"))).alias("ms"))
        .filter((F.size("ms") > 1) & (F.size("ms") <= max_bucket))
    )
    cand = (
        buckets.select(F.posexplode("ms").alias("i", "a"), "ms")
        .select("i", "a", F.posexplode("ms").alias("j", "b"))
        .filter(F.col("i") < F.col("j"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_hamming)


# ------------------------------------------------------- n-gram jaccard


def jaccard(a: Column, b: Column) -> Column:
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b))


def adjacent_jaccard(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token-set Jaccard between each doc and its doc_id successor —
    the SQL-checkable face of the exact-Jaccard verifier."""
    t = docs.select(
        "doc_id", F.array_distinct(tokens(F.col(text_col))).alias("w")
    )
    a, b = t.alias("a"), t.alias("b")
    return (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.round(jaccard(F.col("a.w"), F.col("b.w")), 6).alias("jac_next"),
        )
    )
