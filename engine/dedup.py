"""Deduplication operators (SURVEY.md §2.9, ``dedup_*`` keys) — exact,
normalized, and MinHash-LSH near-duplicate detection.

The corpus has no native duplicates at test scale, so each key builds a
deterministic duplicated corpus inline (originals ∪ mutated copies at
``doc_id + 100000``) — the dedup path is exercised for real, and the
expected survivor set is exactly the originals.

Scale design (SURVEY.md §1.3c): near-dup detection is banded MinHash —
shingle → per-seed min-hash → band key → bucket self-join — candidate
pairs are generated per LSH bucket, NEVER by an all-pairs cross join.
Verification (exact Jaccard) runs only on the bounded candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine.core import query
from engine.io import load

_COPY_OFFSET = 100_000


def _tokens(col: F.Column) -> F.Column:
    return F.filter(F.split(F.lower(col), " "), lambda t: t != "")


_TOKENS_SQL = "list_filter(string_split(lower({c}), ' '), t -> t <> '')"


@query(
    "dedup_exact",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text, lang, source FROM documents
        UNION ALL
        SELECT doc_id + {_COPY_OFFSET}, text, lang, source FROM documents
    ),
    ranked AS (
        SELECT doc_id, lang, source,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM corpus
    )
    SELECT doc_id, lang, source FROM ranked WHERE rn = 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash, keep-lowest-doc_id.

    Hash first, then group: the shuffle key is the 32-byte md5, not the
    document body — at 100 TB the full text never needs to co-locate.
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    corpus = d.unionByName(
        d.withColumn("doc_id", F.col("doc_id") + _COPY_OFFSET)
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        corpus.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source")
    )


@query(
    "dedup_normalized",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text, lang FROM documents
        UNION ALL
        SELECT doc_id + {_COPY_OFFSET}, upper(text) || '  !!', lang FROM documents
    ),
    normed AS (
        SELECT doc_id, lang,
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                   ' +', ' ', 'g')) AS norm_text
        FROM corpus
    ),
    ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY md5(norm_text) ORDER BY doc_id) AS rn
        FROM normed
    )
    SELECT doc_id, lang FROM ranked WHERE rn = 1
    """,
)
def dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Normalization pipeline: lowercase → strip non-alphanumerics →
    # collapse whitespace → trim; copies differ in case/punctuation only
    # and must collapse onto their originals.
    d = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    corpus = d.unionByName(
        d.select(
            (F.col("doc_id") + _COPY_OFFSET).alias("doc_id"),
            F.concat(F.upper("text"), F.lit("  !!")).alias("text"),
            "lang",
        )
    )
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    w = Window.partitionBy(F.md5(norm)).orderBy("doc_id")
    return (
        corpus.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang")
    )


_N_HASHES = 16
_BAND_SIZE = 4  # → 4 bands of 4 hashes


@query("dedup_minhash_near", oracle=None)  # rows-only: xxhash64 ≠ any DuckDB fn
def dedup_minhash_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via k-shingle MinHash + LSH banding (rows-only key;
    Spark's xxhash64 isn't reproducible in DuckDB SQL).

    Pipeline (every step a DataFrame op, deterministic seeds, no RNG):
      1. 3-word shingles per doc (indexed ``transform`` — per-row, no
         shuffle);
      2. 16 min-hashes per doc: h_i = min over shingles of
         xxhash64(i || shingle) — explode + groupBy(doc);
      3. 4 band keys per doc = xxhash64 of 4 consecutive min-hashes;
      4. candidate pairs = docs sharing a band key (self-join on the
         band key — bucket-local, never all-pairs);
      5. exact shingle-Jaccard verification on candidates only.

    The duplicated corpus appends near-copies (2 extra tokens) at
    doc_id+100000; they must surface as (d, d+100000) pairs.
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.select(
            (F.col("doc_id") + _COPY_OFFSET).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz yy")).alias("text"),
        )
    )
    toks = _tokens(F.col("text"))
    shingles = F.array_distinct(
        F.transform(
            F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0))),
            lambda x, i: F.concat_ws(
                " ", x, F.element_at(toks, i + 2), F.element_at(toks, i + 3)
            ),
        )
    )
    # The (doc, shingle) relation feeds three consumers (signatures +
    # both sides of the Jaccard verify) — persist the diamond so the
    # tokenize+explode runs once, not three times.  At cluster scale
    # this is the stage you'd checkpoint.
    doc_shingle = corpus.select(
        "doc_id", F.explode(shingles).alias("shingle")
    ).persist()

    # 16 seeded hashes as COLUMNS of the (doc, shingle) rows, min-reduced
    # per doc in one pass — columnar min beats exploding 16 hash rows per
    # shingle by 16× shuffle volume (one shuffle on doc_id either way,
    # but this one carries 16 longs per shingle row, not 16 rows).
    sig = doc_shingle.groupBy("doc_id").agg(
        *[
            F.min(
                F.xxhash64(F.concat(F.lit(str(i)), F.col("shingle")))
            ).alias(f"minh{i}")
            for i in range(_N_HASHES)
        ]
    )

    # One band key per 4 consecutive min-hashes; explode to (doc, band,
    # band_key) rows for the bucket self-join.
    band_keys = F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"minh{i}").cast("string")
                        for i in range(b * _BAND_SIZE, (b + 1) * _BAND_SIZE)
                    ],
                )
            )
            for b in range(_N_HASHES // _BAND_SIZE)
        ]
    )
    band = sig.select(
        "doc_id", F.posexplode(band_keys).alias("band", "band_key")
    )

    a = band.alias("a")
    b = band.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )

    # Exact Jaccard verification on the bounded candidate set.
    sh = doc_shingle.distinct()
    n_sh = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sh_a = sh.withColumnRenamed("doc_id", "doc_a")
    sh_b = sh.select(
        F.col("doc_id").alias("b_id"), F.col("shingle").alias("shingle_b")
    )
    common = (
        sh_a.join(F.broadcast(cand), "doc_a")
        .join(
            sh_b,
            (F.col("doc_b") == F.col("b_id"))
            & (F.col("shingle") == F.col("shingle_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(n_sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "n_a"), "doc_a")
        .join(n_sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "n_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )


@query(
    "dedup_jaccard_verify",
    oracle=f"""
    WITH tok AS (
        SELECT DISTINCT d.doc_id, t.tok
        FROM documents d, UNNEST({_TOKENS_SQL.format(c="d.text")}) AS t(tok)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        WHERE a.doc_id % 10 = 0
    ),
    commons AS (
        SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
        FROM pairs p
        JOIN tok ta ON ta.doc_id = p.doc_a
        JOIN tok tb ON tb.doc_id = p.doc_b AND tb.tok = ta.tok
        GROUP BY p.doc_a, p.doc_b
    )
    SELECT c.doc_a, c.doc_b,
           CAST(sa.n AS INTEGER) AS n_a,
           CAST(sb.n AS INTEGER) AS n_b,
           CAST(c.n_common AS INTEGER) AS n_common,
           CAST(c.n_common AS DOUBLE) / (sa.n + sb.n - c.n_common) AS jaccard
    FROM commons c
    JOIN sizes sa ON sa.doc_id = c.doc_a
    JOIN sizes sb ON sb.doc_id = c.doc_b
    """,
)
def dedup_jaccard_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard over a bounded blocked pair set
    (consecutive doc_ids, every 10th) — the verification stage a banded
    LSH pipeline feeds; integer set sizes → one deterministic division."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok")).distinct()
    sizes = tok.groupBy("doc_id").agg(F.count("*").cast("int").alias("n"))
    pairs = (
        d.filter(F.col("doc_id") % 10 == 0)
        .select(F.col("doc_id").alias("doc_a"), (F.col("doc_id") + 1).alias("doc_b"))
        .join(d.select(F.col("doc_id").alias("doc_b")), "doc_b", "left_semi")
    )
    ta = tok.withColumnRenamed("doc_id", "doc_a")
    tb = tok.select(F.col("doc_id").alias("b_id"), F.col("tok").alias("tok_b"))
    commons = (
        pairs.join(ta, "doc_a")
        .join(tb, (F.col("doc_b") == F.col("b_id")) & (F.col("tok") == F.col("tok_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("int").alias("n_common"))
    )
    return (
        commons.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "n_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_a",
            "n_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
