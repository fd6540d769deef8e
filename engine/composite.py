"""Composite analytic workloads (beyond SURVEY.md §2, round 3).

End-to-end TPC-H-shaped queries — multi-join + aggregate + top-k in one
plan — plus a mergeable-sketch key.  The single-operator keys prove each
primitive; these prove the primitives COMPOSE the way a real reporting
workload uses them, and they give the bench per-plan anchors where join
order / broadcast choices actually matter.

Reference parity note: the reference repo (/root/reference,
README.md:1-2) has no code; shapes follow the public TPC-H spec (Q3/Q5),
adapted to the driver corpus schema (no shippriority column; synthetic
NATION_*/region names; dates 1995-2001).

100 TB notes — broadcast-hint policy (r11 audit, extending the r10
setsim finding to the whole module): a hard ``F.broadcast()`` FORCES
the build side regardless of size, so the hint is reserved for sides
bounded BY CONSTRUCTION — region (5 rows), nation (25), single-row
scalars, aggregated artifacts.  customer/supplier/part and their
pruned derivatives grow LINEARLY with scale factor (customer is ~15 GB
at SF 100k); they carry NO hint — at bench scale Spark's size-based
auto-broadcast (10 MB default) + AQE picks the same broadcast plans
the hints used to force (the plan tests now pin that stats-driven
choice), while at 100 TB the same code degrades safely to shuffle
joins instead of OOMing the driver.  Revenue is summed in exact
integer cents (map-side partial agg, no float drift); top-k compiles
to TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine.core import query
from engine.io import load


def _cents(col: F.Column) -> F.Column:
    """Exact integer cents of a money double (deterministic both engines)."""
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


_CENTS_SQL = "CAST(FLOOR(({expr}) * 100 + 0.5) AS BIGINT)"


@query(
    "tpch_q3_top_orders",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           CAST(SUM({_CENTS_SQL.format(expr="l.l_extendedprice * (1 - l.l_discount)")}) AS BIGINT)
               AS revenue_cents
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue_cents DESC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def tpch_q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping-priority top orders): segment-filtered
    customers ⋈ orders ⋈ lineitem, revenue per open order, top 10.

    Plan shape that must survive 100 TB: the filtered customer dim
    broadcasts into orders (no shuffle of the fact side for that join);
    orders⋈lineitem shuffles on orderkey once; the LIMIT compiles to
    TakeOrderedAndProject (pinned in tests/test_plans.py) with the unique
    l_orderkey tiebreak making top-10 deterministic.
    """
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    revenue = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("order_date"))
        .agg(F.sum(revenue).alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_nation_revenue",
    oracle=f"""
    SELECT n.n_name,
           CAST(SUM({_CENTS_SQL.format(expr="l.l_extendedprice * (1 - l.l_discount)")}) AS BIGINT)
               AS revenue_cents
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey   = c.c_custkey
    JOIN lineitem l ON l.l_orderkey  = o.o_orderkey
    JOIN supplier s ON s.s_suppkey   = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue_cents DESC, n.n_name ASC
    """,
)
def tpch_q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local-supplier volume): 6-table star — revenue by
    nation where the supplier and the customer share the nation.

    All five dim sides (region, nation, customer, supplier) broadcast;
    the only shuffle joins orders⋈lineitem on orderkey and the final
    5-row aggregate.  The s_nationkey = c_nationkey residual rides on
    the supplier broadcast join.
    """
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    revenue = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(revenue).alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("n_name"))
    )


@query(
    "tpch_q10_returns",
    oracle=f"""
    SELECT c.c_custkey,
           c.c_name,
           n.n_name,
           CAST(SUM({_CENTS_SQL.format(expr="l.l_extendedprice * (1 - l.l_discount)")}) AS BIGINT)
               AS lost_revenue_cents,
           COUNT(*) AS n_return_items
    FROM customer c
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN orders o   ON o.o_custkey   = c.c_custkey
    JOIN lineitem l ON l.l_orderkey  = o.o_orderkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY lost_revenue_cents DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): customers ranked by
    revenue lost to returns in one half-year window — the third
    composite, exercising a fact-side flag filter + date-windowed
    order filter + two broadcast dims + top-k in one plan.

    Plan shape that must survive 100 TB: the returnflag filter prunes
    lineitem AT THE SCAN (PushedFilters), the date filter prunes orders
    likewise, so the one orderkey shuffle joins two pre-filtered facts;
    customer and nation broadcast; LIMIT 20 with the unique c_custkey
    tiebreak compiles to TakeOrderedAndProject.
    """
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(revenue).alias("lost_revenue_cents"),
            F.count("*").alias("n_return_items"),
        )
        .orderBy(F.desc("lost_revenue_cents"), F.asc("c_custkey"))
        .limit(20)
    )


@query("agg_hll_partitioned_merge", oracle=None)  # rows-only: sketch binary
def agg_hll_partitioned_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches — the 100 TB cardinality story.

    Per-segment HLL sketches (Apache DataSketches via hll_sketch_agg) are
    unioned with hll_union_agg into a global estimate WITHOUT re-scanning
    the base table — the associativity that lets a 1000-executor cluster
    (or a day-partitioned pipeline) maintain distinct counts by merging
    per-partition sketches.  Output is long-form (segment, estimate) plus
    a '_merged' row from the sketch union; tests/test_unit_semantics.py
    bounds every estimate against the exact distinct count (HLL lgk=12
    standard error ≈ 1.6%).

    Rows-only: the sketch estimate is implementation-defined (DataSketches
    HLL), not reproducible in DuckDB SQL.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    seg = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "o_custkey"
    )
    sketches = seg.groupBy("c_mktsegment").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    per_seg = sketches.select(
        F.col("c_mktsegment").alias("segment"),
        F.hll_sketch_estimate("sk").alias("est_distinct_customers"),
    )
    merged = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(
            "est_distinct_customers"
        )
    ).select(F.lit("_merged").alias("segment"), "est_distinct_customers")
    return per_seg.unionByName(merged)


@query("pipeline_corpus_clean", oracle=None)  # rows-only: MinHash stage
def pipeline_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus cleaning — the north-star pipeline
    (BASELINE.json:6) as ONE composed plan:

        quality gate → exact dedup → MinHash near-dup removal

    The input corpus plants one failure mode per stage: byte-identical
    copies at doc_id+200000 (exact stage), near-copies with 2 appended
    tokens at +100000 (MinHash stage), and 2-token junk docs at +300000
    (quality gate).  Output labels EVERY input doc with its fate —
    kept / low_quality / exact_dup / near_dup — the audit trail a data
    curation run must emit (you never silently drop training data).

    100 TB shape: the quality gate is a per-row filter (no shuffle);
    exact dedup shuffles md5 fingerprints (16 bytes), not text; the
    near-dup stage is the bucketed banded-LSH of
    engine.dedup.minhash_near_pairs — no all-pairs join anywhere.
    Drop policy is keep-lowest-doc_id (deterministic); near-dup removal
    drops the greater member of each verified pair.
    """
    from engine.dedup import minhash_near_pairs
    from engine.text import _tokens

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    raw = (
        d.unionByName(
            d.select(
                (F.col("doc_id") + 100_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zz yy")).alias("text"),
            )
        )
        .unionByName(
            d.select((F.col("doc_id") + 200_000).alias("doc_id"), "text")
        )
        .unionByName(
            d.select(
                (F.col("doc_id") + 300_000).alias("doc_id"),
                F.lit("zz spam").alias("text"),
            )
        )
    )

    # Stage 1 — quality gate: ≥ 5 tokens (per-row, no shuffle).
    n_toks = F.size(_tokens(F.col("text")))
    # gated feeds BOTH the low_quality status and the dedup path — the
    # 4-way union + tokenize re-derived per consumer without persist
    # (measured ~1 s at sf0.1 on the KR twin; same diamond here).
    gated = raw.withColumn("lowq", n_toks < 5).persist()
    low_quality = gated.filter("lowq").select(
        "doc_id", F.lit("low_quality").alias("status")
    )
    after_q = gated.filter(~F.col("lowq")).select("doc_id", "text")

    # Stage 2 — exact dedup on md5 fingerprint, keep lowest doc_id.
    fp = after_q.withColumn("fp", F.md5("text"))
    w = Window.partitionBy("fp").orderBy("doc_id")
    ranked = fp.withColumn("rn", F.row_number().over(w))
    exact_dup = ranked.filter(F.col("rn") > 1).select(
        "doc_id", F.lit("exact_dup").alias("status")
    )
    # ``uniq`` feeds THREE consumers (the MinHash stage and both status
    # joins) and its subtree is the whole 4-way union + fingerprint
    # window — persist it so that runs once, not three times.  At
    # cluster scale this is the natural stage boundary you'd checkpoint
    # between dedup passes.  (bench.py clears the cache after this key.)
    uniq = (
        ranked.filter(F.col("rn") == 1).select("doc_id", "text").persist()
    )

    # Stage 3 — near-dup removal via banded MinHash-LSH + exact-Jaccard
    # verify; drop the greater member of each pair.  ``drop`` is probed
    # by both status joins — persist the (tiny) id set too.
    pairs = minhash_near_pairs(uniq)
    drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct().persist()
    near_dup = uniq.join(drop, "doc_id", "left_semi").select(
        "doc_id", F.lit("near_dup").alias("status")
    )
    kept = uniq.join(drop, "doc_id", "left_anti").select(
        "doc_id", F.lit("kept").alias("status")
    )

    return kept.unionByName(near_dup).unionByName(exact_dup).unionByName(low_quality)


@query(
    "pack_concat_chunks",
    oracle="""
    WITH t AS (
        SELECT doc_id, source,
               len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
                   AS n_tok
        FROM documents
    ),
    c AS (
        SELECT doc_id, source, n_tok,
               SUM(n_tok) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tok AS start_off
        FROM t
    )
    SELECT source,
           CAST(FLOOR(start_off / 512.0) AS BIGINT) AS chunk_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS chunk_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM c
    GROUP BY source, chunk_id
    """,
)
def pack_concat_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, pretraining style: concatenate each source's
    documents in doc_id order into one token stream and cut it into
    fixed 512-token context chunks; a document belongs to the chunk its
    FIRST token lands in.  Output is the packing manifest per (source,
    chunk): how many docs start there, their token mass, and the doc-id
    span — what a dataloader needs to seek into the stream.

    Scale design: the running offset is a window cumsum partitioned by
    source — at 100 TB the stratum is (source, date-shard) so no single
    partition holds a whole source; the chunk assignment itself is
    embarrassingly parallel arithmetic on the offset, and the manifest
    agg is map-side-combinable.  No join, one shuffle for the window,
    one for the agg."""
    d = load(spark, sf_dir, "documents")
    from engine.text import _tokens

    t = d.select("doc_id", "source", F.size(_tokens(F.col("text"))).alias("n_tok"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("start_off", F.sum("n_tok").over(w) - F.col("n_tok"))
    return (
        c.withColumn(
            "chunk_id", F.floor(F.col("start_off") / F.lit(512.0)).cast("long")
        )
        .groupBy("source", "chunk_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("chunk_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@query(
    "split_train_holdout",
    oracle="""
    WITH assigned AS (
        SELECT lang,
               CASE WHEN substr(md5(text), 1, 1)
                         IN ('0','1','2','3','4','5','6','7','8','9','a','b')
                    THEN 'train'
                    WHEN substr(md5(text), 1, 1) IN ('c','d') THEN 'val'
                    ELSE 'test' END AS split,
               len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
                   AS n_tok
        FROM documents
    )
    SELECT split, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
           CAST(FLOOR(10000.0 * COUNT(*)
                      / SUM(COUNT(*)) OVER (PARTITION BY lang) + 0.5)
                AS BIGINT) AS lang_share_bp
    FROM assigned
    GROUP BY split, lang
    """,
)
def split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment — the split report every
    training pipeline needs before anything is shuffled to a trainer.

    Assignment hashes the CONTENT (first md5 hex nibble: 12/16 train,
    2/16 val, 2/16 test), not the row id — so re-ingesting the corpus
    with different ids keeps every document in the same split, and an
    exact duplicate can never straddle the train/test boundary (the
    leakage mode an id-based split invites).  Output is the per-(split,
    lang) balance report: doc/token mass plus each split's share of its
    language in basis points — the check that stratification held.

    Scale design: the hash + bucket is per-row map work fused into the
    scan; one map-side-combinable agg shuffles ~(3 splits × langs) rows;
    the share-of-language window runs over that already-aggregated tiny
    frame, never the corpus."""
    d = load(spark, sf_dir, "documents")
    nib = F.substring(F.md5(F.col("text")), 1, 1)
    split = (
        F.when(nib.isin(*"0123456789ab"), "train")
        .when(nib.isin("c", "d"), "val")
        .otherwise("test")
    )
    from engine.text import _tokens

    agg = (
        d.select(
            split.alias("split"),
            "lang",
            F.size(_tokens(F.col("text"))).alias("n_tok"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("sum_tokens"),
        )
    )
    lang_total = F.sum("n_docs").over(Window.partitionBy("lang"))
    return agg.select(
        "split",
        "lang",
        "n_docs",
        "sum_tokens",
        F.floor(10000.0 * F.col("n_docs") / lang_total + F.lit(0.5))
        .cast("long")
        .alias("lang_share_bp"),
    )


@query(
    "tpch_q14_promo",
    oracle=f"""
    SELECT CAST(date_trunc('month', l.l_shipdate) AS DATE) AS ship_month,
           CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN {_CENTS_SQL.format(expr="l.l_extendedprice * (1 - l.l_discount)")}
                    ELSE 0 END) AS BIGINT) AS promo_cents,
           CAST(SUM({_CENTS_SQL.format(expr="l.l_extendedprice * (1 - l.l_discount)")})
                AS BIGINT) AS total_cents,
           CAST(FLOOR(10000.0
                * SUM(CASE WHEN p.p_type = 'PROMO'
                      THEN {_CENTS_SQL.format(expr="l.l_extendedprice * (1 - l.l_discount)")}
                      ELSE 0 END)
                / SUM({_CENTS_SQL.format(expr="l.l_extendedprice * (1 - l.l_discount)")})
                + 0.5) AS BIGINT) AS promo_share_bp
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): share of revenue from
    promo-type parts per ship month — the ratio-of-aggregates pattern
    (conditional numerator and unconditional denominator in ONE pass,
    never two scans).

    Plan shape that must survive 100 TB: the date filter prunes the
    lineitem scan; the part dim broadcasts (no fact shuffle for the
    join); both sums ride a single map-side-combinable aggregate.
    Revenue in exact integer cents; the share divides two exact longs
    in IEEE double and floor-pins to basis points.  `date_trunc` yields
    TIMESTAMP in Spark but DATE in DuckDB — cast to DATE on both sides
    (dialect trap, see engine/functions.py).
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    ).alias("promo_cents")
    total = F.sum(rev).alias("total_cents")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.date_trunc("month", F.col("l_shipdate"))
            .cast("date")
            .alias("ship_month")
        )
        .agg(promo, total)
        .select(
            "ship_month",
            "promo_cents",
            "total_cents",
            F.floor(
                10000.0 * F.col("promo_cents") / F.col("total_cents") + F.lit(0.5)
            )
            .cast("long")
            .alias("promo_share_bp"),
        )
    )


@query(
    "tpch_q19_disjunct",
    oracle=f"""
    SELECT COUNT(*) AS n_items,
           CAST(SUM({_CENTS_SQL.format(expr="l.l_extendedprice * (1 - l.l_discount)")})
                AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 35)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 50)
    """,
)
def tpch_q19_disjunct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    three OR'd brand/size/quantity conjunctions across the join — the
    predicate-shape stress test: Catalyst must extract the common
    implied filters and push what it can below the join instead of
    evaluating the full DNF as a post-join residual.

    Plan shape that must survive 100 TB: the extracted per-side
    disjunctions (brand IN (...) + size range on part, quantity range
    on lineitem) prune both scans; the part dim broadcasts; the full
    three-way OR runs as the join residual over already-pruned rows.
    Single global aggregate, exact cents."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    joined = li.join(p, li.l_partkey == p.p_partkey)
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & (q >= 1)
            & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & (q >= 10)
            & (q <= 35)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & (q >= 20)
            & (q <= 50)
        )
    )
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return joined.filter(cond).agg(
        F.count("*").alias("n_items"), F.sum(rev).alias("revenue_cents")
    )


@query(
    "tpch_q6_forecast",
    oracle=f"""
    SELECT COUNT(*) AS n_items,
           CAST(SUM({_CENTS_SQL.format(expr="l_extendedprice * l_discount")}) AS BIGINT)
               AS revenue_delta_cents
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (revenue-change forecast): pure scan-filter-agg —
    the canonical predicate-pushdown benchmark.  What discount revenue
    would be recovered if mid-band discounts on small quantities were
    dropped for one shipping year.

    Plan shape that must survive 100 TB: ALL four predicates reach the
    parquet scan as PushedFilters (date range + discount band + quantity
    cap — every one is a plain column comparison, nothing hides behind
    an expression); zero joins, zero shuffles beyond the 1-row final
    aggregate of map-side partials.  Delta revenue in exact integer
    cents per item before summing (order-independent long adds)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count("*").alias("n_items"),
            F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "revenue_delta_cents"
            ),
        )
    )


@query(
    "tpch_q4_priority_exists",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def tpch_q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): orders from one half-year
    that had at least one line shipped >90 days after the order date
    (the corpus has no commit/receipt dates — late shipping is the
    adapted lateness predicate), counted per priority class.

    Plan shape that must survive 100 TB: the date filter prunes the
    orders scan BEFORE the semi join; LEFT SEMI keeps the probe side at
    most one output row per order (no multiplicity to re-distinct); the
    cross-side lateness predicate (l_shipdate > o_orderdate + 90d) rides
    the join condition, so Spark evaluates it during the hash probe, not
    as a post-join filter.  5-row aggregate of map-side partials."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q7_nation_volume",
    oracle=f"""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM({_CENTS_SQL.format(expr="l.l_extendedprice * (1 - l.l_discount)")}) AS BIGINT)
               AS revenue_cents
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey   = l.l_suppkey
    JOIN orders o   ON o.o_orderkey  = l.l_orderkey
    JOIN customer c ON c.c_custkey   = o.o_custkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
       OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two trading nations):
    revenue per (supplier nation, customer nation, ship year) restricted
    to the two directed pairs between NATION_1 and NATION_2.

    Plan shape that must survive 100 TB: both nation filters prune the
    dims BEFORE any fact join via LEFT SEMI against the broadcast
    bounded nation subset — the semi keeps the dim's FILE-BACKED size
    estimate (SizeInBytes of a semi join = the left side), so the
    pruned supplier/customer probes broadcast STATICALLY from stats
    with no hard hint on an SF-linear side (the r11 hint-audit shape:
    the first cut joined nation names INTO the dims, whose derived
    estimate blew the threshold and cost an AQE shuffle-write
    conversion — measured 1.38 s vs 0.55 s for this form at sf0.1,
    also beating the old force-hinted 0.70 s on narrower payloads).
    Nation NAMES attach after the fact join via two bounded broadcast
    lookups; the directed-pair disjunction runs as a residual there.
    The only shuffle, lineitem⋈orders on orderkey, moves two
    already-decimated sides (~8% each)."""
    pair = ("NATION_1", "NATION_2")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    sp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_nationkey")
    )
    cp = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(n),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("c_custkey", "c_nationkey")
    )
    o = (
        load(spark, sf_dir, "orders")
        .join(cp, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_nationkey")
    )
    li = load(spark, sf_dir, "lineitem").join(
        sp, F.col("l_suppkey") == F.col("s_suppkey")
    )
    sn = F.broadcast(
        n.select(
            F.col("n_nationkey").alias("s_nk"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    cn = F.broadcast(
        n.select(
            F.col("n_nationkey").alias("c_nk"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    directed = (
        (F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1])
    ) | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(sn, F.col("s_nationkey") == F.col("s_nk"))
        .join(cn, F.col("c_nationkey") == F.col("c_nk"))
        .filter(directed)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(F.sum(rev).alias("revenue_cents"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


@query(
    "tpch_q18_large_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
        FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    SELECT c.c_name, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_cents,
           big.sum_qty
    FROM big
    JOIN orders o   ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    ORDER BY totalprice_cents DESC, o.o_orderkey ASC
    LIMIT 20
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total line
    quantity exceeds 300, with their customer, priced, top 20 by value.

    Plan shape that must survive 100 TB: the HAVING aggregate runs on
    lineitem ALONE first (map-side partial sums on the natural orderkey
    clustering) and survives only a tiny fraction of orders — that
    survivor set, not raw lineitem, joins orders; at this corpus the
    survivor side broadcasts outright.  Customer broadcasts as always.
    The LIMIT compiles to TakeOrderedAndProject with the unique orderkey
    tiebreak.  sum_qty is integral-valued double (quantities are whole
    numbers ≤ 50, exact in IEEE) so the BIGINT cast is lossless on both
    engines."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty_d"))
        .filter(F.col("qty_d") > 300)
        .select("l_orderkey", F.col("qty_d").cast("long").alias("sum_qty"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("totalprice_cents"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice_cents"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "pack_bin_firstfit",
    # Full oracle since r12 (was rows-only "FFD is imperative"): the
    # imperative loop IS SQL-expressible — a recursive CTE carries the
    # per-source bin-fill LIST as state (homogeneous BIGINT[], the r10
    # list_reduce struct trap doesn't apply), list_position finds the
    # first fitting bin (DuckDB returns 0, not NULL, for no-match), a
    # two-arg list_transform updates it, and bin_fill reads the FINAL
    # fills row (rk = max per source) exactly like the Spark kernel's
    # post-loop lookup.  Recursion depth = docs per source (~25 at
    # sf0.01).  All-integer state → bit-exact replay.
    oracle="""
    WITH RECURSIVE toks AS (
        SELECT doc_id, source,
               CAST(len(list_filter(string_split(lower(text), ' '),
                                    t -> t <> '')) AS BIGINT) AS n_tok
        FROM documents
    ),
    t AS (
        SELECT doc_id, source, n_tok,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_tok DESC, doc_id ASC) AS rk
        FROM toks
    ),
    rec AS (
        SELECT source, CAST(0 AS BIGINT) AS rk, CAST(NULL AS BIGINT) AS doc_id,
               CAST(NULL AS BIGINT) AS n_tok, CAST(NULL AS BIGINT) AS bin_id,
               CAST([] AS BIGINT[]) AS fills
        FROM (SELECT DISTINCT source FROM t)
      UNION ALL
        SELECT r.source, t.rk, t.doc_id, t.n_tok,
               CASE WHEN fit.b = 0 THEN len(r.fills)
                    ELSE fit.b - 1 END AS bin_id,
               CASE WHEN fit.b = 0 THEN list_append(r.fills, t.n_tok)
                    ELSE list_transform(r.fills,
                            (f, i) -> CASE WHEN i = fit.b THEN f + t.n_tok
                                           ELSE f END)
               END AS fills
        FROM rec r
        JOIN t ON t.source = r.source AND t.rk = r.rk + 1,
        LATERAL (SELECT list_position(
                     list_transform(r.fills, f -> f + t.n_tok <= 512),
                     true) AS b) fit
    ),
    final AS (
        SELECT source, fills,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY rk DESC) AS z
        FROM rec
    )
    SELECT r.source, r.doc_id, CAST(r.n_tok AS INTEGER) AS n_tok, r.bin_id,
           f.fills[CAST(r.bin_id AS INTEGER) + 1] AS bin_fill
    FROM rec r JOIN final f ON f.source = r.source AND f.z = 1
    WHERE r.rk > 0
    """,
)
def pack_bin_firstfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing sequence packing — the tighter sibling of
    pack_concat_chunks: instead of cutting one concatenated stream,
    place each document (longest first) into the first 512-token bin
    with room, opening a new bin when none fits.  This is the packing
    a finetuning dataloader uses to minimize padding waste; FFD
    guarantees ≤ 11/9·OPT + 1 bins (Johnson 1973, public result).

    Genuinely imperative semantics (each placement depends on all prior
    placements) → Arrow-batched applyInPandas per source group, the
    designed escape hatch for custom stateful operators.  Since r12 the
    key carries a FULL oracle: the placement loop replays in DuckDB as
    a recursive CTE with the bin-fill list as integer state (see the
    oracle comment), so the driver hash-proves the imperative kernel;
    tests/test_unit_semantics.py additionally asserts capacity,
    determinism, density vs the cumsum-chunk baseline, and exact token
    conservation.

    Scale design (100 TB): packing state is PER GROUP (source shard) —
    groups distribute across executors, state never crosses a group, so
    the operator scales with the number of shards exactly like the
    groupBy it rides on.  At real scale the group key is
    (source, date-shard) to bound group size; docs above capacity get
    singleton bins rather than being dropped (no silent data loss).
    Output: one row per doc with its bin assignment + bin fill stats.
    """
    import pandas as pd

    from engine.text import _tokens

    cap = 512
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "source", F.size(_tokens(F.col("text"))).alias("n_tok")
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tok", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        fills: list[int] = []  # fill level per open bin
        bin_of = []
        for tok in pdf["n_tok"]:
            for b, fill in enumerate(fills):
                if fill + tok <= cap:
                    fills[b] = fill + tok
                    bin_of.append(b)
                    break
            else:
                bin_of.append(len(fills))
                fills.append(tok)
        pdf["bin_id"] = pd.array(bin_of, dtype="int64")
        pdf["bin_fill"] = pd.array(
            [fills[b] for b in bin_of], dtype="int64"
        )
        return pdf

    out = t.groupBy("source").applyInPandas(
        pack,
        schema="doc_id long, source string, n_tok int, bin_id long, bin_fill long",
    )
    return out.select(
        "source", "doc_id", "n_tok", "bin_id", "bin_fill"
    )


_SEM_COPY_OFFSET = 10_000
_SEM_TABLES = 2
_SEM_BITS = 8
_SEM_VERIFY = 0.999


@query("pipeline_embedding_dedup", oracle=None)  # rows-only: LSH + iterative CC
def pipeline_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC dedup end-to-end over the embedding table — the
    vector-side twin of pipeline_corpus_clean (SemDeDup-style):

        plant near-identical copies → LSH bucket candidates →
        exact-cosine verify → connected components → keep-min rep

    Copies perturb ONE component by 2% (cosine ≈ 0.9998 to the
    original), so the ≥ 0.999 verify gate separates planted semantic
    duplicates from the corpus' organic structure (max organic cosine
    ≈ 0.4).  Candidates come from 2 tables × 8 random-hyperplane sign
    bits (per-bit agreement ≈ 0.994 at this cosine → ≈ 0.998 recall);
    verification and clustering run only on bucket-collided pairs —
    never all-pairs, the same discipline as every dedup key here.

    Scale design: signatures are one Arrow matmul per batch; the bucket
    self-join is bucket-local; CC reuses the star-contraction kernel
    (engine.dedup._cc_propagate) on the verified edge list.  Output
    labels EVERY vector with its cluster and whether it is the kept
    representative — the audit trail, like the text pipeline."""
    import hashlib

    import numpy as np
    import pandas as pd

    from engine.dedup import _cc_propagate
    from engine.similarity import _dot, _norm

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    perturbed = F.transform(
        F.col("embedding"),
        lambda x, d: F.when(
            d == (F.col("vec_id") % 64).cast("int"), x * F.lit(1.02)
        )
        .otherwise(x)
        .cast("float"),
    )
    corpus = e.unionByName(
        e.select(
            (F.col("vec_id") + _SEM_COPY_OFFSET).alias("vec_id"),
            perturbed.alias("embedding"),
        )
    )

    W = np.array(
        [
            [
                1.0
                if hashlib.md5(f"sem:{t}:{p}:{d}".encode()).digest()[0] % 2 == 0
                else -1.0
                for d in range(64)
            ]
            for t in range(_SEM_TABLES)
            for p in range(_SEM_BITS)
        ]
    )

    @F.pandas_udf("array<int>")
    def _sigs(emb):
        m = np.stack(emb.to_numpy()).astype(np.float64)
        bits = (m @ W.T >= 0).astype(np.int64)
        sigs = (
            bits.reshape(len(m), _SEM_TABLES, _SEM_BITS)
            * (1 << np.arange(_SEM_BITS))
        ).sum(axis=2)
        return pd.Series(list(sigs.astype(np.int32)))

    # Exact-cosine verify as ONE Arrow kernel over the deduped candidate
    # pairs: the interpreted-HOF form (_dot/_norm lambdas, ~192 evals
    # per pair × ~30k bucket pairs ≈ 5.8M evals) measured 5.4 s for the
    # whole key; the numpy row-wise cosine does the same flops in one
    # vectorized batch (winnowing kernel rule: large eval volume →
    # mapInPandas/pandas_udf + numpy).  Arrays ride the candidate
    # distinct unchanged (30 MB at sf0.1 — the pair set is bucket-local
    # by construction).
    @F.pandas_udf("double")
    def _pair_cos(ea, eb):
        A = np.stack(ea.to_numpy()).astype(np.float64)
        B = np.stack(eb.to_numpy()).astype(np.float64)
        num = (A * B).sum(axis=1)
        den = np.sqrt((A * A).sum(axis=1)) * np.sqrt((B * B).sum(axis=1))
        return pd.Series(num / den)

    entries = corpus.select(
        "vec_id", "embedding", F.posexplode(_sigs("embedding")).alias("t", "b")
    )
    a = entries.select(
        F.col("vec_id").alias("va"), F.col("embedding").alias("ea"), "t", "b"
    )
    bb = entries.select(
        F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"), "t", "b"
    )
    # Pair-dedup AFTER the cosine gate: the 2-table bucket join repeats
    # only ~3% of pairs (measured 78k → 75.9k), so pre-verify distinct
    # buys almost nothing while shuffling two 64-float arrays per row;
    # verifying first costs ≤2 duplicate cosines per pair and the
    # distinct then exchanges ~|true pairs| skinny rows (simhash_pairs
    # discipline).
    verified = (
        a.join(bb, ["t", "b"])
        .filter(F.col("va") < F.col("vb"))
        .filter(_pair_cos("ea", "eb") >= _SEM_VERIFY)
        .select(F.col("va").alias("src"), F.col("vb").alias("dst"))
        .distinct()
        .persist()
    )
    both = verified.unionByName(
        verified.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = corpus.select("vec_id").select(
        F.col("vec_id").alias("doc_id"), F.col("vec_id").alias("label")
    )
    from engine.core import scoped_shuffle_partitions

    # probe_from=0: the ≥0.999 gate admits only planted pairs (max
    # organic cosine ≈ 0.5) — star components converge in round 1.
    with scoped_shuffle_partitions(spark, 8):
        labels = _cc_propagate(both, labels, probe_from=0)
    size = F.count("*").over(Window.partitionBy("label"))
    return labels.select(
        F.col("doc_id").alias("vec_id"),
        F.col("label").alias("component_id"),
        size.alias("comp_size"),
        F.when(F.col("doc_id") == F.col("label"), 1)
        .otherwise(0)
        .cast("int")
        .alias("kept"),
    )


_EMBP_Q = 1 << 20  # quantization scale (power of two: exact double mult)
_EMBP_TBL, _EMBP_BITS, _EMBP_VER = 2, 8, 32
_EMBP_PLANES = _EMBP_TBL * _EMBP_BITS + _EMBP_VER  # 48
_EMBP_HAM = 2  # max verify-signature hamming distance for an edge
_EMBP_M31 = 2_147_483_647


@query(
    "pipeline_embedding_dedup_polyhash",
    # The oracle replays EVERY stage: corpus planting, integer
    # quantization, the quadratic-hash sign planes, bucket join,
    # hamming verify, and connected components (recursive closure +
    # MIN(node), the dedup_connected_components precedent).
    oracle=f"""
    WITH RECURSIVE corpus AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 10000,
               list_transform(embedding,
                   (x, i) -> CASE WHEN i - 1 = vec_id % 64
                              THEN CAST(CAST(x AS DOUBLE) * 1.02 AS FLOAT)
                              ELSE x END)
        FROM embeddings
        UNION ALL
        SELECT vec_id + 20000,
               list_transform(embedding,
                   (x, i) -> CASE WHEN i - 1 = (vec_id + 7) % 64
                              THEN CAST(CAST(x AS DOUBLE) * 1.02 AS FLOAT)
                              ELSE x END)
        FROM embeddings WHERE vec_id % 5 = 0
    ),
    q AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * {_EMBP_Q}) AS BIGINT))
                   AS qv
        FROM corpus
    ),
    proj AS (
        SELECT q.vec_id, pl.p AS plane,
               SUM((1 - 2 * (((((pl.p * 64 + dd.d) * 2654435761 + 97003999)
                               % {_EMBP_M31})
                              * (((pl.p * 64 + dd.d) * 2654435761 + 97003999)
                                 % {_EMBP_M31}))
                             % {_EMBP_M31} % 2))
                   * qv[CAST(dd.d AS INTEGER) + 1]) AS y
        FROM q, UNNEST(range({_EMBP_PLANES})) pl(p), UNNEST(range(64)) dd(d)
        GROUP BY 1, 2
    ),
    sigs AS (
        SELECT vec_id,
               SUM(CASE WHEN plane < {_EMBP_BITS} AND y >= 0
                        THEN CAST(1 AS BIGINT) << CAST(plane AS INTEGER)
                        ELSE 0 END) AS sig0,
               SUM(CASE WHEN plane >= {_EMBP_BITS}
                         AND plane < {2 * _EMBP_BITS} AND y >= 0
                        THEN CAST(1 AS BIGINT)
                             << CAST(plane - {_EMBP_BITS} AS INTEGER)
                        ELSE 0 END) AS sig1,
               SUM(CASE WHEN plane >= {2 * _EMBP_BITS} AND y >= 0
                        THEN CAST(1 AS BIGINT)
                             << CAST(plane - {2 * _EMBP_BITS} AS INTEGER)
                        ELSE 0 END) AS vsig
        FROM proj GROUP BY vec_id
    ),
    entries AS (
        SELECT vec_id, 0 AS t, sig0 AS b, vsig FROM sigs
        UNION ALL
        SELECT vec_id, 1 AS t, sig1 AS b, vsig FROM sigs
    ),
    edges AS (
        SELECT DISTINCT a.vec_id AS src, e.vec_id AS dst
        FROM entries a JOIN entries e
          ON a.t = e.t AND a.b = e.b AND a.vec_id < e.vec_id
        WHERE bit_count(xor(a.vsig, e.vsig)) <= {_EMBP_HAM}
    ),
    und AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
    reach AS (
        SELECT vec_id, vec_id AS node FROM corpus
      UNION
        SELECT r.vec_id, u.dst AS node FROM reach r JOIN und u ON u.src = r.node
    ),
    lab AS (SELECT vec_id, MIN(node) AS component_id FROM reach GROUP BY vec_id)
    SELECT vec_id,
           CAST(component_id AS BIGINT) AS component_id,
           CAST(COUNT(*) OVER (PARTITION BY component_id) AS BIGINT)
               AS comp_size,
           CAST(CASE WHEN vec_id = component_id THEN 1 ELSE 0 END AS INTEGER)
               AS kept
    FROM lab
    """,
)
def pipeline_embedding_dedup_polyhash(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HASH-VERIFIED twin of ``pipeline_embedding_dedup`` — the SemDeDup
    pipeline (plant → hyperplane-LSH buckets → verify → connected
    components → keep-min representative) rebuilt on CROSS-ENGINE-EXACT
    integer arithmetic, so the DuckDB oracle replays every stage and
    the driver hash-proves the end-to-end verdicts (the embedding-side
    analogue of r11's pipeline_corpus_clean_polyhash):

    - embeddings quantize to q_d = FLOOR(float64(x) * 2^20) — the scale
      is a power of two, so the multiply is exact and both engines see
      identical BIGINTs;
    - hyperplane weights are a FORMULA, not a trained artifact:
      s(j) = 1 - 2*(h(j)² mod P mod 2) with h(j) = (j*2654435761 +
      97003999) mod P, P = 2³¹−1, j = plane*64 + dim.  The square is
      the load-bearing nonlinearity: the r11 JL key's LINEAR parity
      makes consecutive planes' sign rows equal-or-flipped copies of
      each other (parity(x+c) = parity(x) XOR parity(c) between
      wraparounds), which collapsed the family to ~2 effective planes
      (measured: 4254 organic hamming-0 pairs at 32 bits); squaring
      h mod P breaks the linear structure (0 organic pairs under
      hamming 4 on this corpus, sign balance 0.507);
    - projections y = Σ s·q are exact int64 SUMS — order-independent,
      so the Spark side runs them as ONE Arrow numpy matmul per batch
      (never an interpreted per-element HOF fold) while DuckDB uses
      UNNEST+SUM, and the results are equal by arithmetic, not by
      matching fold order;
    - candidates: 2 tables × 8 sign-bit buckets; verify: hamming ≤ 2
      over a 32-bit wide signature via xor + bit_count on the packed
      long (filter-before-distinct: the gate runs on the bucket join
      output so the distinct's exchange carries true pairs only);
    - clusters: star-contraction CC (engine.dedup._cc_propagate) vs
      the oracle's recursive reachability closure.

    Margins measured at sf0.01 (fixed hash family — pinned as floors in
    tests, never all-N, per the KR-LSH recall discipline): planted
    copies (1 dim × 1.02, cosine ≈ 0.9998) land at hamming ≤ 1 and all
    700 planted edges survive; nearest organic candidate sits at
    hamming 4.  Second-generation copies (vec_id % 5 = 0, a different
    perturbed dim) make components transitive 3-chains, so the CC
    stage is load-bearing, not pair echo.

    Scale design: signatures are one Arrow matmul per batch (zero
    Python in the per-pair path); the bucket self-join is bucket-local;
    the hamming gate is two JVM intrinsics on longs; CC is O(log d)
    star contraction.  No broadcast hints anywhere — candidate volume
    is corpus-proportional (r12 audit)."""
    import numpy as np
    import pandas as pd

    from engine.core import scoped_shuffle_partitions
    from engine.dedup import _cc_propagate

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def _perturbed(shift: int):
        return F.transform(
            F.col("embedding"),
            lambda x, d: F.when(
                d == ((F.col("vec_id") + shift) % 64).cast("int"),
                (x.cast("double") * F.lit(1.02)).cast("float"),
            ).otherwise(x),
        )

    corpus = (
        e.unionByName(
            e.select(
                (F.col("vec_id") + 10000).alias("vec_id"),
                _perturbed(0).alias("embedding"),
            )
        ).unionByName(
            e.filter(F.col("vec_id") % 5 == 0).select(
                (F.col("vec_id") + 20000).alias("vec_id"),
                _perturbed(7).alias("embedding"),
            )
        )
    )

    # ±1 plane matrix from the quadratic-hash formula — regenerated in
    # the UDF closure from plane/dim indices (nothing broadcast, no
    # model artifact; the formula IS the matrix, as in the JL key).
    j = np.arange(_EMBP_PLANES * 64, dtype=np.int64).reshape(_EMBP_PLANES, 64)
    h = (j * 2654435761 + 97003999) % _EMBP_M31
    S = 1 - 2 * ((h * h) % _EMBP_M31 % 2)  # (48, 64) exact int64

    @F.pandas_udf("array<long>")
    def _embp_sigs(emb):
        m = np.stack(emb.to_numpy()).astype(np.float64)  # float32 widens exactly
        q = np.floor(m * _EMBP_Q).astype(np.int64)
        bits = (q @ S.T >= 0).astype(np.int64)  # (batch, 48) exact
        sig0 = (bits[:, :_EMBP_BITS] * (1 << np.arange(_EMBP_BITS))).sum(axis=1)
        sig1 = (
            bits[:, _EMBP_BITS : 2 * _EMBP_BITS] * (1 << np.arange(_EMBP_BITS))
        ).sum(axis=1)
        vsig = (
            bits[:, 2 * _EMBP_BITS :] * (1 << np.arange(_EMBP_VER, dtype=np.int64))
        ).sum(axis=1)
        return pd.Series(np.stack([sig0, sig1, vsig], axis=1).tolist())

    # Project the UDF result ONCE before fanning out (HOF/UDF re-eval
    # trap): posexplode + element_at below read a plain column.
    sigged = corpus.select("vec_id", _embp_sigs("embedding").alias("sigs")).persist()
    # EAGER (r13, the kr_simhash_pairs_from_sums discipline): the lazy
    # persist raced — both candidate self-join sides + both CC union
    # arms start together and each recomputes the uncached subtree
    # ("Block already exists" warnings confirmed 2-4 duplicate Arrow
    # signature passes).  Measured cold-run minima EQUAL at sf0.1
    # (10.2 s eager vs 10.1 s lazy — the kernel is cheap at 13k×64),
    # but at 100× the signature matmul dominates and the race is a
    # 2-4× tax, so the eager pass is the scale-correct default.
    sigged.count()
    entries = sigged.select(
        "vec_id",
        F.element_at("sigs", 3).alias("vsig"),
        F.posexplode(F.slice("sigs", 1, 2)).alias("t", "b"),
    )
    a = entries.select(
        F.col("vec_id").alias("va"), F.col("vsig").alias("vsa"), "t", "b"
    )
    bb = entries.select(
        F.col("vec_id").alias("vb"), F.col("vsig").alias("vsb"), "t", "b"
    )
    verified = (
        a.join(bb, ["t", "b"])
        .filter(F.col("va") < F.col("vb"))
        .filter(
            F.bit_count(F.col("vsa").bitwiseXOR(F.col("vsb"))) <= _EMBP_HAM
        )
        .select(F.col("va").alias("src"), F.col("vb").alias("dst"))
        .distinct()
        .persist()  # diamond: feeds both edge directions of CC
    )
    verified.count()  # EAGER (probe): kill the self-join persist race
    both = verified.unionByName(
        verified.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = corpus.select(
        F.col("vec_id").alias("doc_id"), F.col("vec_id").alias("label")
    )
    # probe_from=0: components here are stars/3-chains around an
    # original (diameter ≤ 2) — the fixpoint lands in round 1, so probe
    # every round instead of burning the text graph's 2 warmup rounds.
    with scoped_shuffle_partitions(spark, 8):
        labels = _cc_propagate(both, labels, probe_from=0)
    size = F.count("*").over(Window.partitionBy("label"))
    return labels.select(
        F.col("doc_id").alias("vec_id"),
        F.col("label").alias("component_id"),
        size.alias("comp_size"),
        F.when(F.col("doc_id") == F.col("label"), 1)
        .otherwise(0)
        .cast("int")
        .alias("kept"),
    )


@query(
    "pack_length_buckets",
    oracle="""
    WITH bucketed AS (
        SELECT doc_id, n_chars,
               ((n_chars - 1) // 128 + 1) * 128 AS bucket
        FROM documents
    ),
    batched AS (
        SELECT bucket, n_chars,
               (ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) - 1)
                   // 8 AS batch_id
        FROM bucketed
    ),
    per_batch AS (
        SELECT bucket, batch_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MAX(n_chars) AS BIGINT) AS max_len,
               CAST(SUM(n_chars) AS BIGINT) AS payload
        FROM batched GROUP BY bucket, batch_id
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_batches,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(n_docs * max_len - payload) AS BIGINT) AS pad_waste,
           CAST(SUM(n_docs * max_len - payload) * 1000000
                // SUM(n_docs * max_len) AS BIGINT) AS waste_e6
    FROM per_batch
    GROUP BY bucket
    """,
)
def pack_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LENGTH-BUCKETED BATCHING with pad-waste accounting — the dynamic
    batching step of a training pipeline: group documents into
    width-128 length buckets, fill fixed-size batches (8 docs) in
    deterministic doc_id order within each bucket, and measure the
    padding wasted when every batch pads to its longest member.  The
    waste share is WHY length bucketing exists (random batching pads
    every batch to the global tail); this key quantifies it per bucket.

    Third member of the packing family: ``pack_concat_chunks``
    (concatenate-and-split, zero waste, breaks doc boundaries) and
    ``pack_bin_firstfit`` (variable docs per token budget) trade
    differently — length bucketing keeps one-doc-one-row AND bounds
    waste by the bucket width.

    Exactness: bucket bounds are pure integer arithmetic (width-128
    ceil — POWER/LOG2 bucketing would put exact powers of two on a
    float boundary that engines may round apart); the waste share is
    integer-scaled division (`div` / `//`).

    Scale: one shuffle on the bucket key; within-bucket row_number is
    the same plan class as every ranked window (bucket count bounds
    parallelism — at 100 TB the partition key becomes (bucket,
    doc_id-range block) so no bucket serializes)."""
    d = load(spark, sf_dir, "documents")
    # Integer `div` end-to-end (not double `/` + cast-truncation): the
    # oracle's `//` floors while cast('long') truncates toward zero —
    # equivalent only for non-negative operands.  n_chars >= 1 in this
    # corpus, but keeping both engines structurally identical removes
    # the latent divergence class entirely (r5 ADVICE item).
    bucket = F.expr("(n_chars - 1) div 128") * 128 + 128
    w = Window.partitionBy("bucket").orderBy("doc_id")
    batched = (
        d.select("doc_id", "n_chars", bucket.alias("bucket"))
        .withColumn("rn0", F.row_number().over(w) - 1)
        .withColumn("batch_id", F.expr("rn0 div 8"))
        .drop("rn0")
    )
    per_batch = batched.groupBy("bucket", "batch_id").agg(
        F.count("*").alias("n_docs"),
        F.max("n_chars").alias("max_len"),
        F.sum("n_chars").alias("payload"),
    )
    waste = F.col("n_docs") * F.col("max_len") - F.col("payload")
    return per_batch.groupBy("bucket").agg(
        F.count("*").alias("n_batches"),
        F.sum("n_docs").alias("n_docs"),
        F.sum(waste).alias("pad_waste"),
        F.expr(
            "sum(n_docs * max_len - payload) * 1000000"
            " div sum(n_docs * max_len)"
        )
        .cast("long")
        .alias("waste_e6"),
    )


@query(
    "join_drill_across_facts",
    oracle="""
    WITH rev AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_cents,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        GROUP BY 1
    ),
    act AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events
        GROUP BY 1
    )
    SELECT COALESCE(r.day, a.day) AS day,
           COALESCE(r.revenue_cents, 0) AS revenue_cents,
           COALESCE(r.n_orders, 0) AS n_orders,
           COALESCE(a.n_events, 0) AS n_events,
           COALESCE(a.n_users, 0) AS n_users
    FROM rev r FULL OUTER JOIN act a ON r.day = a.day
    """,
)
def join_drill_across_facts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DRILL-ACROSS — the conformed-dimension pattern: two fact tables
    at DIFFERENT grains (orders revenue, event activity) each aggregate
    to the shared calendar dimension FIRST, then full-outer join on the
    conformed day key with zero-filled gaps.  Joining the raw fact
    tables directly would fan out rows (every order × every same-day
    event) and double-count both measures — aggregate-then-join is the
    correctness rule this key pins, and the full-outer keeps days where
    only one process ran.

    Scale: each branch is a map-side-combinable rollup to |days| rows;
    the outer join runs on two TINY conformed aggregates regardless of
    fact-table scale — the whole point of drilling across at the
    conformed grain instead of joining facts."""
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    rev = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("revenue_cents"),
        F.count("*").alias("n_orders"),
    )
    ev = load(spark, sf_dir, "events")
    act = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    r, a = rev.alias("r"), act.alias("a")
    return r.join(a, F.col("r.day") == F.col("a.day"), "full").select(
        F.coalesce(F.col("r.day"), F.col("a.day")).alias("day"),
        F.coalesce("revenue_cents", F.lit(0)).alias("revenue_cents"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("n_users", F.lit(0)).alias("n_users"),
    )


@query(
    "tpch_q13_custdist",
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
)
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): the classic
    LEFT-OUTER-WITH-FILTERED-JOIN-CONDITION pin.  The priority filter
    lives INSIDE the outer join's ON clause — pushing it to a WHERE
    would silently delete the zero-order customers the query exists to
    count (the c_count = 0 histogram bucket).  COUNT(o_orderkey), not
    COUNT(*), is the second trap: the unmatched row must count as 0,
    not 1.  Double aggregation: per-customer count → histogram of
    counts.

    Scale: join shuffles on custkey (orders side pre-filtered
    map-side); the second aggregate is over |customers| rows collapsing
    to ~tens of distinct counts — map-side combinable to nothing."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                             AS BIGINT)) AS BIGINT) AS total_revenue_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue_cents
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE total_revenue_cents = (SELECT MAX(total_revenue_cents) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier by quarterly revenue): argmax over
    a DERIVED aggregate via scalar-subquery equality — revenue is
    grouped once, its MAX becomes a single-row broadcast joined back as
    the filter (the engine's scalar-broadcast idiom; a window MAX over
    the unpartitioned aggregate would work too but adds an exchange).
    Ties surface as multiple rows on both engines because revenue is
    EXACT integer cents — per-row floor-pinned, then integer-summed, so
    equality-with-max never hinges on float summation order.

    Scale: the revenue aggregate shuffles on l_suppkey with map-side
    combine; everything after operates on |suppliers| rows (broadcast
    joins only — supplier dim and the 1-row max)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev_c = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    revenue = li.groupBy("l_suppkey").agg(
        F.sum(rev_c).alias("total_revenue_cents")
    )
    mx = revenue.agg(F.max("total_revenue_cents").alias("mx"))
    top = revenue.join(
        F.broadcast(mx), revenue.total_revenue_cents == mx.mx
    ).drop("mx")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return top.join(
        s, top.l_suppkey == s.s_suppkey
    ).select("s_suppkey", "s_name", "total_revenue_cents")


@query(
    "tpch_q17_small_qty",
    oracle="""
    WITH p AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'),
         li AS (
             SELECT l_partkey,
                    CAST(FLOOR(l_quantity) AS BIGINT) AS q,
                    CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c
             FROM lineitem JOIN p ON l_partkey = p_partkey
         ),
         agg AS (
             SELECT l_partkey,
                    CAST(COUNT(*) AS BIGINT) AS cnt,
                    CAST(SUM(q) AS BIGINT)   AS sum_q
             FROM li GROUP BY l_partkey
         )
    SELECT CAST(CAST(SUM(li.price_c) AS BIGINT) // 7 AS BIGINT) AS avg_yearly_cents,
           CAST(COUNT(*) AS BIGINT)                             AS n_small
    FROM li JOIN agg ON li.l_partkey = agg.l_partkey
    WHERE 5 * li.q * agg.cnt < agg.sum_q
    """,
)
def tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity revenue): rows whose quantity is
    below 20% of their part's average quantity.  The correlated
    AVG-per-part subquery is expressed Spark-first as a PARTITIONED
    WINDOW over the brand-pruned rows — one scan, one shuffle on
    l_partkey — instead of the naive re-scan + self-join on a derived
    aggregate.

    Exactness: ``l_quantity < 0.2 * AVG(l_quantity)`` is algebraically
    rewritten to ``5*q*cnt < sum_q`` in BIGINT (quantities are
    integer-valued; both sides positive) — the float form divides two
    engines' differently-ordered double sums and can flip a boundary
    row, the integer form cannot.  Revenue is floor-pinned cents,
    integer-divided by 7 (`div`/`//` — BIGINT `/` is float division in
    DuckDB).

    Scale: the broadcast brand filter prunes lineitem before the
    window shuffle; per-part groups are bounded (order lines per part),
    so no skew; output is one row."""
    p = load(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    ).select("p_partkey")
    li = (
        load(spark, sf_dir, "lineitem")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            F.floor("l_quantity").cast("long").alias("q"),
            _cents(F.col("l_extendedprice")).alias("price_c"),
        )
    )
    w = Window.partitionBy("l_partkey")
    li2 = li.select(
        "l_partkey",
        "q",
        "price_c",
        F.count("*").over(w).alias("cnt"),
        F.sum("q").over(w).alias("sum_q"),
    )
    small = li2.filter(
        F.lit(5) * F.col("q") * F.col("cnt") < F.col("sum_q")
    )
    return small.agg(
        F.expr("sum(price_c) div 7").cast("long").alias("avg_yearly_cents"),
        F.count("*").alias("n_small"),
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
    WITH vol AS (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               {_CENTS_SQL.format(expr="l.l_extendedprice * (1 - l.l_discount)")} AS vol_c,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_type = 'STANDARD'
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n1.n_regionkey AND r.r_name = 'ASIA'
        WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN vol_c ELSE 0 END) AS BIGINT)
               AS nation_cents,
           CAST(SUM(vol_c) AS BIGINT) AS total_cents,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN vol_c ELSE 0 END) * 10000
                // SUM(vol_c) AS BIGINT) AS share_bp
    FROM vol GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): NATION_7's share of
    STANDARD-part revenue sold to ASIA customers, by order year.  The
    classic seven-table star: lineitem is the only fact; part,
    supplier+nation (supplier side) and customer+nation+region
    (customer side) are all dims.

    Exactness: the spec's ``sum(case)/sum(volume)`` double division is
    the cross-engine hazard (two differently-ordered float sums, then a
    divide), so the share ships as integer BASIS POINTS —
    ``nation_cents * 10000 div total_cents`` over per-row floor-pinned
    cents — alongside both exact operands.

    Scale: every dim side broadcasts (part is pruned to one type;
    lineitem probes the RAW supplier scan — file-backed stats, static
    broadcast, no hint — and the supplier NATION NAME attaches via the
    bounded n2 lookup after; customer is LEFT SEMI-pruned to the ASIA
    nation keys, which keeps its file-backed estimate — r11 hint-audit
    shape); the only shuffles are lineitem⋈orders on orderkey and the
    final tiny groupBy(year).  Dim filters reach the scans (type/
    region pruned before the fact join, not after)."""
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("supp_nation"),
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = load(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    ).select("p_partkey")
    r = load(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    ).select("r_regionkey")
    n1 = (
        load(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("n1_key"))
    )
    c = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(n1),
            F.col("c_nationkey") == F.col("n1_key"),
            "left_semi",
        )
        .select("c_custkey")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", F.year("o_orderdate").cast("long").alias("o_year"))
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            "l_orderkey",
            "supp_nation",
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("vol_c"),
        )
    )
    vol = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_year", "vol_c", "supp_nation"
    )
    nat_c = F.sum(
        F.when(F.col("supp_nation") == "NATION_7", F.col("vol_c")).otherwise(F.lit(0))
    )
    return vol.groupBy("o_year").agg(
        nat_c.alias("nation_cents"),
        F.sum("vol_c").alias("total_cents"),
        F.expr(
            "sum(CASE WHEN supp_nation = 'NATION_7' THEN vol_c ELSE 0 END)"
            " * 10000 div sum(vol_c)"
        ).cast("long").alias("share_bp"),
    )


@query(
    "tpch_q12_latency_buckets",
    oracle="""
    SELECT CASE WHEN d < 0 THEN 'early'
                WHEN d <= 30 THEN '00-30'
                WHEN d <= 90 THEN '31-90'
                ELSE '90+' END AS bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (SELECT date_diff('day', o_orderdate, l_shipdate) AS d, o_orderpriority
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate <  TIMESTAMP '1998-01-01')
    GROUP BY bucket
    """,
)
def tpch_q12_latency_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode priority counts, adapted: the corpus
    has no l_shipmode/l_commitdate, so the grouping dimension is the
    DERIVED ship-latency bucket datediff(l_shipdate, o_orderdate)).
    Keeps Q12's defining device: conditional CASE counting of
    high/low-priority lines inside one aggregate pass — two metrics,
    one scan, no self-join.

    Dialect pin: Spark ``datediff(end, start)`` ≡ DuckDB
    ``date_diff('day', start, end)`` — REVERSED argument order (the
    fn_date_parts trap); the synthetic corpus ships lines before the
    order date, so the 'early' bucket is load-bearing, not decorative.

    Scale: one orderkey shuffle for the fact-fact join (priority is the
    only orders column carried), then a 4-group aggregate that
    collapses map-side."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.datediff("l_shipdate", "o_orderdate").alias("d"),
        "o_orderpriority",
    )
    bucket = (
        F.when(F.col("d") < 0, "early")
        .when(F.col("d") <= 30, "00-30")
        .when(F.col("d") <= 90, "31-90")
        .otherwise("90+")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy(bucket.alias("bucket")).agg(
        F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
    )


@query(
    "tpch_q21_latest_shipper",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN nation n   ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_3'
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o   ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def tpch_q21_latest_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept the order waiting, adapted
    to l_shipdate: count a supplier's lines that shipped at-or-after
    EVERY other supplier's line in a finished multi-supplier order).

    Spark-first rewrite of the two correlated subqueries: the oracle's
    EXISTS + NOT-EXISTS pair re-scans lineitem twice; here both
    collapse into per-order statistics over a per-(order,supplier)
    rollup — n_supp (distinct suppliers), the max per-supplier ship
    date M1, how many suppliers attain it, and the runner-up max M2.
    A line l1 of supplier s shipped at-or-after every OTHER supplier
    iff l1.shipdate >= max_other, where max_other = M1 unless s ALONE
    attains M1 (then M2 — non-null whenever n_supp >= 2 and s is the
    sole M1 holder).  The tie case (two suppliers sharing M1) makes
    both qualify on both engines — >= not >.

    Scale: the rollup groupBy and both window passes share ONE
    (l_orderkey) shuffle (the second window reuses the first's
    partitioning — no extra exchange), the join back to l1 lines is
    on the same key, supplier ⋈ nation broadcasts, and the final
    group-by is |suppliers|-sized with a TakeOrderedAndProject
    top-20.  No per-order data explosion: windows run over the
    per-supplier rollup (bounded rows per order), never line×line."""
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li = (
        load(spark, sf_dir, "lineitem")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    )
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("smax")
    )
    w = Window.partitionBy("l_orderkey")
    ps1 = per_supp.select(
        "l_orderkey",
        "l_suppkey",
        "smax",
        F.count("*").over(w).alias("n_supp"),
        F.max("smax").over(w).alias("m1"),
    )
    ps2 = ps1.select(
        "l_orderkey",
        "l_suppkey",
        "smax",
        "n_supp",
        "m1",
        F.sum(F.when(F.col("smax") == F.col("m1"), 1).otherwise(0))
        .over(w)
        .alias("cnt_m1"),
        F.max(F.when(F.col("smax") < F.col("m1"), F.col("smax")))
        .over(w)
        .alias("m2"),
    )
    bar = ps2.filter(F.col("n_supp") >= 2).select(
        "l_orderkey",
        "l_suppkey",
        F.when(
            (F.col("smax") < F.col("m1")) | (F.col("cnt_m1") > 1),
            F.col("m1"),
        )
        .otherwise(F.col("m2"))
        .alias("max_other"),
    )
    qualifying = li.join(bar, ["l_orderkey", "l_suppkey"]).filter(
        F.col("l_shipdate") >= F.col("max_other")
    )
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    ).select("n_nationkey")
    # LEFT SEMI prune (filter-only; nationkey unique) keeps supplier's
    # file-backed size estimate → static broadcast, no hint (r11 audit).
    s = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
    )
    return (
        qualifying.join(s, qualifying.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@query(
    "tpch_q22_dormant_balance",
    oracle="""
    WITH pool AS (
        SELECT c_custkey, c_mktsegment,
               CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
        FROM customer
        WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY', 'HOUSEHOLD')
    ),
    avg_b AS (
        SELECT CAST(SUM(bal_c) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
        FROM pool WHERE bal_c > 0
    )
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(bal_c) AS BIGINT) AS totbal_cents
    FROM pool, avg_b
    WHERE bal_c * n > s
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = pool.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    """,
)
def tpch_q22_dormant_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity, adapted: the corpus
    has no c_phone, so the country-code IN-list becomes a mktsegment
    IN-list, and "never ordered" becomes "dormant" — no order since
    2000 — because every synthetic customer has some order).  Keeps
    Q22's three defining devices: a scalar AVG subquery as the balance
    bar, an anti-join against orders, and a grouped rollup of the
    survivors.

    Exactness: ``c_acctbal > AVG(c_acctbal)`` compares against a float
    average whose summation order differs across engines; rewritten to
    the all-integer cross-multiplied form ``bal_c * n > sum_c`` over
    floor-pinned cents (both sides BIGINT; n*max_cents ≈ 1e10 at
    sf0.1, far inside the ANSI overflow bound).

    Scale: the avg collapses to a 1-row broadcast (scalar-broadcast
    idiom); the anti-join's right side is orders pre-filtered to the
    dormancy horizon and projected to o_custkey only; customer-side
    segment filter reaches the scan."""
    pool = (
        load(spark, sf_dir, "customer")
        .filter(
            F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY", "HOUSEHOLD")
        )
        .select(
            "c_custkey",
            "c_mktsegment",
            _cents(F.col("c_acctbal")).alias("bal_c"),
        )
    )
    bar = pool.filter(F.col("bal_c") > 0).agg(
        F.sum("bal_c").alias("s"), F.count("*").alias("n")
    )
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    rich = pool.crossJoin(F.broadcast(bar)).filter(
        F.col("bal_c") * F.col("n") > F.col("s")
    )
    dormant = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return dormant.groupBy("c_mktsegment").agg(
        F.count("*").alias("numcust"),
        F.sum("bal_c").alias("totbal_cents"),
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH eu AS (
        SELECT s_suppkey, s_name, n_name,
               {_CENTS_SQL.format(expr="s_acctbal")} AS acctbal_cents
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    cost AS (
        SELECT l_partkey, l_suppkey,
               CAST(MIN({_CENTS_SQL.format(expr="l_extendedprice")}) AS BIGINT) AS cost_cents
        FROM lineitem JOIN eu ON l_suppkey = s_suppkey
        GROUP BY l_partkey, l_suppkey
    ),
    ranked AS (
        SELECT *, MIN(cost_cents) OVER (PARTITION BY l_partkey) AS mn FROM cost
    )
    SELECT eu.acctbal_cents, eu.s_name, eu.n_name,
           p.p_partkey, ranked.cost_cents
    FROM ranked
    JOIN part p ON ranked.l_partkey = p.p_partkey
    JOIN eu    ON ranked.l_suppkey = eu.s_suppkey
    WHERE ranked.cost_cents = ranked.mn
      AND p.p_type = 'SMALL' AND p.p_size <= 10
    ORDER BY eu.acctbal_cents DESC, eu.n_name ASC, eu.s_name ASC,
             p.p_partkey ASC, ranked.cost_cents ASC
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier), adapted: the corpus has
    no partsupp/ps_supplycost, so the part↔supplier cost relation is
    DERIVED from lineitem — a (part, supplier) pair's cost is the MIN
    observed sale price in exact cents — and the mfgr/comment columns
    are absent.  Keeps Q2's defining device: a CORRELATED MIN subquery
    (cheapest supplier per part) re-expressed Spark-first as a window
    MIN over the part partition instead of the spec's re-scan +
    equality subquery — one shuffle, no self-join.

    Scale: the EUROPE supplier dim (region⋈nation⋈supplier) broadcasts
    into lineitem, so the fact side never shuffles for eligibility;
    the (partkey, suppkey) aggregate shuffles once and the window MIN
    reuses that partitioning (partkey ⊆ group keys satisfies the
    ClusteredDistribution — no second exchange); the part filter
    broadcasts into the bounded survivor set.  Top-100 compiles to
    TakeOrderedAndProject with (n_name, s_name, p_partkey) making the
    order total."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            _cents(F.col("s_acctbal")).alias("acctbal_cents"),
        )
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .join(
            eu.select("s_suppkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("l_partkey", "l_suppkey", _cents(F.col("l_extendedprice")).alias("pc"))
    )
    cost = (
        li.repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("pc").alias("cost_cents"))
    )
    w = Window.partitionBy("l_partkey")
    cheapest = cost.withColumn("mn", F.min("cost_cents").over(w)).filter(
        F.col("cost_cents") == F.col("mn")
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "SMALL") & (F.col("p_size") <= 10)
    ).select("p_partkey")
    return (
        # POLICY EXCEPTION (r11 broadcast audit, module docstring): q2
        # keeps hard hints so the one-exchange shared-partitioning
        # demonstration (plan-pinned) stays deterministic — static
        # estimates on the derived eu/p sides would otherwise plan SMJ
        # that AQE re-converts at runtime.  At warehouse scale these
        # hints come off with the rest of the SF-linear sides.
        cheapest.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("acctbal_cents", "s_name", "n_name", "p_partkey", "cost_cents")
        .orderBy(
            F.desc("acctbal_cents"),
            F.asc("n_name"),
            F.asc("s_name"),
            F.asc("p_partkey"),
            F.asc("cost_cents"),
        )
        .limit(100)
    )


@query(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM({_CENTS_SQL.format(expr="l_extendedprice * (1 - l_discount)")}
                    - {_CENTS_SQL.format(expr="0.5 * p_retailprice * l_quantity")})
                AS BIGINT) AS profit_cents
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE 'red %'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year), adapted:
    no partsupp, so the unit cost is a deterministic proxy —
    ``0.5 * p_retailprice`` per unit (part.p_retailprice exists) — and
    the name filter is the corpus's 'red ' prefix (spec: '%green%').
    Keeps Q9's defining devices: a profit expression combining revenue
    and cost from DIFFERENT dims, and the (nation, year) rollup over a
    five-table star.

    Exactness: revenue and cost are floor-pinned to cents PER ROW
    (identical association order in both engines: ((0.5*r)*q)*100+0.5)
    and subtracted as BIGINTs — the spec's float SUM(rev - cost) would
    hinge on summation order.

    Scale: part (name-pruned) and the RAW supplier probe broadcast
    statically from file stats, the bounded nation-name lookup attaches
    after (r11 hint-audit shape); the only
    shuffles are lineitem⋈orders on orderkey and the ~150-group
    aggregate.  Profit can be negative; floor is identical on
    negatives in both engines."""
    p = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("red %")
    ).select("p_partkey", "p_retailprice")
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    # RAW supplier probe (file-backed stats → static broadcast, no
    # hint); the bounded nation-name lookup attaches after (r11 audit).
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    rev_c = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    cost_c = _cents(F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity"))
    li = (
        load(spark, sf_dir, "lineitem")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_orderkey", "nation", (rev_c - cost_c).alias("profit_c"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", "o_year")
        .agg(F.sum("profit_c").alias("profit_cents"))
    )


@query(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH v AS (
        SELECT l_partkey,
               CAST(SUM({_CENTS_SQL.format(expr="l_extendedprice")}) AS BIGINT)
                   AS value_cents
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey
    )
    SELECT l_partkey, value_cents
    FROM v
    WHERE value_cents * 1000 > (SELECT CAST(SUM(value_cents) AS BIGINT) FROM v)
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification), adapted: no
    partsupp, so a part's "stock value" for NATION_3's suppliers is
    the summed sale value (exact cents) of their lineitem rows.  Keeps
    Q11's defining device: a HAVING bar set by a SCALAR SUBQUERY over
    the SAME derived aggregate — parts holding more than 0.1% of the
    nation's total value.

    Exactness: the spec's ``value > total * 0.0001`` float comparison
    becomes the all-integer cross-multiplied ``value_cents * 1000 >
    total_cents`` (total ≈ 2e11 cents at sf0.1; ×1000 is far inside
    BIGINT).

    Scale: the nation's supplier list is a LEFT SEMI prune against the
    broadcast 1-row nation (the semi keeps supplier's file-backed size
    estimate, so the probe into lineitem broadcasts STATICALLY with no
    hard hint — r11 hint-audit shape; the inner-join form's derived
    estimate planned SMJ and paid the AQE shuffle-write conversion);
    one shuffle groups by partkey; the grand total is a 1-row
    broadcast (scalar-broadcast idiom) — the derived aggregate is
    persisted so the two consumers (per-part rows, grand total) don't
    re-derive the join+agg subtree twice."""
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    s = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_suppkey")
    )
    v = (
        load(spark, sf_dir, "lineitem")
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).alias("value_cents"))
        .persist()
    )
    total = v.agg(F.sum("value_cents").alias("total_cents"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select("l_partkey", "value_cents")
    )


@query(
    "tpch_q16_supplier_relation_count",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (2, 5, 11, 17, 23, 29, 36, 42, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_relation_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship count), adapted: the
    part↔supplier bridge is DISTINCT (l_partkey, l_suppkey) pairs from
    lineitem (no partsupp), and the spec's complaint-comment exclusion
    becomes the deterministic ``s_acctbal < 0`` flag (no s_comment
    column).  Keeps Q16's defining devices: a NOT-IN supplier
    exclusion (anti-join; the excluded key set is non-null so NOT IN ≡
    anti) and COUNT(DISTINCT supplier) per (brand, type, size) over a
    negated + IN-list dim filter.

    Scale: the exclusion list (6 rows) and the filtered part dim
    broadcast; the bridge dedup shuffles once on the pair; the
    distinct-agg expansion plans its extra exchange on (group keys +
    suppkey) — the known third exchange (see agg_salted_twophase
    build note), unavoidable for exact distinct counts."""
    bad = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(2, 5, 11, 17, 23, 29, 36, 42, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bridge = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
    )
    return bridge.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


@query(
    "tpch_q20_excess_suppliers",
    oracle=f"""
    WITH sp AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS q
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_partkey, l_suppkey
    ),
    m AS (SELECT *, SUM(q) OVER (PARTITION BY l_partkey) AS tq FROM sp),
    qual AS (SELECT DISTINCT l_suppkey FROM m WHERE 2 * q > tq)
    SELECT s_name, {_CENTS_SQL.format(expr="s_acctbal")} AS acctbal_cents
    FROM qual
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_5'
    ORDER BY s_name ASC
    """,
)
def tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion), adapted: no partsupp
    availability, so "excess" means the supplier shipped MORE THAN HALF
    of a prefix-named part's 1997 volume (spec: availqty > 50% of the
    year's shipped quantity).  Keeps Q20's defining devices: a nested
    correlated-aggregate qualification (per-(part,supplier) quantity
    vs per-part total) feeding a supplier semi-join, then the nation
    filter on the survivors.

    Exactness: quantities are integer-valued doubles — cast to BIGINT
    before summing; the half-share test is the all-integer ``2*q > tq``
    (never a float ratio).

    Scale: the prefix-pruned part dim broadcasts into the date-pruned
    fact scan; repartition(l_partkey) then groupBy(partkey, suppkey)
    and the window SUM over partkey all reuse ONE exchange (subset
    partitioning satisfies both ClusteredDistributions); the supplier⋈
    nation dim join broadcasts over the tiny qualifier set."""
    p = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey", F.floor("l_quantity").cast("long").alias("qi"))
    )
    sp = (
        li.repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("qi").alias("q"))
    )
    w = Window.partitionBy("l_partkey")
    qual = (
        sp.withColumn("tq", F.sum("q").over(w))
        .filter(F.lit(2) * F.col("q") > F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    # LEFT SEMI prune (filter-only; nationkey unique) keeps supplier's
    # file-backed size estimate → static broadcast, no hint (r11 audit).
    s = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name", _cents(F.col("s_acctbal")).alias("acctbal_cents"))
    )
    return (
        qual.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "acctbal_cents")
        .orderBy(F.asc("s_name"))
    )


@query(
    "pipeline_tokenize_pack_shard",
    oracle="""
    WITH t AS (
        SELECT doc_id, source,
               CAST(list_sum(list_transform(
                   regexp_extract_all(lower(text),
                                      '[a-z]+|[0-9]+|[^a-z0-9 ]'),
                   x -> (length(x) + 3) // 4)) AS BIGINT) AS n_tok
        FROM documents
    ),
    offs AS (
        SELECT doc_id, source, n_tok,
               SUM(n_tok) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tok AS start_off
        FROM t
    ),
    chunks AS (
        SELECT source,
               start_off // 512 AS chunk_id,
               COUNT(*) AS n_docs,
               SUM(n_tok) AS chunk_tokens
        FROM offs GROUP BY source, chunk_id
    )
    SELECT CAST((chunk_id * 31 + length(source) * 7
                 + ord(substring(source, 1, 1))) % 8 AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT)          AS n_chunks,
           CAST(SUM(n_docs) AS BIGINT)       AS n_docs,
           CAST(SUM(chunk_tokens) AS BIGINT) AS sum_tokens,
           CAST(MAX(chunk_tokens) AS BIGINT) AS max_chunk_tokens
    FROM chunks GROUP BY shard
    """,
)
def pipeline_tokenize_pack_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END dataloader prep: TOKENIZE (BPE-cost estimate, the
    text_token_bpe_count regex+ceil(len/4) model) → PACK (concatenate
    per source in doc_id order, cut 512-token contexts — the
    pack_concat_chunks discipline) → SHARD (assign each chunk to one of
    8 output shards by a pure hash of its identity, then report the
    per-shard manifest: chunk/doc/token counts and the largest chunk).
    This is the whole offline path from raw text to "which shard file
    does the trainer open", as one lineage — the composite the brief's
    training-data mandate asks for.

    The shard hash here is a documented toy (chunk_id·31 + source-name
    arithmetic mod 8) so the oracle can mirror it exactly; production
    swaps in xxhash64(source, chunk_id) — same single-expression shape,
    same balance argument (any uniform hash of the chunk identity
    decorrelates shard from source/position, so shards stay balanced
    within √-noise regardless of source skew).

    Scale: one window cumsum (partitioned by source — at 100 TB the
    stratum is (source, date-shard)), one chunk agg that REUSES the
    window's hash partitioning on source (subset rule: groupBy(source,
    chunk_id) under a source partitioning adds no exchange), then an
    8-group rollup.  No joins, nothing driver-side."""
    from engine.text import _tokens  # noqa: F401  (family dependency)

    d = load(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(
        F.lower(F.col("text")), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]"), F.lit(0)
    )
    t = d.select(
        "doc_id",
        "source",
        F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda a, x: a + F.floor((F.length(x) + 3) / 4).cast("long"),
        ).alias("n_tok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = t.withColumn("start_off", F.sum("n_tok").over(w) - F.col("n_tok"))
    chunks = (
        offs.withColumn(
            "chunk_id", (F.col("start_off") / 512).cast("long")
        )
        .groupBy("source", "chunk_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("chunk_tokens"),
        )
    )
    shard = (
        F.col("chunk_id") * 31
        + F.length("source") * 7
        + F.ascii(F.substring("source", 1, 1))
    ) % 8
    return chunks.groupBy(shard.cast("long").alias("shard")).agg(
        F.count("*").alias("n_chunks"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("chunk_tokens").cast("long").alias("sum_tokens"),
        F.max("chunk_tokens").cast("long").alias("max_chunk_tokens"),
    )


@query(
    "pack_attention_contamination",
    oracle="""
    WITH t AS (
        SELECT doc_id, source,
               len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
                   AS n_tok
        FROM documents
    ),
    offs AS (
        SELECT doc_id, source, n_tok,
               SUM(n_tok) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tok AS start_off
        FROM t
    )
    SELECT source,
           CAST(start_off // 512 AS BIGINT) AS chunk_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS chunk_tokens,
           CAST(SUM(n_tok * n_tok) AS BIGINT) AS self_pairs,
           CAST(SUM(n_tok) * SUM(n_tok) AS BIGINT) AS total_pairs,
           FLOOR((1.0 - CAST(SUM(n_tok * n_tok) AS DOUBLE)
                        / (CAST(SUM(n_tok) AS DOUBLE)
                           * CAST(SUM(n_tok) AS DOUBLE)))
                 * 10000 + 0.5) / 10000 AS cross_frac
    FROM offs
    GROUP BY source, chunk_id
    """,
)
def pack_attention_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATTENTION-CONTAMINATION audit of the packing layout — the metric
    that tells a pretraining run how much of each packed context's
    attention mass crosses document boundaries (tokens attending to
    unrelated neighbor docs).  Per (source, chunk) under the
    pack_concat_chunks layout: token mass, same-doc attention pairs
    Σtᵢ², all pairs (Σtᵢ)², and the cross-document fraction
    1 − Σtᵢ²/(Σtᵢ)² — the number that motivates boundary-respecting
    packing / attention-mask resets (pack_length_buckets vs concat
    trade-off, quantified).

    Exact integer pair counts (tᵢ ≤ corpus doc length, Σtᵢ² ≪ 2⁶³ —
    ANSI-safe) with only the final fraction floor-pinned.

    Scale: identical shape to pack_concat_chunks — window cumsum per
    source, chunk agg on the same exchange (subset rule), no joins."""
    from engine.text import _tokens

    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "source", F.size(_tokens(F.col("text"))).alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = t.withColumn("start_off", F.sum("n_tok").over(w) - F.col("n_tok"))
    fix4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    g = (
        offs.withColumn(
            "chunk_id", (F.col("start_off") / 512).cast("long")
        )
        .groupBy("source", "chunk_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("chunk_tokens"),
            F.sum(F.col("n_tok") * F.col("n_tok")).cast("long").alias(
                "self_pairs"
            ),
        )
    )
    total_sq = (F.col("chunk_tokens") * F.col("chunk_tokens")).cast("long")
    return g.select(
        "source",
        "chunk_id",
        "n_docs",
        "chunk_tokens",
        "self_pairs",
        total_sq.alias("total_pairs"),
        fix4(
            1.0
            - F.col("self_pairs").cast("double")
            / (
                F.col("chunk_tokens").cast("double")
                * F.col("chunk_tokens").cast("double")
            )
        ).alias("cross_frac"),
    )


@query(
    "pipeline_cdc_apply_changes",
    oracle="""
    WITH feed AS (
        SELECT user_id,
               CASE event_type WHEN 'signup' THEN 'I'
                               WHEN 'error' THEN 'D'
                               ELSE 'U' END AS op,
               ts, event_id,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS val_cents
        FROM events
    ),
    ranked AS (
        SELECT user_id, op, val_cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT)
                   AS n_changes,
               CAST(SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id) AS BIGINT) AS n_deletes
        FROM feed
    )
    SELECT user_id, op AS last_op, val_cents AS last_val_cents,
           n_changes, n_deletes
    FROM ranked WHERE rn = 1 AND op <> 'D'
    ORDER BY user_id
    """,
)
def pipeline_cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC APPLY CHANGES: reduce an out-of-order change feed
    (insert/update/delete ops with a total sequence order) to the
    current table state — the ingestion step every warehouse mirror of
    an OLTP source runs, and the batch twin of `sink_merge_upsert`
    (which applies ONE deduplicated batch; this collapses the full
    multi-op history per key, honoring trailing tombstones).

    The events table stands in as the feed: op is derived from
    event_type (signup->I, error->D, else U); the sequence key is
    (ts, event_id) — unique by construction, so `last per key` is
    deterministic.  A key whose LATEST op is a delete is absent from
    the output (tombstone wins); per-key audit counts ride along.

    Scale shape: ONE shuffle on user_id serves the ranking window and
    both per-key audit counts (same partitioning, subset rule); no
    self-join against the feed.  At 100 TB the feed partitions by key
    exactly as a MERGE shuffle would — this is the minimal-movement
    plan for full-history compaction."""
    ev = load(spark, sf_dir, "events")
    feed = ev.select(
        "user_id",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("val_cents"),
    )
    w = Window.partitionBy("user_id")
    wseq = w.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    ranked = feed.select(
        "user_id",
        "op",
        "val_cents",
        F.row_number().over(wseq).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_changes"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0))
        .over(w)
        .cast("long")
        .alias("n_deletes"),
    )
    return (
        ranked.where((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "user_id",
            F.col("op").alias("last_op"),
            F.col("val_cents").alias("last_val_cents"),
            "n_changes",
            "n_deletes",
        )
        .orderBy("user_id")
    )


@query(
    "dq_rule_violations",
    oracle="""
    WITH scan AS (
        SELECT
            CAST(COUNT(*) AS BIGINT) AS checked,
            CAST(SUM(CASE WHEN l_quantity IS NULL OR l_quantity < 1
                          OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
                AS qty_range,
            CAST(SUM(CASE WHEN l_discount IS NULL OR l_discount < 0
                          OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
                AS disc_range,
            CAST(SUM(CASE WHEN l_extendedprice IS NULL
                          OR l_extendedprice <= 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS price_positive,
            CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS shipdate_null
        FROM lineitem
    ),
    orphans AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS v FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)
    ),
    dupes AS (
        SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) AS v FROM (
            SELECT COUNT(*) AS c FROM lineitem
            GROUP BY l_orderkey, l_linenumber
        ) g WHERE c > 1
    )
    SELECT rule_id, violations, checked,
           CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS INT) AS ok
    FROM (
        SELECT 'quantity_in_1_50' AS rule_id, qty_range AS violations,
               checked FROM scan
        UNION ALL
        SELECT 'discount_in_0_0.1', disc_range, checked FROM scan
        UNION ALL
        SELECT 'extendedprice_positive', price_positive, checked FROM scan
        UNION ALL
        SELECT 'shipdate_not_null', shipdate_null, checked FROM scan
        UNION ALL
        SELECT 'orderkey_references_orders', o.v, s.checked
        FROM orphans o, scan s
        UNION ALL
        SELECT 'line_pk_unique', d.v, s.checked FROM dupes d, scan s
    ) ORDER BY rule_id
    """,
)
def dq_rule_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit suite (the great-expectations shape): a fixed
    rulebook evaluated into ONE long-form violations report — range
    checks, null checks, referential integrity, and primary-key
    uniqueness, each with its violation count and a pass flag.

    Scale shape: all four column rules reduce in a SINGLE
    map-side-combinable pass over the fact scan (conditional sums — not
    one scan per rule); referential integrity is a LEFT ANTI join
    against the broadcast-able key side counted to one row; uniqueness
    reduces per (orderkey, linenumber) then counts surplus rows.  The
    final report union is |rules| rows.  `ok` is INT (driver-safe
    scalar set: no boolean outputs)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    scan = li.agg(
        F.count(F.lit(1)).alias("checked"),
        F.sum(
            F.when(
                F.col("l_quantity").isNull()
                | (F.col("l_quantity") < 1)
                | (F.col("l_quantity") > 50),
                1,
            ).otherwise(0)
        ).cast("long").alias("qty_range"),
        F.sum(
            F.when(
                F.col("l_discount").isNull()
                | (F.col("l_discount") < 0)
                | (F.col("l_discount") > 0.1),
                1,
            ).otherwise(0)
        ).cast("long").alias("disc_range"),
        F.sum(
            F.when(
                F.col("l_extendedprice").isNull()
                | (F.col("l_extendedprice") <= 0),
                1,
            ).otherwise(0)
        ).cast("long").alias("price_positive"),
        F.sum(F.when(F.col("l_shipdate").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("shipdate_null"),
    ).persist()  # 1-row diamond: six consumers (4 rule rows + 2 checked joins)
    orphans = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    dupes = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).cast("long").alias("v"))
    )
    rows = []
    for rule, col in [
        ("quantity_in_1_50", "qty_range"),
        ("discount_in_0_0.1", "disc_range"),
        ("extendedprice_positive", "price_positive"),
        ("shipdate_not_null", "shipdate_null"),
    ]:
        rows.append(
            scan.select(
                F.lit(rule).alias("rule_id"),
                F.col(col).alias("violations"),
                "checked",
            )
        )
    rows.append(
        orphans.crossJoin(scan.select("checked")).select(
            F.lit("orderkey_references_orders").alias("rule_id"),
            F.col("v").alias("violations"),
            "checked",
        )
    )
    rows.append(
        dupes.crossJoin(scan.select("checked")).select(
            F.lit("line_pk_unique").alias("rule_id"),
            F.col("v").alias("violations"),
            "checked",
        )
    )
    report = rows[0]
    for r in rows[1:]:
        report = report.unionAll(r)
    return report.select(
        "rule_id",
        "violations",
        "checked",
        F.when(F.col("violations") == 0, 1).otherwise(0).cast("int").alias("ok"),
    ).orderBy("rule_id")


# dq_schema_profile canonical columns: each source column maps to a
# deterministic TYPED canon — numerics/cents/epoch-µs stay BIGINT
# (hash-friendly distinct-dedup, NUMERIC min/max), strings stay VARCHAR
# — and min/max render as digit strings only AFTER aggregation, so
# nothing float- or timestamp-formatted ever enters a comparison.  The
# first cut canonicalized to VARCHAR BEFORE the agg: the distinct
# expand then deduped ~1M wide string rows through a SortAggregate
# (min/max over VARCHAR forbid the hash buffer) — measured 5.0 s warm
# vs 1.3 s for the typed form at sf0.1.  o_custkey gets PLANTED nulls
# on the ‰13 orderkey residue (the corpus ships none — the _PII_SQL
# discipline: make the zero path non-vacuous).
# Each entry: (name, duckdb canon expr, needs_cast_to_varchar_post_agg)
_DQ_PROFILE_COLS = [
    ("o_orderkey", "o_orderkey", True),
    (
        "o_custkey",
        "CASE WHEN o_orderkey % 13 <> 0 THEN o_custkey END",
        True,
    ),
    ("o_orderstatus", "o_orderstatus", False),
    (
        "o_totalprice",
        "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)",
        True,
    ),
    ("o_orderdate", "epoch_us(o_orderdate)", True),
    ("o_orderpriority", "o_orderpriority", False),
]

_DQ_CANON_SQL = ",\n               ".join(
    f"{expr} AS c{i}" for i, (_, expr, _c) in enumerate(_DQ_PROFILE_COLS)
)
_DQ_AGGS_SQL = ",\n               ".join(
    f"CAST(SUM(CASE WHEN c{i} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn{i},"
    f" CAST(COUNT(DISTINCT c{i}) AS BIGINT) AS nd{i},"
    + (
        f" CAST(MIN(c{i}) AS VARCHAR) AS mn{i},"
        f" CAST(MAX(c{i}) AS VARCHAR) AS mx{i}"
        if cast
        else f" MIN(c{i}) AS mn{i}, MAX(c{i}) AS mx{i}"
    )
    for i, (_, _e, cast) in enumerate(_DQ_PROFILE_COLS)
)
_DQ_UNION_SQL = "\n        UNION ALL\n        ".join(
    f"SELECT '{name}' AS column_name, n_rows, nn{i} AS n_nulls,"
    f" nd{i} AS n_distinct, mn{i} AS min_canon, mx{i} AS max_canon FROM prof"
    for i, (name, _e, _c) in enumerate(_DQ_PROFILE_COLS)
)


@query(
    "dq_schema_profile",
    oracle=f"""
    WITH canon AS (
        SELECT {_DQ_CANON_SQL}
        FROM orders
    ),
    prof AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               {_DQ_AGGS_SQL}
        FROM canon
    )
    SELECT column_name, n_rows, n_nulls, n_distinct, min_canon, max_canon
    FROM (
        {_DQ_UNION_SQL}
    )
    ORDER BY column_name
    """,
)
def dq_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column schema/statistics PROFILE of a table — the
    data-profiling pass every ingestion pipeline runs before accepting
    a new drop (null rate, exact cardinality, value range per column),
    emitted as one long-form row per column.

    Shape: TWO single-row aggregates cross-joined for free — (a)
    count/nulls/min/max reduce in one map-side-combinable pass; (b) the
    6-column exact COUNT(DISTINCT) runs as its own expand-based
    aggregate (agg_multi_distinct precedent).  Packing all 24 metrics
    into ONE agg forces every non-distinct aggregate through the
    distinct expand as first(...) FILTER inside a SortAggregate —
    measured 3.7 s warm vs 1.3 s for the split at sf0.1 (and 5.0 s for
    the first cut, which additionally deduped VARCHAR canons; the typed
    canons keep the expand's dedup hash-aggregating on longs).  The
    split buys that with a second scan of the table — the right local
    trade (the expand dominates), and moot at 100 TB where you'd swap
    exact distinct for approx_count_distinct: aggregate (b) then
    collapses into (a) and the profile is genuinely one scan.  Exact is
    kept here because the oracle must match bit-for-bit.  The long form
    comes from `stack` applied to the single joined row — the table
    never shuffles into a per-column long form.

    Determinism: cents and epoch-µs are exact integers; min/max of
    BIGINT canons render as digit strings post-agg (CAST(BIGINT AS
    VARCHAR) is format-stable on both engines); string columns keep
    lexicographic (memcmp/ASCII) min/max.  o_custkey carries planted
    nulls (‰13 orderkey residue, oracle-mirrored) so the null-rate
    path is non-vacuous on a corpus that ships none."""
    o = load(spark, sf_dir, "orders")
    canon = o.select(
        F.col("o_orderkey").alias("c0"),
        F.when(F.col("o_orderkey") % 13 != 0, F.col("o_custkey")).alias("c1"),
        F.col("o_orderstatus").alias("c2"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("c3"),
        # o_orderdate loads as TIMESTAMP_NTZ; session tz is UTC, so the
        # cast is epoch-preserving and matches DuckDB's naive epoch_us.
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("c4"),
        F.col("o_orderpriority").alias("c5"),
    )
    basic = [F.count(F.lit(1)).alias("n_rows")]
    distincts = []
    for i, (_name, _e, cast) in enumerate(_DQ_PROFILE_COLS):
        c = F.col(f"c{i}")
        mn, mx = F.min(c), F.max(c)
        if cast:
            mn, mx = mn.cast("string"), mx.cast("string")
        basic += [
            F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("long").alias(f"nn{i}"),
            mn.alias(f"mn{i}"),
            mx.alias(f"mx{i}"),
        ]
        distincts.append(F.countDistinct(c).alias(f"nd{i}"))
    n = len(_DQ_PROFILE_COLS)
    prof = canon.agg(*basic).crossJoin(canon.agg(*distincts))
    stack = ", ".join(
        f"'{name}', nn{i}, nd{i}, mn{i}, mx{i}"
        for i, (name, _e, _c) in enumerate(_DQ_PROFILE_COLS)
    )
    return prof.select(
        F.expr(
            f"stack({n}, {stack}) AS "
            "(column_name, n_nulls, n_distinct, min_canon, max_canon)"
        ),
        "n_rows",
    ).select(
        "column_name", "n_rows", "n_nulls", "n_distinct", "min_canon", "max_canon"
    ).orderBy("column_name")


def _corpus_clean_oracle() -> str:
    """DuckDB twin of the corpus-clean pipeline with the KR near-dup
    stage: 4-way planted corpus → token-count quality gate → md5 exact
    dedup → KR MinHash near-dup pairs (engine/dedup.py shared CTEs) →
    one fate label per input doc.  The deduped survivor set is aliased
    `corpus` so _KR_TOK_SH_SQL (which reads FROM corpus) shingles
    exactly the rows the Spark plan shingles."""
    from engine.dedup import _KR_MH_PAIRS_CTES, _KR_TOK_SH_SQL
    from engine.text import _TOKENS_SQL

    return f"""
    WITH corpus4 AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000, text || ' zz yy' FROM documents
        UNION ALL
        SELECT doc_id + 200000, text FROM documents
        UNION ALL
        SELECT doc_id + 300000, 'zz spam' FROM documents
    ),
    gated AS (
        SELECT doc_id, text,
               len({_TOKENS_SQL.format(c="text")}) < 5 AS lowq
        FROM corpus4
    ),
    fp AS (
        SELECT doc_id, text, md5(text) AS fp FROM gated WHERE NOT lowq
    ),
    rankedq AS (
        SELECT doc_id, text,
               ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM fp
    ),
    corpus AS (SELECT doc_id, text FROM rankedq WHERE rn = 1),
    {_KR_TOK_SH_SQL},
    {_KR_MH_PAIRS_CTES},
    dropids AS (SELECT DISTINCT doc_b AS doc_id FROM mh_pairs)
    SELECT doc_id, status FROM (
        SELECT doc_id, 'low_quality' AS status FROM gated WHERE lowq
        UNION ALL
        SELECT doc_id, 'exact_dup' FROM rankedq WHERE rn > 1
        UNION ALL
        SELECT u.doc_id, 'near_dup' FROM corpus u
        WHERE EXISTS (SELECT 1 FROM dropids d WHERE d.doc_id = u.doc_id)
        UNION ALL
        SELECT u.doc_id, 'kept' FROM corpus u
        WHERE NOT EXISTS (SELECT 1 FROM dropids d WHERE d.doc_id = u.doc_id)
    )
    """


@query("pipeline_corpus_clean_polyhash", oracle=_corpus_clean_oracle())
def pipeline_corpus_clean_polyhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NORTH-STAR corpus-cleaning pipeline, HASH-VERIFIED
    end-to-end: identical composition to ``pipeline_corpus_clean``
    (quality gate → md5 exact dedup → MinHash-LSH near-dup removal →
    per-doc fate label) with the near-dup stage swapped from the
    xxhash64 family to the DuckDB-replayable Karp-Rabin chain
    (engine.dedup.kr_minhash_near_pairs) — so the DuckDB oracle replays
    EVERY stage, including candidate generation inside the LSH, and the
    driver hash-proves the complete audit trail (md5 is cross-engine by
    fn_hash_md5; the token gate and fate unions are pure relational).
    The xxhash sibling stays registered as the production-flavor
    rows-only twin; this key is the correctness anchor for the whole
    pipeline shape.

    Same scale shape as the sibling: per-row gate (no shuffle), 16-byte
    fingerprint shuffle for exact dedup, bucketed banded LSH (never
    all-pairs), persisted `uniq` diamond feeding the near-dup stage and
    both status joins."""
    from engine.dedup import kr_minhash_near_pairs
    from engine.text import _tokens

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    raw = (
        d.unionByName(
            d.select(
                (F.col("doc_id") + 100_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zz yy")).alias("text"),
            )
        )
        .unionByName(
            d.select((F.col("doc_id") + 200_000).alias("doc_id"), "text")
        )
        .unionByName(
            d.select(
                (F.col("doc_id") + 300_000).alias("doc_id"),
                F.lit("zz spam").alias("text"),
            )
        )
    )
    # gated diamond (low_quality + dedup path): persist saves the
    # re-derived 4-way union + tokenize (5.15 → 3.8 s warm at sf0.1).
    gated = raw.withColumn("lowq", F.size(_tokens(F.col("text"))) < 5).persist()
    low_quality = gated.filter("lowq").select(
        "doc_id", F.lit("low_quality").alias("status")
    )
    fp = gated.filter(~F.col("lowq")).withColumn("fp", F.md5("text"))
    w = Window.partitionBy("fp").orderBy("doc_id")
    ranked = fp.withColumn("rn", F.row_number().over(w))
    exact_dup = ranked.filter(F.col("rn") > 1).select(
        "doc_id", F.lit("exact_dup").alias("status")
    )
    uniq = (
        ranked.filter(F.col("rn") == 1).select("doc_id", "text").persist()
    )
    # arrow=True (r18): kernel-built shingles won every interleaved A/B
    # round on this key (3.97-4.47 → 3.68-3.84 s); exact-equal chain,
    # oracle untouched.
    pairs = kr_minhash_near_pairs(uniq, arrow=True)
    drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct().persist()
    near_dup = uniq.join(drop, "doc_id", "left_semi").select(
        "doc_id", F.lit("near_dup").alias("status")
    )
    kept = uniq.join(drop, "doc_id", "left_anti").select(
        "doc_id", F.lit("kept").alias("status")
    )
    return (
        kept.unionByName(near_dup)
        .unionByName(exact_dup)
        .unionByName(low_quality)
    )


# -- dataset version diff (r14 breadth: reproducibility audit) --------------
_DIFF_ADD_OFFSET = 200_000


@query(
    "dq_dataset_diff",
    oracle=f"""
    WITH v1 AS (SELECT doc_id, md5(text) AS h FROM documents),
    v2 AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 5 THEN md5(text || ' v2')
                    ELSE md5(text) END AS h
        FROM documents WHERE doc_id % 7 <> 3
        UNION ALL
        SELECT doc_id + {_DIFF_ADD_OFFSET}, md5(text || ' new')
        FROM documents WHERE doc_id % 7 = 1
    )
    SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
           CASE WHEN v2.h IS NULL THEN 'removed'
                WHEN v1.h IS NULL THEN 'added'
                WHEN v1.h = v2.h THEN 'unchanged'
                ELSE 'modified' END AS status,
           COALESCE(v1.h, '') AS v1_md5,
           COALESCE(v2.h, '') AS v2_md5
    FROM v1 FULL OUTER JOIN v2 ON v2.doc_id = v1.doc_id
    """,
)
def dq_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATASET VERSION DIFF — the reproducibility audit a training-data
    pipeline runs between corpus snapshots (the DVC/`git diff` of
    datasets): per document id, classify added / removed / modified /
    unchanged by content hash, with both versions' MD5s for the audit
    trail.  The second version is derived in-key (the planted-corpus
    idiom): %7=3 dropped, %7=5 modified, %7=1 re-added under a new id
    — so every status class is exercised and the oracle replays the
    derivation exactly.

    Scale: two content-hash scans (map-only MD5 — at 100 TB the hash
    column is what a manifest stores, so the scans are metadata reads)
    and ONE full-outer hash join on doc_id; statuses are per-row CASE
    arithmetic, no window, no skew (doc_id is unique per side).  The
    output is id-space-sized, and a `status` rollup is one
    map-side-combined count away."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    # Id-space tripwire (r14 ADVICE #3): re-added ids live at doc_id +
    # _DIFF_ADD_OFFSET, which is disjoint from real v1 ids ONLY while
    # every corpus doc_id stays below the offset.  A corpus
    # regeneration with a larger id space would alias re-added onto
    # real ids (both engines consistently — the hash would still match
    # while doc_id silently stopped being unique).  assert_true folded
    # into the emitted id (coalesce keeps it un-prunable, adds 0 when
    # the invariant holds) turns that silent aliasing into a loud
    # per-row failure, the same better-loud discipline as the CC
    # convergence cap (engine/dedup.py).
    guarded_id = F.col("doc_id") + F.coalesce(
        F.assert_true(
            F.col("doc_id") < F.lit(_DIFF_ADD_OFFSET),
            F.lit(
                "dq_dataset_diff: corpus doc_id >= _DIFF_ADD_OFFSET — "
                "re-added ids would alias real v1 ids; raise the offset"
            ),
        ).cast("long"),
        F.lit(0),
    )
    v1 = d.select(guarded_id.alias("doc_id"), F.md5("text").alias("h"))
    v2 = (
        d.filter(F.col("doc_id") % 7 != 3)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 7 == 5,
                F.md5(F.concat(F.col("text"), F.lit(" v2"))),
            ).otherwise(F.md5("text")).alias("h"),
        )
        .unionByName(
            d.filter(F.col("doc_id") % 7 == 1).select(
                (F.col("doc_id") + _DIFF_ADD_OFFSET).alias("doc_id"),
                F.md5(F.concat(F.col("text"), F.lit(" new"))).alias("h"),
            )
        )
    )
    v1 = v1.select(F.col("doc_id").alias("a_id"), F.col("h").alias("h1"))
    v2 = v2.select(F.col("doc_id").alias("b_id"), F.col("h").alias("h2"))
    j = v1.join(v2, v1.a_id == v2.b_id, "full_outer")
    status = (
        F.when(F.col("h2").isNull(), F.lit("removed"))
        .when(F.col("h1").isNull(), F.lit("added"))
        .when(F.col("h1") == F.col("h2"), F.lit("unchanged"))
        .otherwise(F.lit("modified"))
    )
    return j.select(
        F.coalesce(F.col("a_id"), F.col("b_id")).alias("doc_id"),
        status.alias("status"),
        F.coalesce(F.col("h1"), F.lit("")).alias("v1_md5"),
        F.coalesce(F.col("h2"), F.lit("")).alias("v2_md5"),
    )


# -- referential-integrity audit (r15: the FK-orphan check every
# -- warehouse DQ suite runs; violations PLANTED at distinct prime
# -- residues so every audited relation exercises real orphans) -------------
_RI_BIG = 1_000_000_000  # planted FK offset: provably outside any parent


@query(
    "dq_referential_integrity",
    oracle=f"""
    WITH dli AS (
        SELECT CASE WHEN l_orderkey % 97 = 3
                    THEN l_orderkey + {_RI_BIG} ELSE l_orderkey END AS fk_order,
               CASE WHEN l_orderkey % 97 = 1
                    THEN l_partkey + {_RI_BIG} ELSE l_partkey END AS fk_part,
               CASE WHEN l_orderkey % 97 = 2
                    THEN l_suppkey + {_RI_BIG} ELSE l_suppkey END AS fk_supp
        FROM lineitem
    ),
    li AS (
        SELECT d.*, p.p_partkey, s.s_suppkey, o.o_orderkey
        FROM dli d
        LEFT JOIN part p ON d.fk_part = p.p_partkey
        LEFT JOIN supplier s ON d.fk_supp = s.s_suppkey
        LEFT JOIN orders o ON d.fk_order = o.o_orderkey
    ),
    audits AS (
        SELECT 'lineitem.l_partkey->part' AS relation,
               COUNT(*) AS n_rows,
               SUM(CASE WHEN p_partkey IS NULL THEN 1 ELSE 0 END) AS n_orphans,
               MIN(CASE WHEN p_partkey IS NULL THEN fk_part END) AS mn,
               MAX(CASE WHEN p_partkey IS NULL THEN fk_part END) AS mx
        FROM li
        UNION ALL
        SELECT 'lineitem.l_suppkey->supplier', COUNT(*),
               SUM(CASE WHEN s_suppkey IS NULL THEN 1 ELSE 0 END),
               MIN(CASE WHEN s_suppkey IS NULL THEN fk_supp END),
               MAX(CASE WHEN s_suppkey IS NULL THEN fk_supp END)
        FROM li
        UNION ALL
        SELECT 'lineitem.l_orderkey->orders', COUNT(*),
               SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END),
               MIN(CASE WHEN o_orderkey IS NULL THEN fk_order END),
               MAX(CASE WHEN o_orderkey IS NULL THEN fk_order END)
        FROM li
        UNION ALL
        SELECT 'orders.o_custkey->customer', COUNT(*),
               SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END),
               MIN(CASE WHEN c.c_custkey IS NULL THEN d.fk_cust END),
               MAX(CASE WHEN c.c_custkey IS NULL THEN d.fk_cust END)
        FROM (SELECT CASE WHEN o_orderkey % 89 = 4
                          THEN o_custkey + {_RI_BIG} ELSE o_custkey END
                     AS fk_cust
              FROM orders) d
        LEFT JOIN customer c ON d.fk_cust = c.c_custkey
        UNION ALL
        SELECT 'customer.c_nationkey->nation', COUNT(*),
               SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END),
               MIN(CASE WHEN n.n_nationkey IS NULL THEN d.fk_nation END),
               MAX(CASE WHEN n.n_nationkey IS NULL THEN d.fk_nation END)
        FROM (SELECT CASE WHEN c_custkey % 83 = 5
                          THEN c_nationkey + 100 ELSE c_nationkey END
                     AS fk_nation
              FROM customer) d
        LEFT JOIN nation n ON d.fk_nation = n.n_nationkey
    )
    SELECT relation,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_orphans AS BIGINT) AS n_orphans,
           CAST(n_orphans * 1000000 // n_rows AS BIGINT) AS orphan_rate_e6,
           CAST(COALESCE(mn, -1) AS BIGINT) AS min_orphan_key,
           CAST(COALESCE(mx, -1) AS BIGINT) AS max_orphan_key
    FROM audits
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REFERENTIAL-INTEGRITY AUDIT — the FK-orphan sweep a warehouse DQ
    suite runs before trusting a load: five parent-child relations of
    the TPC-H graph checked in one job, each reporting row count,
    orphan count, integer orphan rate (e6) and the min/max orphan key
    for triage.  The pristine corpus would make every count zero, so
    violations are PLANTED at distinct prime residues (97/89/83 —
    coprime with every other plant cycle in the repo) with a +1e9 key
    offset provably outside any parent's domain; the oracle replays the
    derivation, so the audit's ability to FIND each class is what gets
    hash-verified.

    Scale design: the three lineitem FKs are audited in ONE fact scan —
    three left joins hang off a single pass (part/supplier broadcast;
    orders co-shuffles — the standard fact⋈fact shape), then one
    global aggregate emits all three audit rows via stack().  Never
    three rescans of the 100 TB child.  The orders and customer audits
    are one broadcast join each.  Output is 5 rows — audit-sized."""
    li = load(spark, sf_dir, "lineitem").select(
        F.when(
            F.col("l_orderkey") % 97 == 3, F.col("l_orderkey") + _RI_BIG
        ).otherwise(F.col("l_orderkey")).alias("fk_order"),
        F.when(
            F.col("l_orderkey") % 97 == 1, F.col("l_partkey") + _RI_BIG
        ).otherwise(F.col("l_partkey")).alias("fk_part"),
        F.when(
            F.col("l_orderkey") % 97 == 2, F.col("l_suppkey") + _RI_BIG
        ).otherwise(F.col("l_suppkey")).alias("fk_supp"),
    )
    part = load(spark, sf_dir, "part").select("p_partkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey")

    joined = (
        li.join(F.broadcast(part), li.fk_part == part.p_partkey, "left")
        .join(F.broadcast(supp), li.fk_supp == supp.s_suppkey, "left")
        .join(orders.select("o_orderkey"), li.fk_order == F.col("o_orderkey"),
              "left")
    )

    def audit(parent_key: str, fk: str):
        orphan = F.col(parent_key).isNull()
        return [
            F.count("*"),
            F.sum(orphan.cast("long")),
            F.min(F.when(orphan, F.col(fk))),
            F.max(F.when(orphan, F.col(fk))),
        ]

    li_row = joined.agg(
        *[
            a.alias(f"c{i}")
            for i, a in enumerate(
                audit("p_partkey", "fk_part")
                + audit("s_suppkey", "fk_supp")
                + audit("o_orderkey", "fk_order")
            )
        ]
    )
    li_long = li_row.selectExpr(
        "stack(3, "
        "'lineitem.l_partkey->part', c0, c1, c2, c3, "
        "'lineitem.l_suppkey->supplier', c4, c5, c6, c7, "
        "'lineitem.l_orderkey->orders', c8, c9, c10, c11"
        ") AS (relation, n_rows, n_orphans, mn, mx)"
    )

    ord_dirty = orders.select(
        F.when(
            F.col("o_orderkey") % 89 == 4, F.col("o_custkey") + _RI_BIG
        ).otherwise(F.col("o_custkey")).alias("fk_cust")
    )
    ord_row = (
        ord_dirty.join(
            F.broadcast(cust.select("c_custkey")),
            ord_dirty.fk_cust == F.col("c_custkey"),
            "left",
        )
        .agg(*[a.alias(f"c{i}")
               for i, a in enumerate(audit("c_custkey", "fk_cust"))])
        .selectExpr(
            "stack(1, 'orders.o_custkey->customer', c0, c1, c2, c3)"
            " AS (relation, n_rows, n_orphans, mn, mx)"
        )
    )

    cust_dirty = cust.select(
        F.when(
            F.col("c_custkey") % 83 == 5, F.col("c_nationkey") + 100
        ).otherwise(F.col("c_nationkey")).alias("fk_nation")
    )
    cust_row = (
        cust_dirty.join(
            F.broadcast(nation),
            cust_dirty.fk_nation == F.col("n_nationkey"),
            "left",
        )
        .agg(*[a.alias(f"c{i}")
               for i, a in enumerate(audit("n_nationkey", "fk_nation"))])
        .selectExpr(
            "stack(1, 'customer.c_nationkey->nation', c0, c1, c2, c3)"
            " AS (relation, n_rows, n_orphans, mn, mx)"
        )
    )

    return (
        li_long.unionByName(ord_row)
        .unionByName(cust_row)
        .select(
            "relation",
            "n_rows",
            "n_orphans",
            F.expr("n_orphans * 1000000 div n_rows").alias("orphan_rate_e6"),
            F.coalesce(F.col("mn"), F.lit(-1)).alias("min_orphan_key"),
            F.coalesce(F.col("mx"), F.lit(-1)).alias("max_orphan_key"),
        )
    )
