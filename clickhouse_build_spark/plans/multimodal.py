"""Registered multimodal queries.

As of round 5 these run the REAL decode path: the corpus writer emits
genuine container bytes in all eight formats (PNG/JPEG, WAV/ADPCM/MDCT,
Y4M/MJPEG-AVI/P-frame AVI — ``operators/codecs.py`` and siblings) and
the kernels parse them and measure the decoded pixel/sample arrays
(``fake=False``). The corpus seeds decoded CONTENT from md5 — pixels =
``md5('media:'||id)`` tiled, audio windows = ``md5('rms:'||h||':'||ms)``
tiled, frames = ``md5('frame:'||h||':'||ms)`` tiled — so honest
measurements of the decoded arrays (means, sum-of-squares energy,
leading-block fingerprints) are ALSO pure md5/hex SQL expressions, and
DuckDB reproduces the full decode-and-measure pipeline value-for-value
(same portable-hash trick as ``operators/dedup.py:portable_hash_sql``).
Real-vs-fake kernel parity is separately pytest-asserted
(tests/test_multimodal.py).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_build_spark.catalog import load_tables
from clickhouse_build_spark.operators.multimodal import (
    chunk_audio,
    extract_image_features,
    media_from_documents,
    resize_images,
    sample_frames,
)
from clickhouse_build_spark.plans.registry import query

# ------------------------------------------- media corpus at rest
#
# Ingest once, query many: the container-encode stage is the ingest
# seam (production reads object-store bytes), so paying it inside every
# media query models the wrong pipeline — a real system lands the
# corpus in columnar storage once and every decode pass scans it from
# there. The cache below is the session-scoped analogue of
# plans/dedup.py's shared artifacts: on first touch the corpus is
# encoded and written as parquet PARTITIONED BY kind (binary payload +
# struct metadata at rest), and every media query reads it back with a
# kind filter that Catalyst turns into partition pruning — a
# single-kind consumer never even lists the other kinds' files. At
# 100 TB the same layout holds (kind/date partition dirs; payloads
# dominate row size so files stay near one row-group each), and the
# write happens in the ingest job, not per query.

_MEDIA_CORPUS: dict[tuple[str, str], str] = {}


def shared_media_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sf-scaled media corpus at rest: encoded PNG/WAV/Y4M payloads
    written once per (session, sf_dir) as kind-partitioned parquet,
    then served from disk to every media query."""
    from clickhouse_build_spark.plans.artifacts import session_artifact

    def build() -> str:
        import atexit

        path = tempfile.mkdtemp(prefix="chb_media_corpus_")
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        docs = load_tables(spark, sf_dir)["documents"]
        media = media_from_documents(docs, kinds=None, real_payloads=True)
        media.write.mode("overwrite").partitionBy("kind").parquet(path)
        return path

    key = (spark.sparkContext.applicationId, sf_dir)
    path = session_artifact(
        _MEDIA_CORPUS,
        key,
        build,
        # a stale session's corpus dir is plain disk — reclaim it now
        # instead of waiting for the atexit sweep
        evict=lambda p: shutil.rmtree(p, ignore_errors=True),
    )
    return spark.read.parquet(path)


def drop_media_corpus(spark: SparkSession) -> None:
    """Release this session's at-rest media corpora (tests/CLI teardown)."""
    app = spark.sparkContext.applicationId
    for key in [k for k in _MEDIA_CORPUS if k[0] == app]:
        shutil.rmtree(_MEDIA_CORPUS.pop(key), ignore_errors=True)


def _media_kind(spark: SparkSession, sf_dir: str, kind: str) -> DataFrame:
    return shared_media_corpus(spark, sf_dir).filter(F.col("kind") == kind)


def _ordered_features(df: DataFrame, *keys: str) -> DataFrame:
    """Total-order a NARROW kernel output without re-running the Arrow
    decode stage. A bare ``orderBy`` over a mapInPandas pipeline plans
    RangePartitioning, whose boundary-sampling job RE-EXECUTES the
    child — the whole decode runs twice (measured 2.6 s vs 1.2 s on
    ``media_video_frame_sample`` at sf0.1; aggregated consumers don't
    pay this because the agg's shuffle files are reused by the sample
    job). ``localCheckpoint(eager=False)`` truncates the lineage at the
    few-bytes-per-row feature frame, so the sample pass reads the
    materialized rows instead. At cluster scale the checkpoint is
    |rows| × ~20 B on executor storage; a lost executor forces a
    recompute of the full query (acceptable for an interactive result
    sort — pipelines that re-consume the frames downstream should
    persist to reliable storage instead)."""
    return df.localCheckpoint(eager=False).orderBy(*keys)

# DuckDB twin of the media derivation in media_from_documents: digest,
# kind and metadata are pure functions of doc_id. Image rows with
# media_id % 6 = 3 are baseline JPEG (8×8-constant md5 tiles); the rest
# of kind_idx 0 is PNG (16-byte md5 row tiling).
_MEDIA_CTE = """
    media AS (
        SELECT doc_id AS media_id,
               doc_id % 3 AS kind_idx,
               md5('media:' || CAST(doc_id AS VARCHAR)) AS h,
               CAST(64 + (doc_id % 4) * 32 AS INTEGER) AS width,
               CAST(48 + (doc_id % 3) * 16 AS INTEGER) AS height,
               CAST(1000 * (1 + doc_id % 5) AS INTEGER) AS duration_ms
        FROM documents
    )
"""

# sum of the 16 decoded bytes == sum of the digest's hex pairs
_LUMA_SUM = " + ".join(
    f"('0x' || substr(h, {2 * i + 1}, 2))::BIGINT" for i in range(16)
)

# sum of squared bytes of an md5 digest column h2 (hex pairs squared)
_SUMSQ = " + ".join(
    f"(('0x' || substr(h2, {2 * i + 1}, 2))::BIGINT"
    f" * ('0x' || substr(h2, {2 * i + 1}, 2))::BIGINT)"
    for i in range(16)
)


@query(
    "media_image_features",
    oracle=f"""
    WITH {_MEDIA_CTE},
    png AS (
      SELECT media_id, width, height,
             ({_LUMA_SUM}) / 16.0 AS mean_luma,
             ('0x' || substr(h, 1, 15))::BIGINT AS phash
      FROM media WHERE kind_idx = 0 AND media_id % 6 <> 3
    ),
    jm AS (
      SELECT m.media_id,
             CAST(sum(('0x' || substr(m.h,
                  2 * CAST(b.b % 16 AS INTEGER) + 1, 2))::BIGINT)
               AS BIGINT) AS s,
             count(*) AS nb
      FROM media m,
           UNNEST(range(0, CAST((m.width // 8) * (m.height // 8) AS BIGINT)))
             AS b(b)
      WHERE m.kind_idx = 0 AND m.media_id % 6 = 3
      GROUP BY 1
    ),
    jpeg AS (
      SELECT m.media_id, m.width, m.height,
             (jm.s * 64) / (jm.nb * 64.0) AS mean_luma,
             ('0x' || substr(repeat(substr(m.h, 1, 2), 8), 1, 15))::BIGINT
               AS phash
      FROM media m JOIN jm ON m.media_id = jm.media_id
    )
    SELECT * FROM png UNION ALL SELECT * FROM jpeg
    """,
    tags=("multimodal", "mapInPandas", "jpeg"),
)
def media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image feature extraction over REAL mixed-format container bytes:
    the corpus alternates PNG (zlib inflate + unfilter) and baseline
    JPEG (huffman + dequant + IDCT, operators/jpeg.py) images; the
    kernel dispatches decode on ``meta.format`` and measures the pixel
    plane — (width, height, mean_luma, phash) — via Arrow-batched
    mapInPandas. Means are true means of the decoded luma planes; the
    oracle reproduces both branches because PNG pixels tile the md5
    digest row-wise while JPEG pixels are 8×8-constant digest tiles
    whose flat-table round-trip is bit-exact. Payloads come from the
    at-rest corpus (:func:`shared_media_corpus`): a kind-pruned
    parquet scan of real container bytes, not a fresh encode."""
    media = _media_kind(spark, sf_dir, "image")
    return _ordered_features(
        extract_image_features(media, fake=False), "media_id"
    )


# ------------------------------------------------ resized-image oracle
#
# Corpus images are H=48 rows of the identical 16-byte md5 tile (width
# is a multiple of 16, so pixel(r,c) = digest[c % 16] for every row).
# Nearest-neighbour resize to (32, 24) therefore yields, per target
# column c2, source column (c2*W)//32 — a position in the digest that
# depends only on W = 64 + (media_id % 4)*32. That makes the resized
# image's true pixel mean and leading-16-pixel fingerprint exact SQL
# expressions, CASE'd over the four source widths.
RESIZE_W, RESIZE_H = 32, 24


def _resized_positions(w_src: int, n: int) -> list[int]:
    return [((c2 * w_src) // RESIZE_W) % 16 for c2 in range(n)]


def _resized_mean_sql() -> str:
    cases = []
    for k in range(4):
        w_src = 64 + k * 32
        s = " + ".join(
            f"('0x' || substr(h, {2 * p + 1}, 2))::BIGINT"
            for p in _resized_positions(w_src, RESIZE_W)
        )
        cases.append(f"WHEN media_id % 4 = {k} THEN ({s}) / {RESIZE_W}.0")
    return "CASE " + " ".join(cases) + " END"


def _resized_phash_sql() -> str:
    cases = []
    for k in range(4):
        w_src = 64 + k * 32
        hexcat = " || ".join(
            f"substr(h, {2 * p + 1}, 2)" for p in _resized_positions(w_src, 16)
        )
        cases.append(
            f"WHEN media_id % 4 = {k} THEN "
            f"('0x' || substr({hexcat}, 1, 15))::BIGINT"
        )
    return "CASE " + " ".join(cases) + " END"


@query(
    "media_resize_features",
    oracle=f"""
    WITH {_MEDIA_CTE}
    SELECT media_id,
           CAST({RESIZE_W} AS INTEGER) AS width,
           CAST({RESIZE_H} AS INTEGER) AS height,
           {_resized_mean_sql()} AS mean_luma,
           {_resized_phash_sql()} AS phash
    FROM media WHERE kind_idx = 0 AND media_id % 6 <> 3
    """,
    tags=("multimodal", "transform-chain", "mapInPandas"),
)
def media_resize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full REAL image transform chain, every hop through actual
    container bytes: corpus PNG → decode → nearest-neighbour resample
    to 32×24 → re-encode PNG → decode again → measure the resized
    pixel plane (the corpus's JPEG images run the same chain in
    ``media_jpeg_transcode``). The oracle recomputes the resized mean
    and fingerprint from the tiling geometry (CASE over the four
    source widths), so the driver hash-verifies that the resample
    moved the pixels it claims to move — a chained-transform guarantee
    no single-stage query gives.

    Scale: two Arrow-batched mapInPandas stages back-to-back with no
    shuffle between them (partition pruning to the image kind before
    the first); payloads shrink 4-25x at the resize hop, and only
    scalar features leave the second stage."""
    media = _media_kind(spark, sf_dir, "image").filter(
        F.col("meta.format") == "png"
    )
    resized = resize_images(media, RESIZE_W, RESIZE_H, fake=False)
    return _ordered_features(
        extract_image_features(resized, fake=False), "media_id"
    )


def _jpeg_resized_phash_sql() -> str:
    """First-16-resized-pixel fingerprint of a transcoded JPEG image:
    resized pixel (0, c2) comes from source block column
    ((c2·W_src)//32)//8, whose constant value is digest byte
    (block % 16) — CASE over the source widths (jpeg media_ids are odd
    multiples of 3, so only widths 96 and 160 occur; all four cased for
    symmetry with the png helper)."""
    cases = []
    for k in range(4):
        w_src = 64 + k * 32
        positions = [
            (((c2 * w_src) // RESIZE_W) // 8) % 16 for c2 in range(16)
        ]
        hexcat = " || ".join(f"substr(h, {2 * p + 1}, 2)" for p in positions)
        cases.append(
            f"WHEN media_id % 4 = {k} THEN "
            f"('0x' || substr({hexcat}, 1, 15))::BIGINT"
        )
    return "CASE " + " ".join(cases) + " END"


@query(
    "media_jpeg_transcode",
    oracle=f"""
    WITH {_MEDIA_CTE},
    j AS (
      SELECT media_id, h, width, height FROM media
      WHERE kind_idx = 0 AND media_id % 6 = 3
    ),
    grid AS (
      SELECT j.media_id, j.h,
             ((r.r2 * j.height) // {RESIZE_H}) // 8 AS br,
             ((c.c2 * j.width) // {RESIZE_W}) // 8 AS bc,
             j.width // 8 AS bpr
      FROM j,
           UNNEST(range(0, {RESIZE_H})) AS r(r2),
           UNNEST(range(0, {RESIZE_W})) AS c(c2)
    ),
    jm AS (
      SELECT media_id,
             CAST(sum(('0x' || substr(h,
                  2 * CAST((br * bpr + bc) % 16 AS INTEGER) + 1,
                  2))::BIGINT) AS BIGINT) AS s
      FROM grid GROUP BY 1
    )
    SELECT j.media_id,
           CAST({RESIZE_W} AS INTEGER) AS width,
           CAST({RESIZE_H} AS INTEGER) AS height,
           jm.s / {RESIZE_W * RESIZE_H}.0 AS mean_luma,
           {_jpeg_resized_phash_sql()} AS phash
    FROM j JOIN jm USING (media_id)
    """,
    tags=("multimodal", "jpeg", "transcode", "transform-chain"),
)
def media_jpeg_transcode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG → PNG transcode chain over real compressed bytes: decode
    the corpus's baseline-JPEG images (huffman + dequant + IDCT),
    nearest-neighbour resample to 32×24, re-encode as PNG (the
    format-normalization step every mixed-format ingest runs), decode
    the PNG again and measure — so a green hash row proves the JPEG
    entropy decoder, the resampler and the PNG round-trip agree on
    every moved pixel. The oracle recomputes the resized mean from the
    8×8-block tiling geometry (a 32×24 UNNEST grid over source block
    coordinates) and the fingerprint from the block columns under each
    source width.

    Scale: identical plan shape to ``media_resize_features`` — a
    format-pruned scan of the at-rest corpus into two back-to-back
    Arrow stages, no shuffle until the final order; payloads shrink at
    the resize hop and only scalar features leave the second stage."""
    media = _media_kind(spark, sf_dir, "image").filter(
        F.col("meta.format") == "jpeg"
    )
    resized = resize_images(media, RESIZE_W, RESIZE_H, fake=False)
    return _ordered_features(
        extract_image_features(resized, fake=False), "media_id"
    )


@query(
    "media_video_frame_sample",
    oracle=f"""
    WITH {_MEDIA_CTE}
    SELECT media_id,
           CAST(ms // 500 AS INTEGER) AS frame_idx,
           CAST(ms AS INTEGER) AS frame_ms,
           CASE WHEN media_id % 12 = 5
                THEN ('0x' || repeat(substr(
                       md5('frame:' || h || ':' || CAST(ms AS VARCHAR)),
                       1, 2), 4))::BIGINT
                WHEN media_id % 12 = 11
                THEN (('0x' || substr(
                       md5('frame:' || h || ':' || CAST(ms AS VARCHAR)),
                       1, 2))::BIGINT // 2 + 64) * 16843009
                ELSE ('0x' || substr(
                       md5('frame:' || h || ':' || CAST(ms AS VARCHAR)),
                       1, 8))::BIGINT END AS frame_fp
    FROM media, UNNEST(range(0, duration_ms, 500)) AS t(ms)
    WHERE kind_idx = 2
    """,
    tags=("multimodal", "fan-out", "mjpeg"),
)
def media_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling fan-out over REAL mixed-container streams —
    uncompressed Y4M, Motion-JPEG AVI (every frame through the baseline
    JPEG decoder, operators/avi.py) and P-frame delta AVI (inter-frame
    reconstruction, operators/pframe.py) — one row → duration/500ms
    decoded frames with a per-frame content fingerprint; frame payloads
    are skipped inside the kernel, so the binaries never cross the
    shuffle. The oracle CASEs the fingerprint on format: Y4M frames
    tile the per-frame digest row-wise (leading 4 bytes = digest
    prefix), MJPEG frames are 8×8-constant tiles (leading 4 pixels all
    equal the digest's first byte), P-frame tiles map the byte into
    [64, 191] (the ±127 residual-range content guarantee)."""
    media = _media_kind(spark, sf_dir, "video")
    frames = sample_frames(media, every_ms=500, fake=False, with_payload=False)
    return _ordered_features(
        frames.select("media_id", "frame_idx", "frame_ms", "frame_fp"),
        "media_id",
        "frame_idx",
    )


@query(
    "media_pframe_frames",
    oracle=f"""
    WITH {_MEDIA_CTE}
    SELECT media_id,
           CAST(ms // 500 AS INTEGER) AS frame_idx,
           CAST(ms AS INTEGER) AS frame_ms,
           (('0x' || substr(
               md5('frame:' || h || ':' || CAST(ms AS VARCHAR)),
               1, 2))::BIGINT // 2 + 64) * 16843009 AS frame_fp
    FROM media, UNNEST(range(0, duration_ms, 500)) AS t(ms)
    WHERE kind_idx = 2 AND media_id % 12 = 11
    """,
    tags=("multimodal", "video", "pframe", "inter-frame"),
)
def media_pframe_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame extraction from INTER-frame (P-frame delta) video alone —
    the compressed-video twin of ``media_adpcm_chunks``'s role for
    audio: a format-pruned scan of the at-rest corpus where every
    decoded frame past the I-frame is reconstructed by adding its
    JPEG-coded residual to the previous frame
    (operators/pframe.py). The per-frame fingerprints hash-match the
    md5 oracle because the corpus's constant-tile content keeps the
    whole prediction chain bit-exact (residual range guaranteed by the
    [64, 191] content map).

    Scale: partition pruning on kind + a format predicate into one
    Arrow decode stage; reconstruction state is per-payload (a video's
    frames never span rows), so the kernel stays embarrassingly
    parallel across media ids."""
    media = _media_kind(spark, sf_dir, "video").filter(
        F.col("meta.format") == "pframe"
    )
    frames = sample_frames(media, every_ms=500, fake=False, with_payload=False)
    return _ordered_features(
        frames.select("media_id", "frame_idx", "frame_ms", "frame_fp"),
        "media_id",
        "frame_idx",
    )


@query(
    "media_audio_chunks",
    oracle=f"""
    WITH {_MEDIA_CTE},
    chunks AS (
        SELECT media_id, duration_ms,
               md5('rms:' || h || ':' || CAST(ms AS VARCHAR)) AS h2
        FROM media, UNNEST(range(0, duration_ms, 250)) AS t(ms)
        WHERE kind_idx = 1 AND media_id % 6 <> 4
    ),
    energies AS (
        SELECT media_id, duration_ms, 250 * ({_SUMSQ}) AS energy
        FROM chunks
    )
    SELECT media_id,
           count(*) AS n_chunks,
           CAST(max(duration_ms) AS INTEGER) AS duration_ms,
           CAST(floor(avg(energy)) AS BIGINT) AS mean_energy
    FROM energies GROUP BY media_id
    """,
    tags=("multimodal", "audio", "fan-out"),
)
def media_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing fan-out over REAL PCM-WAV payloads (one row →
    duration/250ms chunk rows): decode the 8-bit PCM stream, compute
    each window's exact sum-of-squares energy, then a per-media
    roll-up (chunk count + mean energy) — the ingest-segmentation
    stage of a speech pipeline plus its QA summary. Energy is an exact
    integer so the decoded measurement and the md5 oracle agree
    bit-for-bit (each 250 ms window tiles one md5 block: window sumsq
    = 250 × sumsq(digest bytes)). The corpus's compressed (IMA-ADPCM)
    audio runs the same chain in ``media_adpcm_chunks``."""
    media = _media_kind(spark, sf_dir, "audio").filter(
        F.col("meta.format") == "wav"
    )
    chunks = chunk_audio(media, window_ms=250, fake=False)
    return (
        chunks.groupBy("media_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.max("end_ms").alias("duration_ms"),
            F.floor(F.avg("energy")).cast("long").alias("mean_energy"),
        )
        .orderBy("media_id")
    )


@query(
    "media_adpcm_chunks",
    oracle=f"""
    WITH {_MEDIA_CTE},
    chunks AS (
        SELECT media_id, duration_ms,
               ('0x' || substr(md5('rms:' || h || ':' || CAST(ms AS VARCHAR)),
                               1, 2))::BIGINT AS b0
        FROM media, UNNEST(range(0, duration_ms, 250)) AS t(ms)
        WHERE kind_idx = 1 AND media_id % 12 = 4
    ),
    energies AS (
        SELECT media_id, duration_ms,
               4000 * ((b0 - 128) * 256) * ((b0 - 128) * 256) AS energy
        FROM chunks
    )
    SELECT media_id,
           count(*) AS n_chunks,
           CAST(max(duration_ms) AS INTEGER) AS duration_ms,
           CAST(floor(avg(energy)) AS BIGINT) AS mean_energy
    FROM energies GROUP BY media_id
    """,
    tags=("multimodal", "audio", "adpcm", "compressed", "fan-out"),
)
def media_adpcm_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPRESSED-audio twin of ``media_audio_chunks``: decode the
    corpus's IMA-ADPCM WAV payloads (4-bit nibbles → 16-bit PCM via the
    standard step/index tables, operators/adpcm.py), window the decoded
    stream at 250 ms, and roll up exact integer energies per media row.
    Corpus adpcm content is one constant md5-seeded int16 value per
    window — the shape whose ADPCM round-trip is bit-exact (the block
    header carries sample 0 verbatim and zero deltas stay zero at step
    index 0) — so the oracle recomputes every decoded window energy as
    ``4000·((b₀−128)·256)²`` from the same md5 seeds, and the driver
    hash-verifies the real nibble-decode path end-to-end.

    Scale: identical plan to the PCM twin — format-pruned scan of the
    at-rest corpus, one Arrow decode stage emitting scalar features
    only, one grouped roll-up."""
    media = _media_kind(spark, sf_dir, "audio").filter(
        F.col("meta.format") == "adpcm"
    )
    chunks = chunk_audio(media, window_ms=250, fake=False)
    return (
        chunks.groupBy("media_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.max("end_ms").alias("duration_ms"),
            F.floor(F.avg("energy")).cast("long").alias("mean_energy"),
        )
        .orderBy("media_id")
    )


@query(
    "media_mdct_chunks",
    oracle=f"""
    WITH {_MEDIA_CTE},
    chunks AS (
        SELECT media_id, duration_ms,
               ('0x' || substr(md5('rms:' || h || ':' || CAST(ms AS VARCHAR)),
                               1, 2))::BIGINT AS b0
        FROM media, UNNEST(range(0, duration_ms, 250)) AS t(ms)
        WHERE kind_idx = 1 AND media_id % 12 = 10
    ),
    energies AS (
        SELECT media_id, duration_ms,
               4000 * ((b0 - 128) * 256) * ((b0 - 128) * 256) AS energy
        FROM chunks
    )
    SELECT media_id,
           count(*) AS n_chunks,
           CAST(max(duration_ms) AS INTEGER) AS duration_ms,
           CAST(floor(avg(energy)) AS BIGINT) AS mean_energy
    FROM energies GROUP BY media_id
    """,
    tags=("multimodal", "audio", "mdct", "transform", "compressed", "fan-out"),
)
def media_mdct_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRANSFORM-audio twin of ``media_adpcm_chunks``: decode the
    corpus's MDCT-coded payloads (lapped-transform filterbank +
    per-band bit allocation, operators/mdct.py — the AAC/Vorbis
    structure minus the native-library entropy/psychoacoustic stage),
    window the reconstructed int16 stream at 250 ms, and roll up exact
    integer energies. The corpus's constant-per-window content
    round-trips bit-exactly at the codec's near-lossless default step
    (coefficient-rounding error bounded far below half an int16 LSB),
    so the oracle recomputes every decoded window energy from the md5
    seeds and the driver hash-verifies the full MDCT synthesis path —
    overlap-add, dequantization, bit-unpacking — end to end.

    Scale: identical plan to the other audio twins — format-pruned
    scan of the at-rest corpus, one vectorized Arrow decode stage
    emitting scalar features only, one grouped roll-up."""
    media = _media_kind(spark, sf_dir, "audio").filter(
        F.col("meta.format") == "mdct"
    )
    chunks = chunk_audio(media, window_ms=250, fake=False)
    return (
        chunks.groupBy("media_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.max("end_ms").alias("duration_ms"),
            F.floor(F.avg("energy")).cast("long").alias("mean_energy"),
        )
        .orderBy("media_id")
    )
