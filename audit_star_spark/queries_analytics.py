"""Driver-gate queries for the LLM-data-pipeline layer (dedup, similarity,
text analysis, multimodal), each paired with a DuckDB oracle that mirrors
the Spark expression algebra in DuckDB dialect.

Dialect mapping (kept 1:1 so both sides stay reviewably in sync):

  Spark                                DuckDB
  -----                                ------
  sequence(a,b) (0-based arr[i])       generate_series(a,b) (1-based arr[i])
  size / transform / aggregate(z,..)   len / list_transform / list_reduce
                                       (seed via list_concat([init], xs))
  conv(substring(md5(t),1,15),16,10)   ('0x' || substr(md5(t),1,15))::BIGINT
  regexp_replace(s, p, r)  [global]    regexp_replace(s, p, r, 'g')
  a ^ b (xor), a div b                 xor(a, b), a // b
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from audit_star_spark.analytics import (
    bpe,
    decontam,
    dedup,
    multimodal,
    quality,
    similarity,
    text,
)
from audit_star_spark.sources.testdata import load_table

# ---------------------------------------------------------------- DuckDB
# dialect fragments mirroring analytics/text.py and analytics/dedup.py
D_TOKENS = r"regexp_split_to_array(trim(lower(text)), '\s+')"
D_TOK_HASHES = (
    f"list_transform({D_TOKENS}, t -> ('0x' || substr(md5(t), 1, 15))::BIGINT)"
)
D_SHINGLES = (
    f"CASE WHEN len({D_TOKENS}) >= 3 THEN "
    f"list_transform(generate_series(1, len({D_TOKENS}) - 2), "
    f"i -> {D_TOKENS}[i] || ' ' || {D_TOKENS}[i+1] || ' ' || {D_TOKENS}[i+2]) "
    f"ELSE [] END"
)
D_VEC = "list_transform(embedding, x -> CAST(x AS DOUBLE))"


def d_fold(xs: str, init: str, lam: str) -> str:
    """DuckDB left fold with explicit seed (Spark aggregate equivalent)."""
    return f"list_reduce(list_concat([{init}], {xs}), {lam})"


def d_dot(a: str, b: str) -> str:
    return d_fold(
        f"list_transform(list_zip({a}, {b}), x -> x[1] * x[2])",
        "CAST(0.0 AS DOUBLE)",
        "(s, v) -> s + v",
    )


def _sw(words: list[str]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


# ------------------------------------------------------------ text stats
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.with_text_stats(load_table(spark, sf_dir, "documents"))


SQL_TEXT_STATS = f"""
WITH base AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len({D_TOKENS}) AS BIGINT) AS n_tokens,
         CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS BIGINT) AS n_punct,
         CAST(len(regexp_extract_all(lower(text), '{_sw(text.STOPWORDS)}', 0)) AS BIGINT) AS n_stopwords,
         {d_fold(f"list_transform({D_TOKENS}, t -> length(t))", "0", "(a, t) -> a + t")} AS tok_chars
  FROM documents
)
SELECT doc_id, n_chars, n_tokens, n_punct, n_stopwords,
       CAST(tok_chars AS DOUBLE) / n_tokens AS avg_token_len,
       CAST(n_stopwords AS DOUBLE) / n_tokens AS stopword_ratio,
       CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
       greatest(n_tokens, CAST(ceil(n_chars / 4.0) AS BIGINT)) AS est_bpe_tokens,
       least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
         * (1.0 - CAST(n_punct AS DOUBLE) / n_chars)
         * (0.5 + CAST(n_stopwords AS DOUBLE) / n_tokens) AS quality_score
FROM base
"""


# ------------------------------------------------------------ language ID
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.with_lang_id(load_table(spark, sf_dir, "documents"))


def _lang_sql() -> str:
    langs = list(text.LANG_MARKERS)
    hit_cols = ",\n         ".join(
        f"CAST(len(regexp_extract_all(lower(text), '{_sw(text.LANG_MARKERS[l])}', 0)) AS BIGINT) AS hits_{l}"
        for l in langs
    )
    # same argmax cascade + tiebreak order as analytics/text.with_lang_id
    best, best_hits = f"'{langs[0]}'", f"hits_{langs[0]}"
    for lang in langs[1:]:
        best = f"CASE WHEN hits_{lang} > {best_hits} THEN '{lang}' ELSE {best} END"
        best_hits = f"CASE WHEN hits_{lang} > {best_hits} THEN hits_{lang} ELSE {best_hits} END"
    return f"""
WITH h AS (
  SELECT doc_id, lang AS labeled_lang,
         {hit_cols}
  FROM documents
)
SELECT doc_id, labeled_lang, {', '.join(f'hits_{l}' for l in langs)},
       CASE WHEN {best_hits} > 0 THEN {best} ELSE 'unknown' END AS pred_lang
FROM h
"""


# -------------------------------------------------------- fingerprinting
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.with_fingerprint(load_table(spark, sf_dir, "documents"))


SQL_FINGERPRINT = f"""
SELECT doc_id,
       {d_fold(D_TOK_HASHES, "CAST(0 AS BIGINT)",
               f"(h, t) -> (h * 31 + t % {text.FP_PRIME}) % {text.FP_PRIME}")} AS fingerprint
FROM documents
"""


# ------------------------------------------------------------ exact dedup
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(load_table(spark, sf_dir, "documents"))


SQL_DEDUP_EXACT = r"""
SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS content_hash,
       MIN(doc_id) AS canonical_doc_id,
       COUNT(*) AS n_dups
FROM documents
GROUP BY 1
"""


# ------------------------------------------------------- minhash LSH dedup
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))


def _minhash_sql_clean(threshold: float = 0.7) -> str:
    mh = ",\n         ".join(
        f"list_min(list_transform(shash, h -> ({dedup.MH_A[j]} * h + {dedup.MH_B[j]}) % {dedup.MH_P})) AS mh_{j}"
        for j in range(dedup.N_PERMS)
    )
    bands = ",\n         ".join(
        "md5("
        + " || '|' || ".join(
            f"CAST(mh_{j} AS VARCHAR)"
            for j in range(b * dedup.ROWS_PER_BAND, (b + 1) * dedup.ROWS_PER_BAND)
        )
        + f") AS band_{b}"
        for b in range(dedup.N_BANDS)
    )
    band_union = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, {b} AS band, band_{b} AS key FROM bands WHERE band_{b} IS NOT NULL"
        for b in range(dedup.N_BANDS)
    )
    return f"""
WITH docs_sh AS (
  SELECT doc_id, {D_SHINGLES} AS shingles,
         list_transform({D_SHINGLES},
           s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % {dedup.MH_P}) AS shash
  FROM documents
),
sig AS (
  SELECT doc_id, shingles,
         {mh}
  FROM docs_sh
),
bands AS (
  SELECT doc_id,
         {bands}
  FROM sig
),
buckets AS (
  {band_union}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id
),
sets AS (
  -- verification over 60-bit shingle hashes, mirroring the engine
  SELECT doc_id, list_distinct(shash) AS sset FROM docs_sh
),
verified AS (
  SELECT doc_a, doc_b,
         CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE)
           / (len(sa.sset) + len(sb.sset) - len(list_intersect(sa.sset, sb.sset))) AS jaccard
  FROM cand
  JOIN sets sa ON sa.doc_id = doc_a
  JOIN sets sb ON sb.doc_id = doc_b
)
SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= {threshold}
"""


# ---------------------------------------------- n-gram Jaccard (inverted)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))


def _ngram_jaccard_sql(threshold: float = 0.5) -> str:
    return f"""
WITH docs_sh AS (
  SELECT doc_id,
         list_sort(list_distinct(list_transform({D_SHINGLES},
           s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % {dedup.MH_P}))) AS sset
  FROM documents
),
-- hash-order PPJoin prefix (mirrors the engine): first
-- len - ceil(t*len) + 1 elements of the SORTED shingle-hash set
prefix AS (
  SELECT doc_id, len(sset) AS sz,
         unnest(list_slice(sset, 1,
           len(sset) - CAST(ceil({threshold} * len(sset)) AS INT) + 1)) AS sh
  FROM docs_sh
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM prefix a JOIN prefix b
    ON a.sh = b.sh
   AND a.doc_id < b.doc_id
   AND least(a.sz, b.sz) >= ceil({threshold} * greatest(a.sz, b.sz))
),
v AS (
  SELECT doc_a, doc_b,
         CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE)
           / (len(sa.sset) + len(sb.sset) - len(list_intersect(sa.sset, sb.sset))) AS jaccard
  FROM cand
  JOIN docs_sh sa ON sa.doc_id = doc_a
  JOIN docs_sh sb ON sb.doc_id = doc_b
)
SELECT doc_a, doc_b, jaccard FROM v WHERE jaccard >= {threshold}
"""


# ------------------------------------------- dedup clusters (iterative CC)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))
    return dedup.dedup_clusters(pairs)


def _clusters_sql() -> str:
    """Connected components as a recursive reachability CTE (UNION dedup
    terminates cycles); min reachable vertex = cluster id."""
    return f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({_ngram_jaccard_sql()})
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
verts AS (
  SELECT DISTINCT src AS v FROM edges
),
reach(src, dst) AS (
  SELECT v, v FROM verts
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id, MIN(dst) AS cluster_id
FROM reach GROUP BY src
"""

def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_keep_canonical(load_table(spark, sf_dir, "documents"))


def _dedup_canonical_sql() -> str:
    """Canonical-keep over the SAME recursive-CTE clusters the
    dedup_clusters oracle uses: a member is dropped iff it is not its
    cluster's minimum doc_id."""
    return f"""
WITH cl AS ({_clusters_sql()}),
dropped AS (SELECT doc_id FROM cl WHERE doc_id <> cluster_id)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(dr.doc_id) AS BIGINT) AS n_dropped,
       CAST(COUNT(*) - COUNT(dr.doc_id) AS BIGINT) AS n_kept
FROM documents d LEFT JOIN dropped dr ON d.doc_id = dr.doc_id
GROUP BY d.source
"""

def q_url_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization census over deterministically synthesized
    variant spellings (the corpus has no URL column): the uppercased /
    default-port / tracking-param / fragment spelling and its canonical
    twin MUST collapse to one url_norm key (n_spellings = 2 for those
    groups)."""
    from audit_star_spark.analytics.html import url_census

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    m = lambda k: (F.col("doc_id") % k).cast("string")  # noqa: E731
    urls = d.select(
        "doc_id",
        F.explode(
            F.array(
                F.concat(
                    F.lit("HTTP://Site"), m(7), F.lit(".COM:80/p"), m(3),
                    F.lit("?utm_source=a&id="), m(5), F.lit("#frag"),
                ),
                F.concat(
                    F.lit("http://site"), m(7), F.lit(".com/p"), m(3),
                    F.lit("?id="), m(5),
                ),
                F.concat(F.lit("https://Host"), m(4), F.lit(".io:443")),
                F.concat(F.lit("/rel/"), m(6), F.lit("#x")),
            )
        ).alias("url"),
    )
    return url_census(urls)


_D_URL_RE = "^[A-Za-z][A-Za-z0-9+.\\-]*://"

SQL_URL_NORMALIZATION = f"""
WITH urls AS (
  SELECT doc_id, unnest([
    'HTTP://Site' || (doc_id % 7) || '.COM:80/p' || (doc_id % 3)
      || '?utm_source=a&id=' || (doc_id % 5) || '#frag',
    'http://site' || (doc_id % 7) || '.com/p' || (doc_id % 3)
      || '?id=' || (doc_id % 5),
    'https://Host' || (doc_id % 4) || '.io:443',
    '/rel/' || (doc_id % 6) || '#x'
  ]) AS url FROM documents
),
n0 AS (SELECT url, regexp_replace(url, '#.*$', '') AS u FROM urls),
n1 AS (SELECT url, u,
        lower(regexp_extract(u, '{_D_URL_RE.replace("://", "")}://', 0)) AS scheme_raw,
        lower(regexp_extract(u, '({_D_URL_RE.replace("://", "")})://', 1)) AS scheme,
        lower(regexp_extract(u, '{_D_URL_RE}([^/?#]+)', 1)) AS auth0,
        regexp_replace(u, '{_D_URL_RE}[^/?#]+', '') AS rest
       FROM n0),
n2 AS (SELECT url, u, scheme, rest,
        CASE WHEN scheme = 'http' THEN regexp_replace(auth0, ':80$', '')
             WHEN scheme = 'https' THEN regexp_replace(auth0, ':443$', '')
             ELSE auth0 END AS auth,
        CASE WHEN regexp_extract(rest, '^([^?]*)', 1) = '' THEN '/'
             ELSE regexp_extract(rest, '^([^?]*)', 1) END AS path,
        regexp_extract(rest, '\\?(.*)$', 1) AS query
       FROM n1),
n3 AS (SELECT url, u, scheme, auth, path,
        array_to_string(list_filter(string_split(query, '&'),
          p -> NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid)(=|$)')
               AND p <> ''), '&') AS fq
       FROM n2),
n4 AS (SELECT url,
        CASE WHEN scheme = '' THEN u
             ELSE scheme || '://' || auth || path
                  || CASE WHEN fq <> '' THEN '?' || fq ELSE '' END
        END AS url_norm
       FROM n3)
SELECT url_norm,
       CAST(COUNT(*) AS BIGINT) AS n_raw,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_spellings
FROM n4 GROUP BY url_norm
"""

def q_cross_corpus_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A x B near-dup join over the even/odd doc_id halves of the corpus
    — the incremental-crawl / contamination shape (never self-joins
    either side)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.cross_corpus_near_dups(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
    )


def _cross_corpus_sql(threshold: float = 0.7) -> str:
    """Same signature pipeline as the self-join oracle; the candidate
    join pairs even-side buckets with odd-side buckets only."""
    mh = ",\n         ".join(
        f"list_min(list_transform(shash, h -> ({dedup.MH_A[j]} * h + {dedup.MH_B[j]}) % {dedup.MH_P})) AS mh_{j}"
        for j in range(dedup.N_PERMS)
    )
    bands = ",\n         ".join(
        "md5("
        + " || '|' || ".join(
            f"CAST(mh_{j} AS VARCHAR)"
            for j in range(b * dedup.ROWS_PER_BAND, (b + 1) * dedup.ROWS_PER_BAND)
        )
        + f") AS band_{b}"
        for b in range(dedup.N_BANDS)
    )
    band_union = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, {b} AS band, band_{b} AS key FROM bands WHERE band_{b} IS NOT NULL"
        for b in range(dedup.N_BANDS)
    )
    return f"""
WITH docs_sh AS (
  SELECT doc_id, {D_SHINGLES} AS shingles,
         list_transform({D_SHINGLES},
           s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % {dedup.MH_P}) AS shash
  FROM documents
),
sig AS (
  SELECT doc_id, shingles,
         {mh}
  FROM docs_sh
),
bands AS (
  SELECT doc_id,
         {bands}
  FROM sig
),
buckets AS (
  {band_union}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
),
sets AS (
  SELECT doc_id, list_distinct(shash) AS sset FROM docs_sh
),
verified AS (
  SELECT doc_a, doc_b,
         CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE)
           / (len(sa.sset) + len(sb.sset) - len(list_intersect(sa.sset, sb.sset))) AS jaccard
  FROM cand
  JOIN sets sa ON sa.doc_id = doc_a
  JOIN sets sb ON sb.doc_id = doc_b
)
SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= {threshold}
"""

def q_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-script census over a deterministically augmented corpus
    (the synthetic documents are pure ASCII, so per-doc_id suffixes plant
    Cyrillic / Han / extra-Latin runs the counters must see)."""
    from audit_star_spark.analytics.text import script_profile

    d = load_table(spark, sf_dir, "documents")
    suffix = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(" \u043f\u0440\u0438\u0432\u0435\u0442 \u043c\u0438\u0440"))
        .when(F.col("doc_id") % 3 == 1, F.lit(" \u4f60\u597d\u4e16\u754c"))
        .otherwise(F.lit(" salve mundi"))
    )
    aug = d.select("doc_id", F.concat(F.col("text"), suffix).alias("text"))
    return script_profile(aug)


def _script_profile_sql() -> str:
    from audit_star_spark.analytics.text import SCRIPT_CLASSES

    cyr = " \u043f\u0440\u0438\u0432\u0435\u0442 \u043c\u0438\u0440"
    han = " \u4f60\u597d\u4e16\u754c"
    counts = ",\n       ".join(
        f"CAST(length(regexp_replace(text, '[^\\p{{{re2}}}]', '', 'g')) AS BIGINT) AS n_{name}"
        for name, _, re2 in SCRIPT_CLASSES
    )
    # the engine's chained argmax resolves to: han iff it beats BOTH,
    # else cyrillic iff it beats latin, else latin; 'none' if all zero
    return f"""
WITH aug AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 3 = 0 THEN '{cyr}'
                      WHEN doc_id % 3 = 1 THEN '{han}'
                      ELSE ' salve mundi' END AS text
  FROM documents
),
c AS (
  SELECT doc_id,
       {counts}
  FROM aug
)
SELECT doc_id, n_latin, n_cyrillic, n_han,
       CASE WHEN n_latin = 0 AND n_cyrillic = 0 AND n_han = 0 THEN 'none'
            WHEN n_han > n_latin AND n_han > n_cyrillic THEN 'han'
            WHEN n_cyrillic > n_latin THEN 'cyrillic'
            ELSE 'latin' END AS dominant_script
FROM c
"""

def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from audit_star_spark.analytics.timeseries import retention_cohorts

    return retention_cohorts(load_table(spark, sf_dir, "events"))


SQL_RETENTION_COHORTS = """
WITH weekly AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
  FROM events
),
coh AS (
  SELECT user_id, MIN(week) AS cohort_week FROM weekly GROUP BY user_id
),
j AS (
  SELECT c.cohort_week,
         CAST(floor(epoch(w.week - c.cohort_week) / (7 * 24 * 3600)) AS INT)
           AS week_offset,
         w.user_id
  FROM weekly w JOIN coh c USING (user_id)
)
SELECT cohort_week, week_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM j WHERE week_offset <= 8 GROUP BY 1, 2
"""


def q_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from audit_star_spark.analytics.timeseries import rate_anomalies

    return rate_anomalies(load_table(spark, sf_dir, "events"))


# trailing-window z over the SAME dense resample the resample oracle
# builds; the window sees the |types| x |buckets| grid, never raw events
SQL_RATE_ANOMALIES = """
WITH agg AS (
  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT CAST(date_trunc('hour', MIN(ts)) AS TIMESTAMP) AS lo,
         CAST(date_trunc('hour', MAX(ts)) AS TIMESTAMP) AS hi FROM events
),
spine AS (
  SELECT t.event_type,
         CAST(unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS TIMESTAMP)
           AS bucket
  FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN bounds b
),
series AS (
  SELECT s.event_type, s.bucket,
         CAST(COALESCE(a.n, 0) AS DOUBLE) AS n
  FROM spine s LEFT JOIN agg a USING (event_type, bucket)
),
win AS (
  SELECT event_type, bucket, n,
         avg(n) OVER w AS mu,
         stddev_samp(n) OVER w AS sd,
         count(n) OVER w AS cnt
  FROM series
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, bucket,
       CAST(n AS BIGINT) AS n_events,
       CASE WHEN cnt >= 3 AND sd > 0 THEN round((n - mu) / sd, 9) END AS z_score,
       COALESCE(cnt >= 3 AND sd > 0 AND abs(round((n - mu) / sd, 9)) > 3.0,
                FALSE) AS is_anomaly
FROM win
"""

# --------------------------------------------------- video: MJPEG/AVI (r4)
def _synth_avi(spark_df):
    """doc_id-keyed MJPEG AVI synthesis (mapInPandas): nf = 2 + d%3
    single-tile 8x8 frames, frame f's value = (d*11 + f*17) % 256,
    fps = 5 + d%4 — tile-constant frames at quality=100 decode
    bit-exactly, so per-frame mean luma is hash-stable."""
    import pandas as pd  # noqa: F401

    from pyspark.sql import types as T

    from audit_star_spark.analytics.multimodal import encode_avi_mjpeg
    from audit_star_spark.util import spread

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                frames = [
                    np.full((8, 8, 1), (d * 11 + f * 17) % 256, dtype=np.uint8)
                    for f in range(2 + d % 3)
                ]
                payloads.append(encode_avi_mjpeg(frames, fps=5 + d % 4))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return spread(spark_df).mapInPandas(
        synth,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def q_video_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container parse through the gate: RIFF/AVI chunk walk
    (avih header + movi data chunks) over synthesized MJPEG payloads;
    the oracle states the header fields in closed form."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return multimodal.video_meta(_synth_avi(docs))


SQL_VIDEO_META = """
SELECT doc_id,
       'avi' AS container,
       CAST(8 AS INT) AS width,
       CAST(8 AS INT) AS height,
       round(1000000.0 / (1000000 // (5 + doc_id % 4)), 6) AS fps,
       CAST(2 + doc_id % 3 AS BIGINT) AS n_frames,
       CAST(2 + doc_id % 3 AS BIGINT) AS n_data_chunks
FROM documents
"""


def q_video_frame_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL per-frame decode through the gate: every 2nd MJPEG frame is
    decoded by the in-repo baseline JPEG decoder; tile-constant frames
    make mean_luma exactly the synthesized tile value."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return multimodal.video_frame_means(_synth_avi(docs), every_n=2)


SQL_VIDEO_FRAME_MEANS = """
WITH f AS (
  SELECT doc_id, unnest(generate_series(0, 1 + doc_id % 3)) AS frame_idx
  FROM documents
)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
       CAST((doc_id * 11 + frame_idx * 17) % 256 AS DOUBLE) AS mean_luma
FROM f WHERE frame_idx % 2 = 0
"""

def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.split_leakage_report(load_table(spark, sf_dir, "documents"))


def _split_leakage_sql() -> str:
    """Minhash pair oracle joined to the hash-split assignment."""
    return f"""
WITH pairs AS ({_minhash_sql_clean()}),
assigned AS (
  SELECT doc_id,
         CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
  FROM (SELECT doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
        FROM documents)
),
x AS (
  SELECT least(sa.split, sb.split) AS split_lo,
         greatest(sa.split, sb.split) AS split_hi
  FROM pairs p
  JOIN assigned sa ON sa.doc_id = p.doc_a
  JOIN assigned sb ON sb.doc_id = p.doc_b
  WHERE sa.split <> sb.split
)
SELECT split_lo, split_hi, CAST(COUNT(*) AS BIGINT) AS n_leaky_pairs
FROM x GROUP BY 1, 2
"""

def q_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compressibility per document — no DuckDB oracle exists (zlib
    is not SQL-expressible); the semantic lock lives in
    tests/test_oracle_parity.py (_SEMANTIC_CHECKS) and
    tests/test_quality.py."""
    return quality.compression_ratio(load_table(spark, sf_dir, "documents"))

_MIX_WEIGHTS = {"src0": 3.0, "src1": 2.0}  # others default 1.0


def q_resample_to_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing: upweight src0/src1, downsample-only — the binding
    source keeps 100% and every other source's deterministic hash keep
    rate follows the target proportions."""
    return text.resample_to_mix(
        load_table(spark, sf_dir, "documents"), weights=_MIX_WEIGHTS
    )


def _resample_mix_sql() -> str:
    w_case = "CASE WHEN source = 'src0' THEN 3.0 WHEN source = 'src1' THEN 2.0 ELSE 1.0 END"
    return f"""
WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
t AS (
  SELECT source, n,
         CAST(n AS DOUBLE) / SUM(n) OVER () AS share,
         {w_case} AS w
  FROM c
),
r0 AS (SELECT source, n, (w / SUM(w) OVER ()) / share AS raw_rate FROM t),
r AS (SELECT source, n, raw_rate / MAX(raw_rate) OVER () AS rate FROM r0),
kept AS (
  SELECT d.source, COUNT(*) AS n_kept
  FROM documents d JOIN r ON d.source = r.source
  WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000
        < CAST(round(r.rate * 1000000) AS BIGINT)
  GROUP BY d.source
)
SELECT r.source,
       CAST(r.n AS BIGINT) AS n_docs,
       round(r.rate, 9) AS rate,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM r LEFT JOIN kept k ON r.source = k.source
"""


# ------------------------------------------------------------- simhash
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_fingerprints(load_table(spark, sf_dir, "documents"))


_D_SIMHASH = (
    "list_reduce(list_concat([CAST(0 AS BIGINT)], generate_series(0, "
    + str(dedup.SIMHASH_BITS - 1)
    + ")), (acc, j) -> acc + CASE WHEN "
    + d_fold("tok_hashes", "CAST(0 AS BIGINT)",
             "(s, h) -> s + CASE WHEN (h >> j) % 2 = 1 THEN 1 ELSE -1 END")
    + " > 0 THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)"
)
_D_TH_CTE = f"th AS (SELECT doc_id, {D_TOK_HASHES} AS tok_hashes FROM documents)"

SQL_SIMHASH = f"WITH {_D_TH_CTE} SELECT doc_id, {_D_SIMHASH} AS simhash FROM th"


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_near_pairs(load_table(spark, sf_dir, "documents"))


# band spans generated from the SAME hamming_bands list the engine uses,
# so the pigeonhole blocking cannot drift between the two dialects
_D_SIMHASH_BANDS = " UNION ALL ".join(
    f"SELECT doc_id, simhash, {i} AS band, "
    f"(simhash >> {s}) & {(1 << w) - 1} AS val FROM fp"
    for i, (s, w) in enumerate(dedup.hamming_bands(dedup.SIMHASH_BITS, 8))
)

SQL_SIMHASH_PAIRS = f"""
WITH {_D_TH_CTE},
fp AS (
  SELECT doc_id, {_D_SIMHASH} AS simhash FROM th
),
bk AS (
  {_D_SIMHASH_BANDS}
)
SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b2.simhash)) AS INT) AS hamming
FROM bk a JOIN bk b2 ON a.band = b2.band AND a.val = b2.val
WHERE a.doc_id < b2.doc_id
  AND bit_count(xor(a.simhash, b2.simhash)) <= 8
"""


# ------------------------------------------------- similarity: brute force
def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.cosine_topk(load_table(spark, sf_dir, "embeddings"))


def _knn_sql(k: int, n_queries: int, bucketed: bool) -> str:
    bucket_terms = " + ".join(
        "(CASE WHEN "
        + d_fold(
            "list_transform(list_zip(vec, "
            f"list_transform(generate_series(0, len(vec) - 1), "
            f"d -> CASE WHEN ('0x' || substr(md5('{p}_' || d), 1, 15))::BIGINT % 2 = 1 "
            "THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)), x -> x[1] * x[2])",
            "CAST(0.0 AS DOUBLE)",
            "(s, v) -> s + v",
        )
        + f" >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(similarity.N_PLANES)
    )
    bucket_col = f", CAST({bucket_terms} AS INT) AS bucket" if bucketed else ""
    join_extra = "AND base.bucket = q.bucket" if bucketed else ""
    return f"""
WITH base AS (
  SELECT vec_id, label, {D_VEC} AS vec FROM embeddings
),
normed AS (
  SELECT vec_id, label, vec, sqrt({d_dot('vec', 'vec')}) AS norm{bucket_col}
  FROM base
),
q AS (
  SELECT vec_id AS query_id, vec AS qvec, norm AS qnorm
         {', bucket' if bucketed else ''}
  FROM normed WHERE vec_id < {n_queries}
),
scored AS (
  -- NOT isnan: mirrors the engine's _topk_per_query NaN guard (zero-norm
  -- vectors sort differently between Spark and DuckDB)
  SELECT * FROM (
    SELECT q.query_id, base.vec_id,
           {d_dot('q.qvec', 'base.vec')} / (q.qnorm * base.norm) AS cosine
    FROM normed base JOIN q ON base.vec_id <> q.query_id {join_extra}
  ) WHERE NOT isnan(cosine)
)
SELECT query_id, CAST(rank AS INT) AS rank, vec_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
)
WHERE rank <= {k}
"""


# ------------------------------------------------- similarity: LSH bucketed
def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.lsh_topk(load_table(spark, sf_dir, "embeddings"))


# ------------------------------------------------ per-label nearest neighbor
def q_label_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.label_nearest_neighbor(load_table(spark, sf_dir, "embeddings"))


SQL_LABEL_NN = f"""
WITH base AS (
  SELECT vec_id, label, {D_VEC} AS vec FROM embeddings
),
normed AS (
  SELECT vec_id, label, vec, sqrt({d_dot('vec', 'vec')}) AS norm FROM base
),
pairs AS (
  SELECT a.vec_id, a.label, b.vec_id AS nn_vec_id,
         {d_dot('a.vec', 'b.vec')} / (a.norm * b.norm) AS cosine
  FROM normed a JOIN normed b
    ON a.label = b.label AND a.vec_id <> b.vec_id
)
SELECT vec_id, label, nn_vec_id, cosine AS nn_cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY cosine DESC, nn_vec_id) AS rn
  FROM pairs
)
WHERE rn = 1
"""


# ------------------------------------------------- similarity: IVF probe
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ivf_topk(load_table(spark, sf_dir, "embeddings"))


def _ivf_sql(k: int = 5, n_queries: int = 8, n_cells: int = 16, n_probe: int = 4) -> str:
    return f"""
WITH base AS (
  SELECT vec_id, {D_VEC} AS vec FROM embeddings
),
normed AS (
  SELECT vec_id, vec, sqrt({d_dot('vec', 'vec')}) AS norm FROM base
),
cents AS (
  SELECT vec_id AS cell_id, vec AS cvec, norm AS cnorm
  FROM normed WHERE vec_id < {n_cells}
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY ccos DESC, cell_id) AS crank
  FROM (
    SELECT n.vec_id, n.vec, n.norm, c.cell_id,
           {d_dot('c.cvec', 'n.vec')} / (c.cnorm * n.norm) AS ccos
    FROM normed n CROSS JOIN cents c
  )
),
assigned AS (
  SELECT vec_id, vec, norm, cell_id FROM ranked WHERE crank = 1
),
probes AS (
  SELECT vec_id AS query_id, vec AS qvec, norm AS qnorm, cell_id AS pcell
  FROM ranked WHERE crank <= {n_probe} AND vec_id < {n_queries}
),
scored AS (
  SELECT p.query_id, a.vec_id,
         {d_dot('p.qvec', 'a.vec')} / (p.qnorm * a.norm) AS cosine
  FROM assigned a JOIN probes p
    ON a.cell_id = p.pcell AND a.vec_id <> p.query_id
)
SELECT query_id, CAST(rank AS INT) AS rank, vec_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
)
WHERE rank <= {k}
"""


# ------------------------------------------- embedding-cosine near-dup
def q_embedding_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_near_pairs(load_table(spark, sf_dir, "embeddings"))


def _d_bucket(planes: range) -> str:
    """DuckDB mirror of similarity._bucket_expr for the given planes."""
    terms = []
    for i, p in enumerate(planes):
        proj = d_fold(
            "list_transform(list_zip(vec, "
            f"list_transform(generate_series(0, len(vec) - 1), "
            f"d -> CASE WHEN ('0x' || substr(md5('{p}_' || d), 1, 15))::BIGINT % 2 = 1 "
            "THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)), x -> x[1] * x[2])",
            "CAST(0.0 AS DOUBLE)",
            "(s, v) -> s + v",
        )
        terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << i} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS INT)"


def _near_pairs_sql(threshold: float = 0.35) -> str:
    r, nb = similarity.PLANES_PER_BAND, similarity.NEAR_BANDS
    band_cols = ",\n         ".join(
        f"{_d_bucket(range(b * r, (b + 1) * r))} AS nb_{b}" for b in range(nb)
    )
    band_union = "\n  UNION ALL\n  ".join(
        f"SELECT vec_id, vec, norm, {b} AS band, nb_{b} AS key FROM bucketed"
        for b in range(nb)
    )
    return f"""
WITH base AS (
  SELECT vec_id, {D_VEC} AS vec FROM embeddings
),
bucketed AS (
  SELECT vec_id, vec, sqrt({d_dot('vec', 'vec')}) AS norm,
         {band_cols}
  FROM base
),
buckets AS (
  {band_union}
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         {d_dot('a.vec', 'b.vec')} / (a.norm * b.norm) AS cosine
  FROM buckets a JOIN buckets b ON a.band = b.band AND a.key = b.key
  WHERE a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, MAX(cosine) AS cosine
FROM pairs GROUP BY 1, 2 HAVING MAX(cosine) >= {threshold}
"""


# --------------------------------------------- capped sessions (stateful)
def q_capped_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom accumulate-and-reset sessionization (gap OR value-cap split)
    via mapInPandas. The per-user running sum with reset is not a window
    expression, but it IS a sequential fold — the DuckDB oracle walks it
    with a RECURSIVE CTE (one step per event per user, state carried in
    the recursion), upgrading this from the r02 rows-only driver check to
    a full value-hash row. Streaming ≡ batch parity additionally locked
    in tests/test_streaming_sessions.py."""
    from audit_star_spark.streaming.sessions import capped_sessions_batch

    return capped_sessions_batch(load_table(spark, sf_dir, "events"), value_cap=500.0)


# Emission rule mirrored from streaming/sessions._split_sessions: close on
# a >1h gap BEFORE absorbing the event, close the moment the accumulated
# value reaches 500 AFTER absorbing it, flush the tail. A session row
# exists where the state was closed at that step (cap), where the NEXT
# step restarted (gap), or at the user's last event. No (user_id, ts)
# ties exist in the feed, so the per-user order — and therefore the
# float accumulation order — is identical on both engines.
SQL_CAPPED_SESSIONS = """
WITH RECURSIVE ev AS (
  SELECT user_id, ts, CAST(value AS DOUBLE) AS v,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
  FROM events
),
walk AS (
  SELECT user_id, rn, ts AS s_start, ts AS s_end,
         CAST(1 AS BIGINT) AS n, v AS cum, (v >= 500.0) AS closed
  FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn,
         CASE WHEN w.closed OR e.ts > w.s_end + INTERVAL 3600 SECOND
              THEN e.ts ELSE w.s_start END,
         e.ts,
         CASE WHEN w.closed OR e.ts > w.s_end + INTERVAL 3600 SECOND
              THEN 1 ELSE w.n + 1 END,
         CASE WHEN w.closed OR e.ts > w.s_end + INTERVAL 3600 SECOND
              THEN e.v ELSE w.cum + e.v END,
         CASE WHEN w.closed OR e.ts > w.s_end + INTERVAL 3600 SECOND
              THEN e.v >= 500.0 ELSE w.cum + e.v >= 500.0 END
  FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.rn = w.rn + 1
),
flagged AS (
  SELECT user_id, rn, s_start, s_end, n, cum, closed,
         LEAD(n) OVER (PARTITION BY user_id ORDER BY rn) AS next_n
  FROM walk
)
SELECT user_id,
       s_start AS session_start,
       s_end AS session_end,
       CAST(n AS BIGINT) AS n_events,
       cum AS session_value
FROM flagged
WHERE closed OR next_n IS NULL OR next_n = 1
"""


# --------------------------------------------------------- multimodal stub
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = multimodal.with_binary_payload(load_table(spark, sf_dir, "documents"))
    return multimodal.extract_features(media)


def q_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = multimodal.with_binary_payload(load_table(spark, sf_dir, "documents"))
    return multimodal.sample_frames(media)


SAMPLE_RATES = {"en": 20, "de": 100, "fr": 60}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing: keep 20% of English, all German, 60% of French, half
    of everything else — deterministic doc_id-hash buckets, so a re-built
    corpus keeps exactly the same documents (text.stratified_sample)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.stratified_sample(docs, SAMPLE_RATES, default_pct=50).select(
        "doc_id", "lang"
    )


SQL_STRATIFIED = """
SELECT doc_id, lang
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 15))::BIGINT % 100
      < CASE lang WHEN 'en' THEN 20 WHEN 'de' THEN 100 WHEN 'fr' THEN 60 ELSE 50 END
"""


def q_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode through the driver gate: synthesize a valid PGM
    payload per document JVM-side (dimensions derived from text length,
    constant fill byte derived from doc_id), push it through the pure-numpy
    decoder in ``image_meta`` (mapInPandas), and emit metadata the oracle
    can state in closed form — a true differential test of the decoder,
    not just of the plumbing."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.expr(
            "CAST(concat('P5\n', CAST(1 + length(text) % 32 AS STRING), ' ', "
            "CAST(1 + length(text) % 17 AS STRING), '\n255\n', "
            "repeat(char(32 + doc_id % 90), "
            "(1 + length(text) % 32) * (1 + length(text) % 17))) AS BINARY)"
        ).alias("payload"),
    )
    return multimodal.image_meta(media).select(
        "doc_id", "format", "width", "height", "channels",
        F.col("mean_luma").alias("fill_byte"),
    )


def q_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination sweep: every ~97th document plays the eval-set
    probe; corpus docs sharing >= 2 distinct 8-grams with a probe are
    contamination hits (the n-gram-overlap recipe, probe side broadcast)."""
    docs = load_table(spark, sf_dir, "documents")
    probes = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("probe_id"), "text"
    )
    return decontam.contamination(docs, probes, n=8, min_shared=2)


def _contamination_sql(n: int = 8, min_shared: int = 2) -> str:
    grams = (
        f"list_distinct(list_transform(generate_series(1, len({D_TOKENS}) - {n - 1}), "
        "i -> "
        + " || ' ' || ".join(f"{D_TOKENS}[i+{j}]" for j in range(n))
        + "))"
    )
    return f"""
WITH doc_grams AS (
  SELECT doc_id,
         unnest(list_transform(CASE WHEN len({D_TOKENS}) >= {n} THEN {grams} ELSE [] END,
                g -> ('0x' || substr(md5(g), 1, 15))::BIGINT)) AS gh
  FROM documents
),
probe_grams AS (
  SELECT doc_id AS probe_id, gh FROM doc_grams WHERE doc_id % 97 = 0
)
SELECT d.doc_id, p.probe_id, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM doc_grams d JOIN probe_grams p USING (gh)
WHERE d.doc_id <> p.probe_id
GROUP BY d.doc_id, p.probe_id
HAVING COUNT(*) >= {min_shared}
"""


def q_boilerplate_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate: 5-gram phrases in >= 3 distinct docs
    (the C4-style repeated-content signal, one phrase-keyed shuffle)."""
    return decontam.boilerplate_phrases(
        load_table(spark, sf_dir, "documents"), n=5, min_docs=3
    )


def _boilerplate_sql(n: int = 5, min_docs: int = 3) -> str:
    grams = (
        f"list_distinct(list_transform(generate_series(1, len({D_TOKENS}) - {n - 1}), "
        "i -> "
        + " || ' ' || ".join(f"{D_TOKENS}[i+{j}]" for j in range(n))
        + "))"
    )
    return f"""
SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM (
  SELECT doc_id,
         unnest(CASE WHEN len({D_TOKENS}) >= {n} THEN {grams} ELSE [] END) AS phrase
  FROM documents
)
GROUP BY phrase
HAVING COUNT(*) >= {min_docs}
"""


SQL_IMAGE_META = """
SELECT doc_id,
       'pgm' AS format,
       CAST(1 + length(text) % 32 AS INT) AS width,
       CAST(1 + length(text) % 17 AS INT) AS height,
       1 AS channels,
       CAST(32 + doc_id % 90 AS DOUBLE) AS fill_byte
FROM documents
"""


# every 4th 64-byte frame; ASCII text so byte slices == substr slices
SQL_FRAME_SAMPLES = """
SELECT doc_id,
       (i - 1) * 4 AS frame_idx,
       length(substr(text, (i - 1) * 4 * 64 + 1, 64)) AS frame_bytes,
       md5(substr(text, (i - 1) * 4 * 64 + 1, 64)) AS frame_md5
FROM (
  SELECT doc_id, text,
         unnest(generate_series(1, ((length(text) + 63) // 64 + 3) // 4)) AS i
  FROM documents
)
"""


SQL_MULTIMODAL = f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5,
       CAST({d_fold("list_transform(string_split(substr(text, 1, 16), ''), c -> unicode(c))",
                    "0", "(a, c) -> a + c")} AS DOUBLE)
         / least(length(text), 16) AS head_mean
FROM documents
"""


# ----------------------------------------- composite cleaning pipeline
def q_corpus_clean_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data cleaning story as ONE declarative plan:
    quality-filter -> drop near-duplicate losers (keep the smallest doc_id
    of each n-gram-Jaccard pair) -> per-language surviving doc count and
    token budget. Catalyst sees a single DAG: the dedup anti-join prunes
    before the final rollup, and the quality filter pushes into both
    branches' scans."""
    docs = load_table(spark, sf_dir, "documents")
    stats = text.with_text_stats(docs)
    keep = stats.filter(F.col("quality_score") >= 0.3).select(
        "doc_id", "est_bpe_tokens"
    )
    losers = (
        dedup.ngram_jaccard_pairs(docs)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    survivors = keep.join(losers, "doc_id", "left_anti")
    return (
        survivors.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("est_bpe_tokens").alias("total_tokens"),
        )
    )


def _corpus_clean_sql() -> str:
    return f"""
WITH stats AS ({SQL_TEXT_STATS}),
keep AS (
  SELECT doc_id, est_bpe_tokens FROM stats WHERE quality_score >= 0.3
),
losers AS (
  SELECT DISTINCT doc_b AS doc_id FROM ({_ngram_jaccard_sql()})
),
survivors AS (
  SELECT k.* FROM keep k WHERE NOT EXISTS
    (SELECT 1 FROM losers l WHERE l.doc_id = k.doc_id)
)
SELECT d.lang, COUNT(*) AS n_docs, CAST(SUM(s.est_bpe_tokens) AS BIGINT) AS total_tokens
FROM survivors s JOIN documents d USING (doc_id)
GROUP BY d.lang
"""


def q_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_topk(load_table(spark, sf_dir, "documents"))


SQL_TOKEN_TOPK = f"""
SELECT token, COUNT(*) AS freq
FROM (SELECT unnest({D_TOKENS}) AS token FROM documents)
WHERE len(token) > 0
GROUP BY token
ORDER BY freq DESC, token
LIMIT 500
"""


def q_corpus_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-bucketed train/val/test split with per-split doc
    count and token budget — the held-out-stability primitive of a
    pretraining corpus build (split migrates for NO document on rebuild)."""
    docs = load_table(spark, sf_dir, "documents")
    stats = text.with_text_stats(docs).select("doc_id", "est_bpe_tokens")
    return (
        text.with_split(docs.select("doc_id"))
        .join(stats, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("est_bpe_tokens").alias("total_tokens"),
        )
        .orderBy("split")
    )


SQL_CORPUS_SPLITS = f"""
WITH stats AS ({SQL_TEXT_STATS}),
assigned AS (
  SELECT doc_id,
         CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
  FROM (SELECT doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
        FROM documents)
)
SELECT split, COUNT(*) AS n_docs, CAST(SUM(s.est_bpe_tokens) AS BIGINT) AS total_tokens
FROM assigned a JOIN stats s USING (doc_id)
GROUP BY split
ORDER BY split
"""


# ----------------------------------------------------------- PNG decode
def q_png_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode through the driver gate: per document, synthesize
    a grayscale gradient PNG (pixel(x, y) = (x + y + doc_id) % 256) with
    scanline filter type doc_id % 5 — so every PNG filter reconstruction
    path (None/Sub/Up/Average/Paeth) runs against the oracle — then
    decode with the stdlib-zlib parser and emit closed-form metadata.
    Grayscale keeps mean_luma an exact integer mean (bit-identical in
    any engine); an RGB variant would hash-drift on luma-weight float
    rounding."""
    import pandas as pd  # noqa: F401 (mapInPandas body)

    docs = load_table(spark, sf_dir, "documents")
    slim = docs.select("doc_id", F.length("text").alias("L"))

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, L in zip(pdf["doc_id"], pdf["L"]):
                d, L = int(doc_id), int(L)
                w, h = 1 + L % 24, 1 + L % 13
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                img = ((x + y + d) % 256).astype(np.uint8)[:, :, None]
                payloads.append(multimodal.encode_png(img, filter_type=d % 5))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    from pyspark.sql import types as T

    from audit_star_spark.util import spread

    media = spread(slim).mapInPandas(
        synth,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )
    return multimodal.image_meta(media)


SQL_PNG_META = """
WITH dims AS (
  SELECT doc_id, 1 + length(text) % 24 AS w, 1 + length(text) % 13 AS h
  FROM documents
),
grid AS (
  SELECT doc_id, w, h, unnest(generate_series(0, w * h - 1)) AS i FROM dims
)
SELECT doc_id,
       'png' AS format,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(1 AS INT) AS channels,
       AVG(CAST((i % w + i // w + doc_id) % 256 AS DOUBLE)) AS mean_luma
FROM grid GROUP BY doc_id, w, h
"""


# ----------------------------------------------------------- JPEG decode
def q_jpeg_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode through the driver gate: per document,
    synthesize a grayscale image of 8×8 constant tiles (tile t's value =
    (doc_id·7 + t·13) % 256), encode with the pure-numpy baseline encoder
    at quality=100 (all-ones quant tables), decode with the pure-numpy
    Huffman+IDCT decoder, and emit closed-form metadata. Constant tiles
    make the round trip BIT-EXACT — each block is DC-only with an exact
    integer coefficient — so mean_luma is hash-stable; the tile values
    sweep the full byte range, driving DC differentials of both signs
    through the Huffman path. The AC run-length path is locked by
    coefficient-exact pytest vectors (tests/test_jpeg.py)."""
    import pandas as pd  # noqa: F401 (mapInPandas body)

    from audit_star_spark.analytics.jpeg import encode_jpeg

    docs = load_table(spark, sf_dir, "documents")
    slim = docs.select("doc_id", F.length("text").alias("L"))

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, L in zip(pdf["doc_id"], pdf["L"]):
                d, L = int(doc_id), int(L)
                wt, ht = 1 + L % 4, 1 + L % 3
                t = np.arange(wt * ht).reshape(ht, wt)
                tiles = ((d * 7 + t * 13) % 256).astype(np.uint8)
                img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)[:, :, None]
                payloads.append(encode_jpeg(img, quality=100))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    from pyspark.sql import types as T

    from audit_star_spark.util import spread

    media = spread(slim).mapInPandas(
        synth,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )
    return multimodal.image_meta(media)


SQL_JPEG_META = """
WITH dims AS (
  SELECT doc_id, 1 + length(text) % 4 AS wt, 1 + length(text) % 3 AS ht
  FROM documents
),
tiles AS (
  SELECT doc_id, wt, ht, unnest(generate_series(0, wt * ht - 1)) AS t FROM dims
)
SELECT doc_id,
       'jpeg' AS format,
       CAST(wt * 8 AS INT) AS width,
       CAST(ht * 8 AS INT) AS height,
       CAST(1 AS INT) AS channels,
       AVG(CAST((doc_id * 7 + t * 13) % 256 AS DOUBLE)) AS mean_luma
FROM tiles GROUP BY doc_id, wt, ht
"""


# --------------------------------------------------------- audio decode
def q_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode through the driver gate: synthesize a valid WAV
    payload per document (square wave, parameters keyed off doc_id), push
    it through the pure-numpy RIFF/PCM parser in ``audio_meta``
    (mapInPandas), and emit features the oracle states in closed form —
    rms of a +/-A square wave is exactly A, zero crossings are the sign
    flips at half-period multiples. A differential test of the decoder
    itself, not just the plumbing."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.audio_meta(multimodal.synth_audio(docs))


SQL_AUDIO_META = f"""
SELECT doc_id,
       'wav' AS format,
       CAST({multimodal.AUDIO_RATE} AS INT) AS sample_rate,
       CAST(1 AS INT) AS n_channels,
       800 + (doc_id % 5) * 160 AS n_samples,
       CAST(800 + (doc_id % 5) * 160 AS DOUBLE) / {multimodal.AUDIO_RATE}.0 AS duration_s,
       CAST({multimodal.AUDIO_AMP} AS DOUBLE) AS rms,
       (800 + (doc_id % 5) * 160 - 1) // (10 + doc_id % 7) AS zero_crossings
FROM documents
"""


def _synth_flac(spark_df):
    """The synth_audio square wave FLAC-encoded (analytics/flac.py):
    blocks are non-constant with sparse +-2A second differences, so the
    encoder takes the FIXED-order-2 + Rice path — the real entropy-coded
    decode crosses the gate, not just the container walk."""
    import numpy as np

    from audit_star_spark.analytics.flac import encode_flac

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                half = 10 + int(doc_id) % 7
                n = 800 + (int(doc_id) % 5) * 160
                i = np.arange(n)
                s = multimodal.AUDIO_AMP * (1 - 2 * ((i // half) % 2))
                payloads.append(
                    encode_flac(s, multimodal.AUDIO_RATE, block_size=256)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    from pyspark.sql import types as T

    from audit_star_spark.util import spread

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return spread(spark_df.select("doc_id")).mapInPandas(synth, schema)


def q_flac_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL FLAC decode through the gate (analytics/flac.py): the
    square-wave vectors of ``audio_meta`` re-encoded as FLAC (FIXED
    subframes + Rice residuals), pushed through the same audio_meta
    operator via its magic dispatch; the oracle states the identical
    closed forms with format='flac'."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.audio_meta(_synth_flac(docs))


SQL_FLAC_META = f"""
SELECT doc_id,
       'flac' AS format,
       CAST({multimodal.AUDIO_RATE} AS INT) AS sample_rate,
       CAST(1 AS INT) AS n_channels,
       800 + (doc_id % 5) * 160 AS n_samples,
       CAST(800 + (doc_id % 5) * 160 AS DOUBLE) / {multimodal.AUDIO_RATE}.0 AS duration_s,
       CAST({multimodal.AUDIO_AMP} AS DOUBLE) AS rms,
       (800 + (doc_id % 5) * 160 - 1) // (10 + doc_id % 7) AS zero_crossings
FROM documents
"""


# ------------------------------------------------------- sequence packing
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.sequence_packing(load_table(spark, sf_dir, "documents"))


def _sequence_packing_sql(budget: int = 256) -> str:
    return f"""
WITH assigned AS (
  SELECT doc_id,
         CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
         greatest(CAST(len({D_TOKENS}) AS BIGINT),
                  CAST(ceil(length(text) / 4.0) AS BIGINT)) AS est_bpe_tokens
  FROM (SELECT doc_id, text,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
        FROM documents)
),
packed AS (
  SELECT doc_id, split, est_bpe_tokens,
         COALESCE(SUM(est_bpe_tokens) OVER (
           PARTITION BY split ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
  FROM assigned
)
SELECT doc_id, split, est_bpe_tokens,
       CAST(prev // {budget} AS BIGINT) AS pack_id,
       CAST(prev % {budget} AS BIGINT) AS pack_offset
FROM packed
"""


# --------------------------------------------------- context-window chunking
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.chunk_documents(load_table(spark, sf_dir, "documents"))


def _doc_chunks_sql(chunk: int = 64, overlap: int = 8) -> str:
    step = chunk - overlap
    return f"""
WITH toks AS (
  SELECT doc_id, {D_TOKENS} AS t,
         greatest(1, (len({D_TOKENS}) - {overlap} + {step} - 1) // {step}) AS nc
  FROM documents
),
chunks AS (
  SELECT doc_id, t, unnest(generate_series(0, nc - 1)) AS c FROM toks
)
SELECT doc_id,
       CAST(c AS INT) AS chunk_id,
       CAST(least({chunk}, len(t) - c * {step}) AS BIGINT) AS n_chunk_tokens,
       array_to_string(list_slice(t, c * {step} + 1,
                                  c * {step} + least({chunk}, len(t) - c * {step})),
                       ' ') AS chunk_text
FROM chunks
"""


# --------------------------------------------------------- BPE training
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe.bpe_merge_table(load_table(spark, sf_dir, "documents"))


def q_bpe_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe.bpe_corpus_stats(load_table(spark, sf_dir, "documents"))


def _bpe_rewrite_cte(name: str, prev: str, m: str) -> str:
    """One merge-round rewrite CTE: ``name`` = ``prev`` with round ``m``'s
    winning pair greedily merged — the same carry-in-last-element list
    fold as the Spark side (tokens are lifted to one-element lists because
    DuckDB list_reduce has a single element type and no separate seed)."""
    return f"""
{name} AS (
  SELECT doc_id,
    list_reduce(
      list_concat([CAST([] AS VARCHAR[])], list_transform(toks, t -> [t])),
      (s, x) -> CASE
        WHEN len(s) > 0 AND s[-1] = {m}.a AND x[1] = {m}.b
          THEN list_append(list_slice(s, 1, len(s) - 1), {m}.a || ' ' || {m}.b)
        ELSE list_append(s, x[1])
      END) AS toks
  FROM {prev} CROSS JOIN {m}
)"""


def _bpe_ctes(n_merges: int = bpe.N_MERGES, where: str = "") -> str:
    """Unrolled per-round CTEs mirroring bpe.bpe_train: t{r} = corpus after
    r merges, p{r} = adjacent-pair counts of t{r-1}, m{r} = that round's
    winning pair. ``where`` filters the training corpus (the transfer
    oracle trains on half the documents).
    NOTE: a struct-state formulation segfaults DuckDB 1.0.0 at 3 nested
    rounds — keep the rewrite list-typed."""
    parts = [f"t0 AS (SELECT doc_id, {D_TOKENS} AS toks FROM documents {where})"]
    for r in range(1, n_merges + 1):
        prev = f"t{r - 1}"
        parts.append(f"""
p{r} AS (
  SELECT u.a AS a, u.b AS b, COUNT(*) AS cnt FROM (
    SELECT unnest(CASE WHEN len(toks) >= 2 THEN
        list_transform(generate_series(1, len(toks) - 1),
                       i -> struct_pack(a := toks[i], b := toks[i + 1]))
      ELSE [] END) AS u
    FROM {prev})
  GROUP BY 1, 2
)""")
        parts.append(f"m{r} AS (SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1)")
        parts.append(_bpe_rewrite_cte(f"t{r}", prev, f"m{r}"))
    return ",\n".join(parts)


def _bpe_merges_sql(n_merges: int = bpe.N_MERGES) -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INT) AS round, a AS lhs, b AS rhs, "
        f"CAST(cnt AS BIGINT) AS pair_count FROM m{r}"
        for r in range(1, n_merges + 1)
    )
    return f"WITH {_bpe_ctes(n_merges)}\n{unions}"


def _bpe_corpus_sql(n_merges: int = bpe.N_MERGES) -> str:
    return f"""
WITH {_bpe_ctes(n_merges)}
SELECT t0.doc_id,
       CAST(len(t0.toks) AS BIGINT) AS n_tokens_before,
       CAST(len(t{n_merges}.toks) AS BIGINT) AS n_tokens_after
FROM t0 JOIN t{n_merges} ON t0.doc_id = t{n_merges}.doc_id
"""


def q_bpe_transfer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe.bpe_transfer_stats(load_table(spark, sf_dir, "documents"))


def _bpe_transfer_sql(n_merges: int = bpe.N_MERGES) -> str:
    """Rules mined on the even-doc_id half (the t/p/m chain, filtered),
    then the SAME rewrite fold applied to the odd half (a-chain)."""
    parts = [_bpe_ctes(n_merges, where="WHERE doc_id % 2 = 0")]
    parts.append(
        f"a0 AS (SELECT doc_id, {D_TOKENS} AS toks "
        f"FROM documents WHERE doc_id % 2 = 1)"
    )
    for r in range(1, n_merges + 1):
        parts.append(_bpe_rewrite_cte(f"a{r}", f"a{r - 1}", f"m{r}"))
    return f"""
WITH {",".join(parts)}
SELECT a0.doc_id,
       CAST(len(a0.toks) AS BIGINT) AS n_tokens_before,
       CAST(len(a{n_merges}.toks) AS BIGINT) AS n_tokens_after
FROM a0 JOIN a{n_merges} ON a0.doc_id = a{n_merges}.doc_id
"""


# ------------------------------------------------ quality: repetition stats
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.with_repetition_stats(load_table(spark, sf_dir, "documents"))


def _rep_cte() -> str:
    """Shared CTE chain mirroring quality.with_repetition_stats' in-row
    shape: sorted gram arrays -> run-start positions -> per-run (mass,
    multiplicity) structs -> integer folds; floats only in final ratios.
    DuckDB lists are 1-based (the Spark side's sequence is 0-based)."""

    def gram(n: int) -> str:
        if n == 1:
            return "t"
        joined = " || ' ' || ".join(f"t[i + {j}]" for j in range(n))
        return (
            f"CASE WHEN len(t) >= {n} THEN "
            f"list_transform(generate_series(1, len(t) - {n - 1}), i -> {joined}) "
            f"ELSE CAST([] AS VARCHAR[]) END"
        )

    def starts(gs: str) -> str:
        return (
            f"CASE WHEN len({gs}) = 0 THEN CAST([] AS BIGINT[]) ELSE "
            f"list_filter(generate_series(1, len({gs})), "
            f"i -> i = 1 OR NOT ({gs}[i] = {gs}[greatest(i - 1, 1)])) END"
        )

    def runs(n: int) -> str:
        st, gs = f"st{n}", f"gs{n}"
        nxt = f"list_concat(list_slice({st}, 2, len({st})), [len({gs}) + 1])"
        return (
            f"list_transform(list_zip({st}, {nxt}), "
            f"x -> struct_pack(m := CAST((x[2] - x[1]) * length({gs}[x[1]]) AS BIGINT), "
            f"r := CAST(x[2] - x[1] AS BIGINT)))"
        )

    def fold_m(n: int, cond: str = "TRUE") -> str:
        return d_fold(
            f"list_transform(runs{n}, x -> CASE WHEN {cond} THEN x.m ELSE CAST(0 AS BIGINT) END)",
            "CAST(0 AS BIGINT)",
            "(a, m) -> a + m",
        )

    def frac(num: str, den: str) -> str:
        return f"CAST({num} AS DOUBLE) / CAST(nullif({den}, 0) AS DOUBLE)"

    gram_cols = ",\n         ".join(
        f"list_sort({gram(n)}) AS gs{n}" for n in (1, 2, 3)
    )
    start_cols = ",\n         ".join(f"{starts(f'gs{n}')} AS st{n}" for n in (1, 2, 3))
    run_cols = ",\n         ".join(f"{runs(n)} AS runs{n}" for n in (1, 2, 3))
    return f"""
toks AS (SELECT doc_id, {D_TOKENS} AS t FROM documents),
sorted_grams AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct_tokens,
         {gram_cols}
  FROM toks
),
run_starts AS (
  SELECT *, {start_cols} FROM sorted_grams
),
doc_runs AS (
  SELECT doc_id, n_tokens, n_distinct_tokens, {run_cols} FROM run_starts
),
rep AS (
  SELECT doc_id, n_tokens, n_distinct_tokens,
         {frac("list_max(list_transform(runs1, x -> x.m))", fold_m(1))} AS top_1gram_char_frac,
         {frac("list_max(list_transform(runs2, x -> x.m))", fold_m(2))} AS top_2gram_char_frac,
         {frac(fold_m(3, "x.r > 1"), fold_m(3))} AS dup_3gram_char_frac
  FROM doc_runs
)"""


def _repetition_sql() -> str:
    return f"""
WITH {_rep_cte()}
SELECT doc_id, n_tokens, n_distinct_tokens,
       CAST(n_distinct_tokens AS DOUBLE) / CAST(nullif(n_tokens, 0) AS DOUBLE)
         AS distinct_token_ratio,
       top_1gram_char_frac, top_2gram_char_frac, dup_3gram_char_frac
FROM rep
"""


# ---------------------------------------------------- quality: gopher gate
def q_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.gopher_quality_flags(load_table(spark, sf_dir, "documents"))


def _quality_flags_sql() -> str:
    q = quality
    return f"""
WITH {_rep_cte()},
base AS (
  SELECT doc_id,
         len({D_TOKENS}) AS nt,
         {d_fold(f"list_transform({D_TOKENS}, t -> length(t))", "0", "(a, t) -> a + t")}
           / CAST(len({D_TOKENS}) AS DOUBLE) AS avg_tok,
         len(regexp_extract_all(lower(text), '{_sw(text.STOPWORDS)}', 0)) AS nstop
  FROM documents
)
SELECT b.doc_id,
       (b.nt >= {q.MIN_TOKENS} AND b.nt <= {q.MAX_TOKENS}) AS ok_length,
       (b.avg_tok >= {q.MIN_AVG_TOK} AND b.avg_tok <= {q.MAX_AVG_TOK}) AS ok_avg_token_len,
       (b.nstop >= {q.MIN_STOPWORD_HITS}) AS ok_stopwords,
       (CAST(r.n_distinct_tokens AS DOUBLE) / r.n_tokens >= {q.MIN_DISTINCT_RATIO}) AS ok_diversity,
       (r.top_2gram_char_frac <= {q.MAX_TOP_2GRAM}) AS ok_repetition,
       ((b.nt >= {q.MIN_TOKENS} AND b.nt <= {q.MAX_TOKENS})
        AND (b.avg_tok >= {q.MIN_AVG_TOK} AND b.avg_tok <= {q.MAX_AVG_TOK})
        AND (b.nstop >= {q.MIN_STOPWORD_HITS})
        AND (CAST(r.n_distinct_tokens AS DOUBLE) / r.n_tokens >= {q.MIN_DISTINCT_RATIO})
        AND (r.top_2gram_char_frac <= {q.MAX_TOP_2GRAM})) AS keep
FROM base b JOIN rep r ON b.doc_id = r.doc_id
"""


# --------------------------------------------------------- quality: PII scan
# deterministic PII injection keyed off doc_id (the synthetic corpus has
# none) — identical CASE expression on both engines
_PII_INJECT_SPARK = (
    "CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' || CAST(doc_id AS STRING)"
    " || '@example.com now'"
    " WHEN doc_id % 7 = 3 THEN text || ' call (555) ' || CAST(100 + doc_id % 900 AS STRING)"
    " || '-' || CAST(1000 + doc_id % 9000 AS STRING) || ' ok'"
    " WHEN doc_id % 7 = 5 THEN text || ' from 10.' || CAST(doc_id % 256 AS STRING)"
    " || '.0.' || CAST(doc_id % 250 AS STRING) || ' host'"
    " ELSE text END"
)
_PII_INJECT_DUCK = _PII_INJECT_SPARK.replace("AS STRING", "AS VARCHAR")


def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text", F.expr(_PII_INJECT_SPARK)
    )
    return quality.with_pii_scan(docs)


def _pii_sql() -> str:
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\(\d{3}\) \d{3}-\d{4}"
    ipv4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    return f"""
WITH injected AS (
  SELECT doc_id, {_PII_INJECT_DUCK} AS text FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{email}', 0)) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{phone}', 0)) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(text, '{ipv4}', 0)) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(text, '{email}', 0))
            + len(regexp_extract_all(text, '{phone}', 0))
            + len(regexp_extract_all(text, '{ipv4}', 0)) AS BIGINT) AS n_pii,
       CAST(length(regexp_replace(regexp_replace(regexp_replace(text,
              '{email}', '<EMAIL>', 'g'),
              '{phone}', '<PHONE>', 'g'),
              '{ipv4}', '<IP>', 'g')) AS BIGINT) AS redacted_len
FROM injected
"""


# ------------------------------------------------- quality: char entropy
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.with_char_entropy(load_table(spark, sf_dir, "documents"))


SQL_CHAR_ENTROPY = """
WITH chars AS (
  SELECT doc_id, unnest(generate_series(1, length(text))) AS i, text
  FROM documents
),
ccounts AS (
  SELECT doc_id, substr(text, CAST(i AS INT), 1) AS ch, COUNT(*) AS cnt
  FROM chars GROUP BY 1, 2
)
SELECT doc_id,
       CAST(SUM(cnt) AS BIGINT) AS n_chars,
       round(ln(CAST(SUM(cnt) AS DOUBLE))
         - list_reduce(
             list_concat([CAST(0.0 AS DOUBLE)],
               list_transform(list_sort(list(cnt)),
                              c -> CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))),
             (s, v) -> s + v)
           / CAST(SUM(cnt) AS DOUBLE), 12) AS char_entropy
FROM ccounts GROUP BY doc_id
"""


# --------------------------------------------------- semantic dedup (SemDeDup)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.semantic_dedup(load_table(spark, sf_dir, "embeddings"))


def _semantic_dedup_sql(n_cells: int = 16, threshold: float = 0.35) -> str:
    return f"""
WITH base AS (
  SELECT vec_id, {D_VEC} AS vec FROM embeddings
),
normed AS (
  SELECT vec_id, vec, sqrt({d_dot('vec', 'vec')}) AS norm FROM base
),
cents AS (
  SELECT vec_id AS cell_id, vec AS cvec, norm AS cnorm
  FROM normed WHERE vec_id < {n_cells}
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY ccos DESC, cell_id) AS crank
  FROM (
    SELECT n.vec_id, n.vec, n.norm, c.cell_id,
           {d_dot('c.cvec', 'n.vec')} / (c.cnorm * n.norm) AS ccos
    FROM normed n CROSS JOIN cents c
  )
),
assigned AS (
  SELECT vec_id, vec, norm, cell_id FROM ranked WHERE crank = 1
),
dup AS (
  SELECT b.vec_id, MIN(a.vec_id) AS dup_of
  FROM assigned a JOIN assigned b
    ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
  WHERE {d_dot('a.vec', 'b.vec')} / (a.norm * b.norm) >= {threshold}
  GROUP BY b.vec_id
)
SELECT s.vec_id, s.cell_id, d.dup_of, d.dup_of IS NULL AS kept
FROM assigned s LEFT JOIN dup d ON s.vec_id = d.vec_id
"""


# ------------------------------------------------- k-means Lloyd iteration
def q_kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gate projection scalarizes the centroid (dim count, sequential
    L2/sum folds in index order — deterministic, covers every element)
    because the driver's value-hash contract for array-typed columns is
    unpinned; the full array is differentially compared in
    tests/test_kmeans.py via the array-aware local comparator."""
    km = similarity.kmeans_update(load_table(spark, sf_dir, "embeddings"))
    l2 = F.sqrt(
        F.expr("aggregate(centroid, CAST(0.0 AS DOUBLE), (s, v) -> s + v * v)")
    )
    total = F.expr("aggregate(centroid, CAST(0.0 AS DOUBLE), (s, v) -> s + v)")
    return km.select(
        "cell_id",
        "n_members",
        F.size("centroid").alias("centroid_dim"),
        l2.alias("centroid_l2"),
        total.alias("centroid_sum"),
    )


def _kmeans_core_sql(n_cells: int = 16) -> str:
    return f"""
WITH base AS (
  SELECT vec_id, {D_VEC} AS vec FROM embeddings
),
normed AS (
  SELECT vec_id, vec, sqrt({d_dot('vec', 'vec')}) AS norm FROM base
),
cents AS (
  SELECT vec_id AS cell_id, vec AS cvec, norm AS cnorm
  FROM normed WHERE vec_id < {n_cells}
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY ccos DESC, cell_id) AS crank
  FROM (
    SELECT n.vec_id, n.vec, c.cell_id,
           {d_dot('c.cvec', 'n.vec')} / (c.cnorm * n.norm) AS ccos
    FROM normed n CROSS JOIN cents c
  )
),
assigned AS (
  SELECT vec_id, vec, cell_id FROM ranked WHERE crank = 1
),
dims AS (
  SELECT cell_id, i - 1 AS pos, vec[i] AS x FROM (
    SELECT cell_id, vec, unnest(generate_series(1, len(vec))) AS i FROM assigned
  )
),
sums AS (
  SELECT cell_id, pos,
         list_reduce(list_concat([CAST(0.0 AS DOUBLE)], list_sort(list(x))),
                     (s, v) -> s + v) AS s,
         COUNT(*) AS n
  FROM dims GROUP BY 1, 2
),
means AS (
  SELECT cell_id, pos, s / n AS m, n FROM sums
)
SELECT cell_id,
       CAST(MAX(n) AS BIGINT) AS n_members,
       list_transform(list_sort(list(struct_pack(pos := pos, m := m))), x -> x.m)
         AS centroid
FROM means GROUP BY cell_id
"""


def _kmeans_sql(n_cells: int = 16) -> str:
    return f"""
WITH km AS ({_kmeans_core_sql(n_cells)})
SELECT cell_id, n_members,
       CAST(len(centroid) AS INT) AS centroid_dim,
       sqrt({d_fold("list_transform(centroid, v -> v * v)",
                    "CAST(0.0 AS DOUBLE)", "(s, v) -> s + v")}) AS centroid_l2,
       {d_fold("centroid", "CAST(0.0 AS DOUBLE)", "(s, v) -> s + v")} AS centroid_sum
FROM km
"""


def q_ivf_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED IVF index through the gate (analytics/ivf_index.py):
    build writes kmeans_train(iters=1) centroids + cell-partitioned
    assignments to disk; probe ranks probe cells from the broadcast
    centroid table and reads ONLY the probed cells' partitions (static
    partition filter — no k-means job, no full-corpus scan on the probe
    path). The oracle replays the identical train+assign+probe algebra
    (sorted-fold sums, same tie-breaks) in DuckDB; self-matches are kept
    (the index knows nothing about query identity)."""
    import os
    import tempfile

    from audit_star_spark.analytics.ivf_index import IVFIndex, build_ivf_index
    from audit_star_spark.analytics.similarity import VEC_EXPR

    emb = load_table(spark, sf_dir, "embeddings")
    d = tempfile.mkdtemp(prefix="ivf_gate_")
    idx = build_ivf_index(emb, os.path.join(d, "idx"), n_cells=16, iters=1)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.expr(VEC_EXPR).alias("qvec")
    )
    return IVFIndex(idx.index_dir).probe(queries, k=5, n_probe=4)


def _ivf_index_probe_sql(
    n_cells: int = 16, n_queries: int = 8, k: int = 5, n_probe: int = 4
) -> str:
    return f"""
WITH km AS ({_kmeans_core_sql(n_cells)}),
tcents AS (
  SELECT cell_id, centroid AS cvec,
         sqrt({d_dot('centroid', 'centroid')}) AS cnorm
  FROM km
),
nbase AS (
  SELECT vec_id, {D_VEC} AS vec FROM embeddings
),
nnormed AS (
  SELECT vec_id, vec, sqrt({d_dot('vec', 'vec')}) AS norm FROM nbase
),
nranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY ccos DESC, cell_id) AS crank
  FROM (
    SELECT n.vec_id, n.vec, n.norm, c.cell_id,
           {d_dot('c.cvec', 'n.vec')} / (c.cnorm * n.norm) AS ccos
    FROM nnormed n CROSS JOIN tcents c
  )
),
nassigned AS (
  SELECT vec_id, vec, norm, cell_id FROM nranked WHERE crank = 1
),
probes AS (
  SELECT vec_id AS query_id, vec AS qvec, norm AS qnorm, cell_id AS pcell
  FROM nranked WHERE crank <= {n_probe} AND vec_id < {n_queries}
),
cand AS (
  SELECT DISTINCT p.query_id, p.qvec, p.qnorm, a.vec_id, a.vec, a.norm
  FROM nassigned a JOIN probes p ON a.cell_id = p.pcell
),
scored AS (
  SELECT query_id, vec_id,
         {d_dot('qvec', 'vec')} / (qnorm * norm) AS cosine
  FROM cand
)
SELECT query_id, CAST(rank AS INT) AS rank, vec_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def q_crawl_pipeline_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship crawl composition as ONE DAG through the gate:
    WARC archives of HTTP responses -> envelope parse (status/mime
    filter, gzip decode) -> html_extract -> gopher quality flags ->
    per-source survival report with the kept token budget. Every stage
    is the REAL operator (sources/warc.py, analytics/html.py,
    analytics/quality.py); the synthesis embeds each document's text
    verbatim in a minimal page (the corpus has no HTML-special chars —
    a real crawl would entity-escape), so the extracted text equals the
    whitespace-canonical document text and the oracle can state the
    quality flags over `documents` directly (tokenization canonicalizes
    whitespace identically on both paths)."""
    from audit_star_spark.analytics.html import html_extract
    from audit_star_spark.analytics.quality import gopher_quality_flags
    from audit_star_spark.sources.warc import http_responses, warc_records

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    crawled = http_responses(warc_records(_synth_crawl(docs))).filter(
        (F.col("http_status") == 200) & (F.col("mime") == "text/html")
    )
    extracted = html_extract(
        crawled.select(
            F.col("archive_id").alias("doc_id"),
            F.col("body").cast("string").alias("html"),
        ),
        "html",
    ).select("doc_id", "text")
    from audit_star_spark.analytics.text import TOKENS_EXPR

    flags = gopher_quality_flags(extracted).select("doc_id", "keep")
    toks = extracted.select(
        "doc_id", F.size(F.expr(TOKENS_EXPR)).alias("nt")
    )
    fetched = docs.select(
        "doc_id",
        "source",
        (F.col("doc_id") % 7 != 0).alias("ok"),
        ((F.col("doc_id") % 7 != 0) & (F.col("doc_id") % 11 != 0)).alias(
            "is_page"
        ),
    )
    staged = (
        fetched.join(flags, "doc_id", "left")
        .join(toks, "doc_id", "left")
        .withColumn("kept", F.col("is_page") & F.coalesce("keep", F.lit(False)))
    )
    return staged.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.col("ok").cast("int")).cast("long").alias("n_ok"),
        F.sum(F.col("is_page").cast("int")).cast("long").alias("n_pages"),
        F.sum(F.col("kept").cast("int")).cast("long").alias("n_kept"),
        F.coalesce(
            F.sum(F.when(F.col("kept"), F.col("nt"))), F.lit(0)
        )
        .cast("long")
        .alias("kept_tokens"),
    )


def _synth_crawl(spark_df):
    """doc_id-keyed crawl synthesis: one WARC archive per doc holding a
    single HTTP response — 404 for d%7==0, text/plain (filtered
    downstream) for d%11==0, else a gzip'd (odd d) minimal HTML page
    embedding the doc text; archives themselves member-gzip for
    d%3==0."""
    from audit_star_spark.sources.warc import encode_http_response, encode_warc

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                status = 404 if d % 7 == 0 else 200
                if d % 11 == 0:
                    ctype, body = "text/plain", text.encode("utf-8")
                else:
                    ctype = "text/html; charset=utf-8"
                    body = (
                        "<html><body><p>%s</p></body></html>" % text
                    ).encode("utf-8")
                rec = {
                    "warc_type": "response",
                    "target_uri": f"https://example.org/{d}",
                    "content_type": "application/http;msgtype=response",
                    "payload": encode_http_response(
                        status, body, content_type=ctype, gzip_body=bool(d % 2)
                    ),
                }
                payloads.append(encode_warc([rec], gzip_members=d % 3 == 0))
            yield pd.DataFrame(
                {"archive_id": pdf["doc_id"], "payload": payloads}
            )

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("archive_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return spark_df.mapInPandas(synth, schema)


def _crawl_pipeline_sql() -> str:
    return f"""
WITH qf AS ({_quality_flags_sql()}),
st AS (
  SELECT doc_id, source,
         (doc_id % 7 <> 0) AS ok,
         (doc_id % 7 <> 0 AND doc_id % 11 <> 0) AS is_page,
         len({D_TOKENS}) AS nt
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN st.ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
       CAST(sum(CASE WHEN st.is_page THEN 1 ELSE 0 END) AS BIGINT) AS n_pages,
       CAST(sum(CASE WHEN st.is_page AND qf.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(coalesce(sum(CASE WHEN st.is_page AND qf.keep THEN st.nt ELSE 0 END), 0) AS BIGINT) AS kept_tokens
FROM st JOIN qf USING (doc_id)
GROUP BY source
"""


def q_warc_reshard_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-shard round-trip through the gate: documents -> to_warc_shards
    (deterministic id-keyed archives of HTTP-enveloped records) -> the
    REAL warc_records + http_responses readers -> per-shard census. The
    oracle states the census closed-form from the id arithmetic — every
    body must survive the envelope encode/decode byte-exactly."""
    from audit_star_spark.sources.warc import (
        http_responses,
        to_warc_shards,
        warc_records,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    shards = to_warc_shards(docs, docs_per_shard=64)
    resp = http_responses(
        warc_records(
            shards.select(
                F.col("shard_id").alias("archive_id"), F.col("payload")
            )
        )
    )
    return resp.groupBy("archive_id").agg(
        F.count("*").cast("long").alias("n_records"),
        F.sum(F.when(F.col("http_status") == 200, 1).otherwise(0))
        .cast("long")
        .alias("n_ok"),
        F.sum(F.length("body")).cast("long").alias("body_bytes"),
        F.min("target_uri").alias("first_uri"),
    )


SQL_WARC_RESHARD_CENSUS = """
SELECT doc_id // 64 AS archive_id,
       CAST(count(*) AS BIGINT) AS n_records,
       CAST(count(*) AS BIGINT) AS n_ok,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS body_bytes,
       'https://example.org/' || min(CAST(doc_id AS VARCHAR)) AS first_uri
FROM documents
GROUP BY doc_id // 64
"""


def q_vision_prep_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vision preprocessing chain through the gate: constant-color
    netpbm synthesis (size keyed off doc_id) -> decode -> hflip (odd
    ids) -> bilinear resize -> center crop -> re-encode; constants are
    a fixed point of every stage, so the oracle states dims and mean
    exactly (the interpolation arithmetic itself is differentially
    locked in tests/test_vision_prep.py against a scalar reference)."""
    import numpy as np

    from audit_star_spark.analytics.multimodal import (
        encode_netpbm,
        vision_preprocess,
    )
    from audit_star_spark.util import spread

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                img = np.full(
                    (3 + d % 4, 4 + d % 5, 3), (d * 31) % 256, dtype=np.uint8
                )
                payloads.append(encode_netpbm(img))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    media = spread(docs).mapInPandas(synth, schema)
    out = vision_preprocess(media, 10, 8, crop=(6, 6), flip=True)
    return out.select("doc_id", "width", "height", "mean_luma")


SQL_VISION_PREP_CENSUS = """
SELECT doc_id,
       CAST(6 AS INT) AS width,
       CAST(6 AS INT) AS height,
       CAST((doc_id * 31) % 256 AS DOUBLE) AS mean_luma
FROM documents
"""


def q_hll_event_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL distinct sketch through the gate (analytics/
    sketch.py): per event_type, the register-row sketch estimate of
    distinct users next to the exact count and the 4-sigma accuracy
    contract flag. The oracle rebuilds the SAME md5-derived registers
    and sorted-fold estimator in DuckDB — the approximate answer itself
    hash-matches bit-for-bit (an auditable approximation, unlike opaque
    aggregation-buffer sketches)."""
    from audit_star_spark.analytics.sketch import HLL_RSE, hll_distinct

    ev = load_table(spark, sf_dir, "events")
    est = hll_distinct(ev, ["event_type"], "user_id")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    contract = F.abs(F.col("est_distinct") - F.col("n_exact")) <= F.greatest(
        F.lit(4.0 * HLL_RSE) * F.col("n_exact"), F.lit(8.0)
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "est_distinct",
        "n_hit",
        "zeros",
        "n_exact",
        contract.alias("within_contract"),
    )


def _hll_event_users_sql() -> str:
    from audit_star_spark.analytics.sketch import HLL_RSE, hll_sql

    inner = hll_sql("events", ["event_type"], "user_id")
    return f"""
WITH sk AS ({inner}),
ex AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type
)
SELECT sk.event_type, sk.est_distinct, sk.n_hit, sk.zeros, ex.n_exact,
       (abs(sk.est_distinct - ex.n_exact)
          <= greatest(CAST({4.0 * HLL_RSE!r} AS DOUBLE) * ex.n_exact,
                      CAST(8.0 AS DOUBLE))) AS within_contract
FROM sk JOIN ex USING (event_type)
"""


def q_kmv_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta set-operation sketches through the gate: bottom-k
    (k=8, forcing the estimator regime at every SF) user sketches for
    the click and purchase audiences; union estimate via in-row
    merge+re-truncate, intersection via the theta rule, next to exact
    counts. Every number is deterministic md5-derived arithmetic — the
    oracle reproduces the ESTIMATES bit-for-bit."""
    from audit_star_spark.analytics.sketch import (
        kmv_estimate_expr,
        kmv_intersection_expr,
        kmv_merge_expr,
        kmv_partials,
    )

    k = 8
    ev = load_table(spark, sf_dir, "events")
    sk = kmv_partials(
        ev.filter(F.col("event_type").isin("click", "purchase")),
        ["event_type"],
        "user_id",
        k=k,
    )
    a = sk.filter(F.col("event_type") == "click").select(
        F.col("hs").alias("hs_a")
    )
    b = sk.filter(F.col("event_type") == "purchase").select(
        F.col("hs").alias("hs_b")
    )
    pair = a.crossJoin(b).withColumn(
        "hs_u", kmv_merge_expr("hs_a", "hs_b", k=k)
    )
    flags = ev.filter(F.col("event_type").isin("click", "purchase")).groupBy(
        "user_id"
    ).agg(
        F.max((F.col("event_type") == "click").cast("int")).alias("in_a"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("in_b"),
    )
    exact = flags.agg(
        F.sum("in_a").cast("long").alias("n_click"),
        F.sum("in_b").cast("long").alias("n_purchase"),
        F.count("*").cast("long").alias("n_union"),
        F.sum((F.col("in_a") * F.col("in_b"))).cast("long").alias("n_inter"),
    )
    return pair.crossJoin(F.broadcast(exact)).select(
        F.round(kmv_estimate_expr("hs_a", k=k), 6).alias("est_click"),
        F.round(kmv_estimate_expr("hs_b", k=k), 6).alias("est_purchase"),
        F.round(kmv_estimate_expr("hs_u", k=k), 6).alias("est_union"),
        F.round(kmv_intersection_expr("hs_a", "hs_b", k=k), 6).alias(
            "est_inter"
        ),
        "n_click",
        "n_purchase",
        "n_union",
        "n_inter",
    )


def _kmv_overlap_sql(k: int = 8) -> str:
    from audit_star_spark.analytics.sketch import KMV_H, kmv_sql_partials

    inner = kmv_sql_partials(
        "(SELECT * FROM events WHERE event_type IN ('click', 'purchase'))",
        ["event_type"],
        "user_id",
        k=k,
    )
    H = f"CAST({KMV_H} AS DOUBLE)"

    def est(hs):
        return (
            f"CASE WHEN len({hs}) < {k} THEN CAST(len({hs}) AS DOUBLE) "
            f"ELSE ({k} - 1) * {H} / {hs}[{k}] END"
        )

    theta = (
        f"least(CASE WHEN len(hs_a) < {k} THEN {H} ELSE CAST(hs_a[{k}] AS DOUBLE) END, "
        f"CASE WHEN len(hs_b) < {k} THEN {H} ELSE CAST(hs_b[{k}] AS DOUBLE) END)"
    )
    return f"""
WITH sk AS ({inner}),
pair AS (
  SELECT a.hs AS hs_a, b.hs AS hs_b,
         list_sort(list_distinct(list_concat(a.hs, b.hs)))[1:{k}] AS hs_u
  FROM (SELECT hs FROM sk WHERE event_type = 'click') a
  CROSS JOIN (SELECT hs FROM sk WHERE event_type = 'purchase') b
),
flags AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_b
  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY user_id
),
exact AS (
  SELECT CAST(SUM(in_a) AS BIGINT) AS n_click,
         CAST(SUM(in_b) AS BIGINT) AS n_purchase,
         CAST(COUNT(*) AS BIGINT) AS n_union,
         CAST(SUM(in_a * in_b) AS BIGINT) AS n_inter
  FROM flags
)
SELECT round({est('hs_a')}, 6) AS est_click,
       round({est('hs_b')}, 6) AS est_purchase,
       round({est('hs_u')}, 6) AS est_union,
       round(len(list_filter(list_intersect(hs_a, hs_b), x -> x < {theta}))
               * {H} / {theta}, 6) AS est_inter,
       n_click, n_purchase, n_union, n_inter
FROM pair CROSS JOIN exact
"""


def q_doc_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting (analytics/graph.py triangle_count) over the
    SAME deterministic doc link graph doc_pagerank uses — the
    degree-oriented compact-forward algorithm (O(E^1.5) wedges, no
    all-pairs), with the oracle replaying the identical orientation and
    wedge-close joins in SQL."""
    from audit_star_spark.analytics.graph import triangle_count

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    nd = docs.agg(F.count("*").alias("n"))
    linkers = docs.filter(F.col("doc_id") % 17 != 0).crossJoin(F.broadcast(nd))
    edges = linkers.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 1) % F.col("n")).alias("dst"),
    ).unionByName(
        linkers.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 13 + 3) % F.col("n")).alias("dst"),
        )
    )
    return triangle_count(edges).withColumnRenamed("node", "doc_id")


def _doc_triangles_sql() -> str:
    from audit_star_spark.analytics.graph import triangle_sql

    edges_cte = """nn0 AS (SELECT count(*) AS n FROM documents),
linkers AS (SELECT doc_id FROM documents WHERE doc_id % 17 <> 0),
edges AS (
  SELECT doc_id AS src, (doc_id * 7 + 1) % nn0.n AS dst FROM linkers CROSS JOIN nn0
  UNION ALL
  SELECT doc_id AS src, (doc_id * 13 + 3) % nn0.n AS dst FROM linkers CROSS JOIN nn0
)"""
    inner = triangle_sql(edges_cte)
    return f"SELECT node AS doc_id, n_triangles FROM ({inner})"


_HDR_QS = [0.5, 0.9, 0.99]


def q_price_quantiles_hdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HDR log-linear quantile sketch through the gate
    (analytics/sketch.py hdr_*): per l_returnflag, the p50/p90/p99
    bucket of l_extendedprice in integer cents. All bucket math is
    integer-exact (bit length + top-bits, no float log), so the
    DuckDB oracle reproduces lo/hi/est bit-for-bit; the ``contained``
    contract — the bucket [lo, hi] holds the exact nearest-rank order
    statistic, guaranteed by construction — is checked against the
    exact window quantile in BOTH engines."""
    from pyspark.sql import Window

    from audit_star_spark.analytics.sketch import hdr_partials, hdr_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    cents = li.select(
        "l_returnflag",
        F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("cents"),
    )
    sk = hdr_quantiles(
        hdr_partials(cents, ["l_returnflag"], "cents"),
        ["l_returnflag"],
        _HDR_QS,
    )
    w = Window.partitionBy("l_returnflag").orderBy("cents")
    wall = Window.partitionBy("l_returnflag")
    exact = (
        cents.withColumn("rn", F.row_number().over(w))
        .withColumn("nn", F.count("*").over(wall))
        .withColumn(
            "q", F.explode(F.array(*[F.lit(float(q)) for q in _HDR_QS]))
        )
        .filter(
            F.col("rn")
            == F.greatest(
                F.lit(1).cast("long"), F.expr("cast(ceil(q * nn) as bigint)")
            )
        )
        .select("l_returnflag", "q", F.col("cents").alias("exact_cents"))
    )
    return sk.join(exact, ["l_returnflag", "q"]).select(
        "l_returnflag",
        "q",
        "n",
        "lo",
        "hi",
        "est",
        "exact_cents",
        (
            (F.col("lo") <= F.col("exact_cents"))
            & (F.col("exact_cents") <= F.col("hi"))
        ).alias("contained"),
    )


def _price_quantiles_hdr_sql() -> str:
    from audit_star_spark.analytics.sketch import hdr_sql

    inner = hdr_sql(
        "lineitem",
        ["l_returnflag"],
        "cast(round(l_extendedprice * 100) as bigint)",
        _HDR_QS,
    )
    qlist = ", ".join(f"CAST({float(q)!r} AS DOUBLE)" for q in _HDR_QS)
    return f"""
WITH sk AS ({inner}),
ranked AS (
  SELECT l_returnflag, cast(round(l_extendedprice * 100) as bigint) AS cents,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY cast(round(l_extendedprice * 100) as bigint)) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS nn
  FROM lineitem
),
exact AS (
  SELECT l_returnflag, q, cents AS exact_cents
  FROM ranked CROSS JOIN (SELECT UNNEST([{qlist}]) AS q) qq
  WHERE rn = GREATEST(1, CAST(ceil(q * nn) AS BIGINT))
)
SELECT sk.l_returnflag, sk.q, sk.n, sk.lo, sk.hi, sk.est, exact.exact_cents,
       (sk.lo <= exact.exact_cents AND exact.exact_cents <= sk.hi) AS contained
FROM sk JOIN exact ON sk.l_returnflag = exact.l_returnflag AND sk.q = exact.q
"""


def q_bloom_prefilter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom semi-join pre-filter through the gate (plans/
    bloom_join.py): lineitem rows joining the p_size = 1 parts. The
    REAL operator runs — a driver-built 512-bit md5-seeded bitmap
    evaluated as one codegen filter on the fact scan, then the exact
    broadcast semi-join — and the report shows the shuffle-reduction
    accounting per returnflag: rows scanned, bloom candidates (the only
    rows that would enter the join shuffle at scale), true matches, and
    surviving false positives. The oracle reproduces the candidate set
    bit-for-bit from the same seeded positions."""
    from audit_star_spark.plans.bloom_join import (
        bloom_build,
        bloom_probe_filter,
    )

    m_bits, k = 512, 4
    small = load_table(spark, sf_dir, "part").filter("p_size = 1")
    li = load_table(spark, sf_dir, "lineitem")
    words = bloom_build(small, "p_partkey", m_bits, k)
    keys = small.select(F.col("p_partkey").alias("l_partkey")).distinct()
    cand = (
        bloom_probe_filter(li, "l_partkey", words, m_bits, k)
        .join(
            F.broadcast(keys.withColumn("is_true", F.lit(1))),
            "l_partkey",
            "left",
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n_candidates"),
            F.sum(F.coalesce(F.col("is_true"), F.lit(0)))
            .cast("long")
            .alias("n_true"),
        )
    )
    scanned = li.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n_scanned")
    )
    return scanned.join(cand, "l_returnflag", "left").select(
        "l_returnflag",
        "n_scanned",
        F.coalesce(F.col("n_candidates"), F.lit(0)).cast("long").alias("n_candidates"),
        F.coalesce(F.col("n_true"), F.lit(0)).cast("long").alias("n_true"),
        (
            F.coalesce(F.col("n_candidates"), F.lit(0))
            - F.coalesce(F.col("n_true"), F.lit(0))
        ).cast("long").alias("n_false_pos"),
    )


def _bloom_prefilter_sql() -> str:
    from audit_star_spark.plans.bloom_join import (
        bloom_pos_cte_sql,
        bloom_probe_sql,
    )

    m_bits, k = 512, 4
    cte = bloom_pos_cte_sql(
        "SELECT p_partkey FROM part WHERE p_size = 1", "p_partkey", m_bits, k
    )
    pred = bloom_probe_sql("l_partkey", None, None, m_bits, k)
    return f"""
WITH __bloom_pos AS ({cte}),
truekeys AS (SELECT DISTINCT p_partkey FROM part WHERE p_size = 1),
cand AS (
  SELECT l.l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n_candidates,
         CAST(SUM(CASE WHEN t.p_partkey IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_true
  FROM lineitem l LEFT JOIN truekeys t ON l.l_partkey = t.p_partkey
  WHERE {pred}
  GROUP BY l.l_returnflag
),
scanned AS (
  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_scanned
  FROM lineitem GROUP BY l_returnflag
)
SELECT s.l_returnflag, s.n_scanned,
       CAST(COALESCE(c.n_candidates, 0) AS BIGINT) AS n_candidates,
       CAST(COALESCE(c.n_true, 0) AS BIGINT) AS n_true,
       CAST(COALESCE(c.n_candidates, 0) - COALESCE(c.n_true, 0) AS BIGINT)
         AS n_false_pos
FROM scanned s LEFT JOIN cand c ON s.l_returnflag = c.l_returnflag
"""


def q_customer_fuzzy_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy record linkage through the gate (analytics/linkage.py):
    every seventh customer's name is corrupted by a key-derived
    single-character deletion, then linked back against the clean roster
    at edit distance <= 1 via FastSS symmetric-deletion blocking + the
    built-in levenshtein verify. The oracle is the ALL-PAIRS
    levenshtein join — exactly what the blocking provably reproduces
    without the quadratic scan."""
    from audit_star_spark.analytics.linkage import fuzzy_link_lev1

    cust = load_table(spark, sf_dir, "customer")
    pos = "cast(c_custkey % length(c_name) as int)"
    dirty = cust.filter("c_custkey % 7 = 0").selectExpr(
        "c_custkey AS dirty_id",
        f"concat(substring(c_name, 1, {pos}), "
        f"substring(c_name, {pos} + 2)) AS dirty_name",
    )
    links = fuzzy_link_lev1(
        dirty, cust, "dirty_id", "dirty_name", "c_custkey", "c_name"
    )
    return links.select(
        F.col("id_l").alias("dirty_id"),
        F.col("s_l").alias("dirty_name"),
        F.col("id_r").alias("c_custkey"),
        F.col("s_r").alias("c_name"),
        F.col("dist").cast("int").alias("dist"),
    )


SQL_CUSTOMER_FUZZY_LINKS = """
WITH dirty AS (
  SELECT c_custkey AS dirty_id,
         substring(c_name, 1, CAST(c_custkey % length(c_name) AS INTEGER))
           || substring(c_name,
                        CAST(c_custkey % length(c_name) AS INTEGER) + 2)
           AS dirty_name
  FROM customer WHERE c_custkey % 7 = 0
)
SELECT d.dirty_id, d.dirty_name, c.c_custkey, c.c_name,
       CAST(levenshtein(d.dirty_name, c.c_name) AS INTEGER) AS dist
FROM dirty d CROSS JOIN customer c
WHERE levenshtein(d.dirty_name, c.c_name) <= 1
"""


def q_cms_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch through the gate (analytics/
    sketch.py cms_*): per event_type, the d=3 x w=256 counter table
    over user_id, probed at the 10 hottest exact (type, user) cells.
    The classic CMS one-sided contract — the estimate NEVER
    undercounts — is reported as a flag; every counter is seeded md5
    integer math, so the oracle reproduces the estimates exactly."""
    from audit_star_spark.analytics.sketch import cms_estimate, cms_partials

    w, d = 256, 3
    ev = load_table(spark, sf_dir, "events")
    partials = cms_partials(ev, ["event_type"], "user_id", w, d)
    exact = ev.groupBy("event_type", "user_id").agg(
        F.count("*").cast("long").alias("n_exact")
    )
    probes = (
        exact.orderBy(F.desc("n_exact"), "event_type", "user_id")
        .limit(10)
        .select("event_type", "user_id")
    )
    est = cms_estimate(partials, probes, ["event_type"], "user_id", w, d)
    return est.join(exact, ["event_type", "user_id"]).select(
        "event_type",
        "user_id",
        "n_exact",
        "est",
        (F.col("est") >= F.col("n_exact")).alias("never_under"),
    )


def _cms_event_counts_sql() -> str:
    from audit_star_spark.analytics.sketch import cms_sql

    probes_sql = (
        "SELECT event_type, user_id FROM ("
        "SELECT event_type, user_id, COUNT(*) AS c FROM events "
        "GROUP BY event_type, user_id "
        "ORDER BY c DESC, event_type, user_id LIMIT 10)"
    )
    inner = cms_sql(
        "events", ["event_type"], "user_id", probes_sql, "user_id", 256, 3
    )
    return f"""
WITH est AS ({inner}),
exact AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type, user_id
)
SELECT est.event_type, est.user_id, exact.n_exact, est.est,
       (est.est >= exact.n_exact) AS never_under
FROM est JOIN exact USING (event_type, user_id)
"""


def _synth_y4m(spark_df):
    """doc_id-keyed Y4M synthesis (mapInPandas): nf = 1 + d%4 frames of
    16x8, frame f's constant luma = (d*7 + f*13) % 256; even docs are
    Cmono, odd docs planar C444 (neutral chroma); every third doc runs
    at the NTSC 30000/1001 rate. Constant planes make per-frame mean_y
    exactly the synthesized value."""
    from pyspark.sql import types as T

    from audit_star_spark.util import spread

    def synth(batches):
        import numpy as np
        import pandas as pd

        from audit_star_spark.analytics.multimodal import encode_y4m

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                fps = (30000, 1001) if d % 3 == 0 else (25, 1)
                frames = []
                for f in range(1 + d % 4):
                    y = np.full((8, 16), (d * 7 + f * 13) % 256, np.uint8)
                    if d % 2 == 0:
                        frames.append(y)
                    else:
                        frames.append(
                            np.stack([y, np.full_like(y, 128), np.full_like(y, 128)])
                        )
                payloads.append(
                    encode_y4m(
                        frames, fps, "Cmono" if d % 2 == 0 else "C444"
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return spread(spark_df).mapInPandas(
        synth,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def q_y4m_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Y4M (yuv4mpeg) stream walk through the gate: header grammar
    parse (W/H/F/I/C tags), exact per-colorspace plane strides, per-
    frame luma means — over synthesized Cmono and planar C444 streams
    at PAL and NTSC rates. The oracle states every field in closed
    form."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return multimodal.y4m_frame_means(_synth_y4m(docs))


SQL_Y4M_CENSUS = """
WITH f AS (
  SELECT doc_id, unnest(generate_series(0, doc_id % 4)) AS frame_idx
  FROM documents
)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(16 AS INT) AS width, CAST(8 AS INT) AS height,
       CASE WHEN doc_id % 2 = 0 THEN 'Cmono' ELSE 'C444' END AS colorspace,
       round(CASE WHEN doc_id % 3 = 0 THEN 30000.0 / 1001 ELSE 25.0 END,
             6) AS fps,
       CAST((doc_id * 7 + frame_idx * 13) % 256 AS DOUBLE) AS mean_y
FROM f
"""


def q_pq_topk_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization through the gate (analytics/pq.py): 4
    subspaces x 16 codewords over the 64-dim embeddings (one Lloyd
    round from the deterministic seed — the oracle-checkable unit, as
    for ivf_index_probe), asymmetric-distance top-5 per query scored
    against the exact L2 top-5. The oracle replays codebook training,
    encoding, the ADC table and both rankings with identical sorted
    folds and tie-breaks — the RECALL itself hash-matches."""
    from audit_star_spark.analytics.pq import pq_recall

    return pq_recall(
        load_table(spark, sf_dir, "embeddings"),
        m_sub=4,
        k=16,
        n_queries=8,
        k_nn=5,
    )


def _d2(a: str, b: str) -> str:
    """DuckDB squared-L2 over two lists (index-order fold, matching
    Spark's in-row zip_with/aggregate)."""
    return d_fold(
        f"list_transform(list_zip({a}, {b}), "
        "x -> (x[1] - x[2]) * (x[1] - x[2]))",
        "CAST(0.0 AS DOUBLE)",
        "(s, v) -> s + v",
    )


def _pq_codebook_ctes(
    m_sub: int, k: int, dim: int, base_cte: str = "base"
) -> str:
    """The shared PQ oracle block (assumes a ``base_cte(vec_id, vec)``
    CTE is already in scope — raw vectors, or coarse residuals for the
    IVFADC replay): subvector explode, seeded one-round Lloyd per
    subspace, and the final code assignment — CTEs ``sub .. enc``."""
    w = dim // m_sub
    d2 = _d2
    return f"""sub AS (
  SELECT vec_id, s.sub_id,
         list_slice(vec, s.sub_id * {w} + 1, s.sub_id * {w} + {w}) AS svec
  FROM {base_cte} CROSS JOIN (SELECT UNNEST(range({m_sub})) AS sub_id) s
),
seeds AS (
  SELECT sub_id, vec_id AS cell_id, svec AS centroid
  FROM sub WHERE vec_id < {k}
),
pq_assigned AS (
  SELECT vec_id, sub_id, svec, cell_id FROM (
    SELECT b.vec_id, b.sub_id, b.svec, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY b.vec_id, b.sub_id
                              ORDER BY {d2('b.svec', 'c.centroid')},
                                       c.cell_id) AS rn
    FROM sub b JOIN seeds c USING (sub_id)
  ) WHERE rn = 1
),
pq_dims AS (
  SELECT sub_id, cell_id, i - 1 AS pos, svec[i] AS x FROM (
    SELECT sub_id, cell_id, svec,
           unnest(generate_series(1, len(svec))) AS i
    FROM pq_assigned
  )
),
pq_sums AS (
  SELECT sub_id, cell_id, pos,
         {d_fold('list_sort(list(x))', 'CAST(0.0 AS DOUBLE)',
                 '(s, v) -> s + v')} AS s,
         COUNT(*) AS n
  FROM pq_dims GROUP BY 1, 2, 3
),
codebook AS (
  SELECT sub_id, cell_id,
         list_transform(list_sort(list(struct_pack(pos := pos, m := m))),
                        x -> x.m) AS centroid
  FROM (SELECT sub_id, cell_id, pos, s / n AS m FROM pq_sums)
  GROUP BY 1, 2
),
enc AS (
  SELECT vec_id, sub_id, cell_id FROM (
    SELECT b.vec_id, b.sub_id, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY b.vec_id, b.sub_id
                              ORDER BY {d2('b.svec', 'c.centroid')},
                                       c.cell_id) AS rn
    FROM sub b JOIN codebook c USING (sub_id)
  ) WHERE rn = 1
)"""


def _pq_recall_sql(
    m_sub: int = 4, k: int = 16, n_queries: int = 8, k_nn: int = 5, dim: int = 64
) -> str:
    w = dim // m_sub

    def d2(a: str, b: str) -> str:
        return _d2(a, b)

    sorted_sum = d_fold(
        "list_sort(list(pd))", "CAST(0.0 AS DOUBLE)", "(s, v) -> s + v"
    )
    return f"""
WITH base AS (
  SELECT vec_id, {D_VEC} AS vec FROM embeddings
),
{_pq_codebook_ctes(m_sub, k, dim)},
queries AS (
  SELECT vec_id AS query_id, vec AS qvec FROM base WHERE vec_id < {n_queries}
),
qsub AS (
  SELECT query_id, s.sub_id,
         list_slice(qvec, s.sub_id * {w} + 1, s.sub_id * {w} + {w}) AS qsvec
  FROM queries CROSS JOIN (SELECT UNNEST(range({m_sub})) AS sub_id) s
),
tbl AS (
  SELECT q.query_id, q.sub_id, c.cell_id,
         {d2('q.qsvec', 'c.centroid')} AS pd
  FROM qsub q JOIN codebook c USING (sub_id)
),
adc AS (
  SELECT t.query_id, e.vec_id, {sorted_sum} AS adc
  FROM enc e JOIN tbl t ON e.sub_id = t.sub_id AND e.cell_id = t.cell_id
  GROUP BY 1, 2
),
atop AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY adc, vec_id) AS rk
    FROM adc
  ) WHERE rk <= {k_nn}
),
ex AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, b.vec_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY {d2('b.vec', 'q.qvec')},
                                       b.vec_id) AS rk
    FROM base b CROSS JOIN queries q
  ) WHERE rk <= {k_nn}
),
hits AS (
  SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM atop a JOIN ex USING (query_id, vec_id) GROUP BY 1
)
SELECT q.query_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(COALESCE(h.n_hits, 0) / CAST({float(k_nn)!r} AS DOUBLE), 6)
         AS recall
FROM queries q LEFT JOIN hits h USING (query_id)
"""


def q_ivfpq_probe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL persisted IVF-PQ path through the gate
    (analytics/ivf_index.py add_pq_codes + probe_pq, RESIDUAL encoding
    — standard IVFADC, Jégou et al. 2011 §IV): coarse cells prune the
    scan via static partition filters, PQ codebooks are trained on
    x - coarse_centroid(cell(x)), and candidates rank by asymmetric
    distance of the per-cell query residual over their 4 int codes —
    the corpus' float vectors are never read at probe time. Scored
    against the exact L2 top-5; the oracle replays coarse k-means,
    cell probing, residual codebooks, encoding and the per-cell ADC
    ranking with identical folds and tie-breaks."""
    import os
    import tempfile

    from pyspark.sql import Window

    from audit_star_spark.analytics.ivf_index import (
        add_pq_codes,
        build_ivf_index,
        probe_pq,
    )
    from audit_star_spark.analytics.similarity import VEC_EXPR

    k_nn, n_probe = 5, 4
    emb = load_table(spark, sf_dir, "embeddings")
    d = tempfile.mkdtemp(prefix="ivfpq_gate_")
    idx = build_ivf_index(emb, os.path.join(d, "idx"), n_cells=16, iters=1)
    add_pq_codes(idx, emb, m_sub=4, k_codes=16)
    base = emb.select("vec_id", F.expr(VEC_EXPR).alias("vec"))
    queries = base.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    approx = probe_pq(idx, queries, k=k_nn, n_probe=n_probe).select(
        "query_id", "vec_id"
    )
    d2 = (
        "aggregate(zip_with(vec, qvec, (x, y) -> (x - y) * (x - y)), "
        "CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
    )
    w = Window.partitionBy("query_id").orderBy("d2", "vec_id")
    exact = (
        base.join(F.broadcast(queries))
        .select("query_id", "vec_id", F.expr(d2).alias("d2"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_nn)
        .select("query_id", "vec_id")
    )
    hits = approx.join(exact, ["query_id", "vec_id"]).groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_hits")
    )
    return (
        queries.select("query_id")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(k_nn)), 6
            ).alias("recall"),
        )
    )


def _ivfpq_adc_ctes(
    n_cells: int = 16,
    m_sub: int = 4,
    k_codes: int = 16,
    n_queries: int = 8,
    n_probe: int = 4,
    dim: int = 64,
    by_residual: bool = True,
) -> str:
    """The shared IVF-PQ oracle pipeline — coarse k-means, assignment,
    probing, PQ codebooks/codes, and the ADC ranking input — as one CTE
    string ``WITH km .. adc`` (adc = (query_id, vec_id, adc)); the
    recall and re-rank oracles append their own tails.
    ``by_residual=True`` (the add_pq_codes default — standard IVFADC)
    trains/encodes on ``x - coarse_centroid(cell(x))`` (CTE ``rbase``)
    and tabulates the per-(query, probed cell) residual against the
    codewords, keyed by cell; ``False`` replays the raw-vector layout
    with one global per-query table."""
    w = dim // m_sub
    sorted_sum = d_fold(
        "list_sort(list(pd))", "CAST(0.0 AS DOUBLE)", "(s, v) -> s + v"
    )
    if by_residual:
        pq_block = f"""rbase AS (
  SELECT b.vec_id,
         list_transform(list_zip(b.vec, t.cvec), x -> x[1] - x[2]) AS vec
  FROM base b
  JOIN coarse co ON co.vec_id = b.vec_id
  JOIN tcents t ON t.cell_id = co.cell_id
),
{_pq_codebook_ctes(m_sub, k_codes, dim, base_cte="rbase")},
qres AS (
  SELECT p.query_id, p.cell_id,
         list_transform(list_zip(q.qvec, t.cvec), x -> x[1] - x[2]) AS rq
  FROM probes p
  JOIN queries q ON q.query_id = p.query_id
  JOIN tcents t ON t.cell_id = p.cell_id
),
qsub AS (
  SELECT query_id, cell_id, s.sub_id,
         list_slice(rq, s.sub_id * {w} + 1, s.sub_id * {w} + {w}) AS qsvec
  FROM qres CROSS JOIN (SELECT UNNEST(range({m_sub})) AS sub_id) s
),
tbl AS (
  SELECT q.query_id, q.cell_id, q.sub_id, c.cell_id AS code,
         {_d2('q.qsvec', 'c.centroid')} AS pd
  FROM qsub q JOIN codebook c ON c.sub_id = q.sub_id
),
cand AS (
  SELECT p.query_id, p.cell_id, e.vec_id, e.sub_id, e.cell_id AS code
  FROM enc e
  JOIN coarse co ON co.vec_id = e.vec_id
  JOIN probes p ON p.cell_id = co.cell_id
),
adc AS (
  SELECT c.query_id, c.vec_id, {sorted_sum} AS adc
  FROM cand c JOIN tbl t
    ON t.query_id = c.query_id AND t.cell_id = c.cell_id
   AND t.sub_id = c.sub_id AND t.code = c.code
  GROUP BY 1, 2
)"""
    else:
        pq_block = f"""{_pq_codebook_ctes(m_sub, k_codes, dim)},
qsub AS (
  SELECT query_id, s.sub_id,
         list_slice(qvec, s.sub_id * {w} + 1, s.sub_id * {w} + {w}) AS qsvec
  FROM queries CROSS JOIN (SELECT UNNEST(range({m_sub})) AS sub_id) s
),
tbl AS (
  SELECT q.query_id, q.sub_id, c.cell_id AS code,
         {_d2('q.qsvec', 'c.centroid')} AS pd
  FROM qsub q JOIN codebook c USING (sub_id)
),
cand AS (
  SELECT p.query_id, e.vec_id, e.sub_id, e.cell_id AS code
  FROM enc e
  JOIN coarse co ON co.vec_id = e.vec_id
  JOIN probes p ON p.cell_id = co.cell_id
),
adc AS (
  SELECT c.query_id, c.vec_id, {sorted_sum} AS adc
  FROM cand c JOIN tbl t
    ON t.query_id = c.query_id AND t.sub_id = c.sub_id AND t.code = c.code
  GROUP BY 1, 2
)"""
    return f"""
WITH km AS ({_kmeans_core_sql(n_cells)}),
tcents AS (
  SELECT cell_id, centroid AS cvec,
         sqrt({d_dot('centroid', 'centroid')}) AS cnorm
  FROM km
),
base AS (
  SELECT vec_id, {D_VEC} AS vec FROM embeddings
),
normed2 AS (
  SELECT vec_id, vec, sqrt({d_dot('vec', 'vec')}) AS norm FROM base
),
coarse AS (
  SELECT vec_id, cell_id FROM (
    SELECT n.vec_id, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY n.vec_id
                              ORDER BY {d_dot('c.cvec', 'n.vec')}
                                       / (c.cnorm * n.norm) DESC,
                                       c.cell_id) AS crank
    FROM normed2 n CROSS JOIN tcents c
  ) WHERE crank = 1
),
queries AS (
  SELECT vec_id AS query_id, vec AS qvec,
         sqrt({d_dot('vec', 'vec')}) AS qnorm
  FROM base WHERE vec_id < {n_queries}
),
probes AS (
  SELECT query_id, cell_id FROM (
    SELECT q.query_id, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY {d_dot('c.cvec', 'q.qvec')}
                                       / (c.cnorm * q.qnorm) DESC,
                                       c.cell_id) AS crank
    FROM queries q CROSS JOIN tcents c
  ) WHERE crank <= {n_probe}
),
{pq_block}"""


def _ivfpq_recall_sql(
    n_cells: int = 16,
    m_sub: int = 4,
    k_codes: int = 16,
    n_queries: int = 8,
    k_nn: int = 5,
    n_probe: int = 4,
    dim: int = 64,
    by_residual: bool = True,
) -> str:
    ctes = _ivfpq_adc_ctes(
        n_cells, m_sub, k_codes, n_queries, n_probe, dim, by_residual
    )
    return f"""
{ctes},
atop AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY adc, vec_id) AS rk
    FROM adc
  ) WHERE rk <= {k_nn}
),
ex AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, b.vec_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY {_d2('b.vec', 'q.qvec')},
                                       b.vec_id) AS rk
    FROM base b CROSS JOIN queries q
  ) WHERE rk <= {k_nn}
),
hits AS (
  SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM atop a JOIN ex USING (query_id, vec_id) GROUP BY 1
)
SELECT q.query_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(COALESCE(h.n_hits, 0) / CAST({float(k_nn)!r} AS DOUBLE), 6)
         AS recall
FROM queries q LEFT JOIN hits h USING (query_id)
"""


def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join cardinality estimation through the gate (analytics/
    sketch.py cms_join_size_estimate): |orders ⋈ lineitem| on orderkey
    from two Count-Min sketches — the Cormode-Muthukrishnan
    inner-product estimate, min over d hash rows, which NEVER
    undercounts. The scale use: decide whether a join will explode
    from two d x w sketch tables before shuffling anything. Estimate
    and flag hash-match the oracle (integer-exact)."""
    from audit_star_spark.analytics.sketch import (
        cms_join_size_estimate,
        cms_partials,
    )

    w, d = 256, 3
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pa = cms_partials(orders, [], "o_orderkey", w, d)
    pb = cms_partials(li, [], "l_orderkey", w, d)
    est = cms_join_size_estimate(pa, pb, [], w, d)
    true = orders.join(
        li, orders["o_orderkey"] == li["l_orderkey"]
    ).agg(F.count("*").cast("long").alias("true_join_size"))
    return est.crossJoin(true).select(
        "est_join_size",
        "true_join_size",
        (F.col("est_join_size") >= F.col("true_join_size")).alias(
            "never_under"
        ),
    )


def _join_size_sql() -> str:
    from audit_star_spark.analytics.sketch import cms_join_size_sql

    inner = cms_join_size_sql(
        "orders", "o_orderkey", "lineitem", "l_orderkey", 256, 3
    )
    return f"""
WITH est AS ({inner}),
tru AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS true_join_size
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
)
SELECT est.est_join_size, tru.true_join_size,
       (est.est_join_size >= tru.true_join_size) AS never_under
FROM est CROSS JOIN tru
"""


def _synth_g711(spark_df):
    """doc_id-keyed G.711 WAV synthesis (mapInPandas): n = 16 + d%16
    companded bytes with byte_i = (d*31 + i*7) % 256; even docs mu-law
    (format 7), odd docs A-law (format 6), 8 kHz."""
    from pyspark.sql import types as T

    from audit_star_spark.util import spread

    def synth(batches):
        import pandas as pd

        from audit_star_spark.analytics.multimodal import encode_wav_g711

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 16 + d % 16
                raw = bytes((d * 31 + i * 7) % 256 for i in range(n))
                law = "ulaw" if d % 2 == 0 else "alaw"
                payloads.append(encode_wav_g711(raw, 8000, law))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return spread(spark_df).mapInPandas(
        synth,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def q_g711_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL ITU-T G.711 decode through the gate (multimodal.py
    _g711_table + the WAV chunk walk): mu-law and A-law payloads
    linearized to int16, reported as exact INTEGER sample stats. The
    oracle replays the spec's segment arithmetic in pure SQL — the
    decoded values themselves are cross-checked, not just shapes."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return multimodal.g711_sample_stats(_synth_g711(docs))


# G.711 decode as pure SQL integer arithmetic: u-law is
# t = (((~b & 15) << 3) + 132) << ((~b >> 4) & 7), signed by bit 7 of ~b;
# A-law xors with 0x55 then applies the segment ladder.
SQL_G711_CENSUS = """
WITH f AS (
  SELECT doc_id, unnest(generate_series(0, 15 + doc_id % 16)) AS i
  FROM documents
),
b AS (
  SELECT doc_id, ((doc_id * 31 + i * 7) % 256) AS byte FROM f
),
dec AS (
  SELECT doc_id,
    CASE WHEN doc_id % 2 = 0 THEN
      CASE WHEN (255 - byte) >= 128
           THEN 132 - ((((255 - byte) % 16) * 8 + 132)
                       * (1 << (((255 - byte) // 16) % 8)))
           ELSE ((((255 - byte) % 16) * 8 + 132)
                 * (1 << (((255 - byte) // 16) % 8))) - 132
      END
    ELSE
      CASE WHEN xor(byte, 85) >= 128
           THEN CASE WHEN ((xor(byte, 85) // 16) % 8) = 0
                     THEN (xor(byte, 85) % 16) * 16 + 8
                     ELSE ((xor(byte, 85) % 16) * 16 + 264)
                          * (1 << (((xor(byte, 85) // 16) % 8) - 1))
                END
           ELSE -(CASE WHEN ((xor(byte, 85) // 16) % 8) = 0
                       THEN (xor(byte, 85) % 16) * 16 + 8
                       ELSE ((xor(byte, 85) % 16) * 16 + 264)
                            * (1 << (((xor(byte, 85) // 16) % 8) - 1))
                  END)
      END
    END AS v
  FROM b
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'ulaw' ELSE 'alaw' END AS law,
       CAST(8000 AS INT) AS sample_rate,
       CAST(16 + doc_id % 16 AS BIGINT) AS n_samples,
       CAST(SUM(v) AS BIGINT) AS sum_linear,
       CAST(MIN(v) AS INT) AS min_linear,
       CAST(MAX(v) AS INT) AS max_linear
FROM dec GROUP BY doc_id
"""


def q_weighted_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED HDR quantile sketch through the gate: per returnflag,
    the quantity-weighted p50/p90 of unit price cents — the price an
    average UNIT ships at, not an average line item (the token-weighted
    percentile shape every corpus report needs). Containment of the
    exact weighted order statistic is checked in both engines; all
    math stays integer."""
    from pyspark.sql import Window

    from audit_star_spark.analytics.sketch import hdr_partials, hdr_quantiles

    qs = [0.5, 0.9]
    li = load_table(spark, sf_dir, "lineitem")
    staged = li.select(
        "l_returnflag",
        F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("cents"),
        F.expr("cast(l_quantity as bigint)").alias("qty"),
    )
    sk = hdr_quantiles(
        hdr_partials(staged, ["l_returnflag"], "cents", weight_col="qty"),
        ["l_returnflag"],
        qs,
    )
    # ROWS frame explicitly: the default RANGE frame would pool tied
    # cents rows into one cumw step and break the unit-containment
    # filter (the oracle is ROWS too)
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("l_returnflag")
    exact = (
        staged.withColumn("cumw", F.sum("qty").over(w))
        .withColumn("tw", F.sum("qty").over(wall))
        .withColumn(
            "q", F.explode(F.array(*[F.lit(float(q)) for q in qs]))
        )
        .withColumn(
            "rnk",
            F.greatest(
                F.lit(1).cast("long"), F.expr("cast(ceil(q * tw) as bigint)")
            ),
        )
        .filter(
            (F.col("cumw") >= F.col("rnk"))
            & (F.col("cumw") - F.col("qty") < F.col("rnk"))
        )
        .select("l_returnflag", "q", F.col("cents").alias("exact_cents"))
    )
    return sk.join(exact, ["l_returnflag", "q"]).select(
        "l_returnflag",
        "q",
        "n",
        "lo",
        "hi",
        "est",
        "exact_cents",
        (
            (F.col("lo") <= F.col("exact_cents"))
            & (F.col("exact_cents") <= F.col("hi"))
        ).alias("contained"),
    )


def _weighted_price_quantiles_sql() -> str:
    from audit_star_spark.analytics.sketch import hdr_sql

    qs = [0.5, 0.9]
    inner = hdr_sql(
        "lineitem",
        ["l_returnflag"],
        "cast(round(l_extendedprice * 100) as bigint)",
        qs,
        weight_expr="cast(l_quantity as bigint)",
    )
    qlist = ", ".join(f"CAST({float(q)!r} AS DOUBLE)" for q in qs)
    return f"""
WITH sk AS ({inner}),
staged AS (
  SELECT l_returnflag,
         cast(round(l_extendedprice * 100) as bigint) AS cents,
         cast(l_quantity as bigint) AS qty
  FROM lineitem
),
walked AS (
  SELECT l_returnflag, cents, qty,
         SUM(qty) OVER (PARTITION BY l_returnflag ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumw,
         SUM(qty) OVER (PARTITION BY l_returnflag) AS tw
  FROM staged
),
exact AS (
  SELECT l_returnflag, q, cents AS exact_cents
  FROM walked CROSS JOIN (SELECT UNNEST([{qlist}]) AS q) qq
  WHERE cumw >= GREATEST(1, CAST(ceil(q * tw) AS BIGINT))
    AND cumw - qty < GREATEST(1, CAST(ceil(q * tw) AS BIGINT))
)
SELECT sk.l_returnflag, sk.q, sk.n, sk.lo, sk.hi, sk.est,
       exact.exact_cents,
       (sk.lo <= exact.exact_cents AND exact.exact_cents <= sk.hi)
         AS contained
FROM sk JOIN exact
  ON sk.l_returnflag = exact.l_returnflag AND sk.q = exact.q
"""


# ----------------------------------------------- end-to-end pipeline report
def q_pipeline_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full cleaning pipeline as ONE DAG: quality-gate every document
    (zero-shuffle flags), exact-dedup the keepers (min doc_id per
    normalized-text hash), and report per (source, lang) how much
    survives each stage plus the final token budget — the corpus-card
    numbers a pretraining run starts from."""
    docs = load_table(spark, sf_dir, "documents")
    # persist the slim verdict projection: without it the plan is a
    # self-join of the corpus scan against the quality chain, and Catalyst
    # optimizing two duplicated copies of that (very deep) lambda tree
    # plus join constraint propagation goes super-linear — observed as a
    # multi-minute planning hang at sf0.001. The cache substitutes an
    # InMemoryRelation before optimization; at production scale this
    # stage would be written to storage between pipeline steps anyway
    # (2 scalar columns per document).
    flags = quality.gopher_quality_flags(docs).select("doc_id", "keep").persist()
    stats = text.with_text_stats(docs).select("doc_id", "est_bpe_tokens")
    base = docs.select(
        "doc_id", "source", "lang", F.expr("md5(trim(lower(text)))").alias("h")
    ).join(flags, "doc_id")
    winners = (
        base.filter(F.col("keep"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("w_doc"))
    )
    staged = base.join(winners, "h", "left").withColumn(
        "is_final", F.col("keep") & (F.col("doc_id") == F.col("w_doc"))
    )
    return (
        staged.join(stats, "doc_id")
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_raw"),
            F.count(F.when(F.col("keep"), True)).alias("n_kept"),
            F.count(F.when(F.col("is_final"), True)).alias("n_final"),
            F.coalesce(
                F.sum(F.when(F.col("is_final"), F.col("est_bpe_tokens"))), F.lit(0)
            )
            .cast("long")
            .alias("final_tokens"),
        )
    )


def _pipeline_report_sql() -> str:
    return f"""
WITH qflags AS ({_quality_flags_sql()}),
stats AS ({SQL_TEXT_STATS}),
kept AS (
  SELECT d.doc_id, md5(trim(lower(d.text))) AS h
  FROM documents d JOIN qflags q ON d.doc_id = q.doc_id AND q.keep
),
winners AS (
  SELECT h, MIN(doc_id) AS w_doc FROM kept GROUP BY h
),
final AS (
  SELECT k.doc_id FROM kept k JOIN winners w ON k.h = w.h AND k.doc_id = w.w_doc
)
SELECT d.source, d.lang,
       CAST(COUNT(*) AS BIGINT) AS n_raw,
       CAST(COUNT(k.doc_id) AS BIGINT) AS n_kept,
       CAST(COUNT(f.doc_id) AS BIGINT) AS n_final,
       CAST(COALESCE(SUM(CASE WHEN f.doc_id IS NOT NULL
                              THEN s.est_bpe_tokens END), 0) AS BIGINT)
         AS final_tokens
FROM documents d
LEFT JOIN kept k ON d.doc_id = k.doc_id
LEFT JOIN final f ON d.doc_id = f.doc_id
JOIN stats s ON d.doc_id = s.doc_id
GROUP BY d.source, d.lang
"""


# ---------------------------------------------------- corpus mix report
def q_source_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    stats = text.with_text_stats(docs)
    return (
        docs.select("doc_id", "source", "lang")
        .join(stats, "doc_id")
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("est_bpe_tokens").cast("long").alias("total_tokens"),
            F.avg("quality_score").alias("avg_quality"),
        )
    )


def _source_mix_sql() -> str:
    return f"""
WITH stats AS ({SQL_TEXT_STATS})
SELECT d.source, d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(s.est_bpe_tokens) AS BIGINT) AS total_tokens,
       AVG(s.quality_score) AS avg_quality
FROM documents d JOIN stats s ON d.doc_id = s.doc_id
GROUP BY d.source, d.lang
"""


# ------------------------------------------- span dedup / source TF-IDF
def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.span_dedup_stats(load_table(spark, sf_dir, "documents"))


def _span_dedup_sql(span_tokens: int = 10) -> str:
    spans = (
        f"list_distinct(list_transform("
        f"generate_series(0, CAST(floor(len({D_TOKENS}) / {span_tokens}) AS INT) - 1), "
        f"i -> ('0x' || substr(md5(array_to_string("
        f"list_slice({D_TOKENS}, i * {span_tokens} + 1, i * {span_tokens} + {span_tokens}), ' ')), 1, 15))::BIGINT))"
    )
    return f"""
WITH doc_spans AS (
  SELECT doc_id, unnest({spans}) AS span_hash FROM documents
  WHERE len({D_TOKENS}) >= {span_tokens}
),
span_docs AS (
  SELECT span_hash, COUNT(*) AS n_docs FROM doc_spans GROUP BY span_hash
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN s.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
       SUM(CASE WHEN s.n_docs > 1 THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE)
         AS dup_span_fraction
FROM doc_spans d JOIN span_docs s USING (span_hash)
GROUP BY d.doc_id
"""


def q_source_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.source_tfidf_topk(load_table(spark, sf_dir, "documents"))


SQL_SOURCE_TFIDF = f"""
WITH toks AS (
  SELECT source, unnest({D_TOKENS}) AS term FROM documents
),
tf AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY source, term
),
dfc AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
),
ns AS (SELECT COUNT(DISTINCT source) AS n FROM documents),
scored AS (
  SELECT tf.source, tf.term, tf.tf, dfc.df,
         round(tf.tf * (ln((1.0 + ns.n) / (1.0 + dfc.df)) + 1.0), 9) AS tfidf
  FROM tf JOIN dfc USING (term) CROSS JOIN ns
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
             ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT source, CAST(rank AS INT) AS rank, term, tf, df, tfidf
FROM ranked WHERE rank <= 5
"""


# ------------------------------------------ time-series / ranged joins
def q_event_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from audit_star_spark.analytics.timeseries import resample_events

    return resample_events(load_table(spark, sf_dir, "events"), bucket="hour")


SQL_EVENT_RESAMPLE = """
WITH agg AS (
  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sv
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT CAST(date_trunc('hour', MIN(ts)) AS TIMESTAMP) AS lo,
         CAST(date_trunc('hour', MAX(ts)) AS TIMESTAMP) AS hi FROM events
),
spine AS (
  SELECT t.event_type,
         CAST(unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS TIMESTAMP)
           AS bucket
  FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN bounds b
)
SELECT s.event_type, s.bucket,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n_events,
       CAST(COALESCE(a.sv, 0) AS DOUBLE) / 100.0 AS total_value,
       a.n IS NULL AS is_gap,
       last_value(CAST(a.sv AS DOUBLE) / 100.0 / CAST(a.n AS DOUBLE) IGNORE NULLS)
         OVER (PARTITION BY s.event_type ORDER BY s.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value_locf
FROM spine s LEFT JOIN agg a USING (event_type, bucket)
"""


def q_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranged-join showcase: for every purchase, how many click/view
    events the same user produced in the hour before it (half-open
    window, purchase instant excluded)."""
    from audit_star_spark.operators.ranged import ranged_count_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    prior = ev.filter(F.col("event_type").isin("click", "view"))
    return ranged_count_join(
        purchases,
        prior,
        keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        lower_s=-3600,
        upper_s=0,
        counts={
            "n_prior_clicks": F.col("r_event_type") == "click",
            "n_prior_views": F.col("r_event_type") == "view",
        },
        carry_right=("event_type",),
    )


SQL_PURCHASE_ATTRIBUTION = """
SELECT p.event_id, p.user_id, p.ts,
       CAST(COALESCE(SUM(CASE WHEN e.event_type = 'click' THEN 1 END), 0)
         AS BIGINT) AS n_prior_clicks,
       CAST(COALESCE(SUM(CASE WHEN e.event_type = 'view' THEN 1 END), 0)
         AS BIGINT) AS n_prior_views
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
LEFT JOIN events e
  ON e.user_id = p.user_id AND e.event_type IN ('click', 'view')
 AND e.ts >= p.ts - INTERVAL 1 HOUR AND e.ts < p.ts
GROUP BY 1, 2, 3
"""


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from audit_star_spark.analytics.timeseries import event_funnel

    return event_funnel(
        load_table(spark, sf_dir, "events"), ["signup", "view", "purchase"]
    )


SQL_EVENT_FUNNEL = """
WITH s1 AS (SELECT user_id, MIN(ts) AS t FROM events
            WHERE event_type = 'signup' GROUP BY 1),
s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
       JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1),
s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
       JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1),
c AS (
  SELECT 1 AS stage_idx, 'signup' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM s1
  UNION ALL
  SELECT 2, 'view', CAST(COUNT(*) AS BIGINT) FROM s2
  UNION ALL
  SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT) FROM s3
)
SELECT stage_idx, stage, n_users,
       round(CAST(n_users AS DOUBLE)
             / CAST(nullif(lag(n_users) OVER (ORDER BY stage_idx), 0)
                    AS DOUBLE), 9) AS conversion_rate
FROM c
"""


# ------------------------------------------- int8 embedding quantization
def q_quantization_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.quantization_report(load_table(spark, sf_dir, "embeddings"))


def q_quantized_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.quantized_recall(load_table(spark, sf_dir, "embeddings"))


_D_DOT_QQ = d_fold(
    "list_transform(list_zip(qvec, qvec), "
    "x -> CAST(x[1] AS BIGINT) * CAST(x[2] AS BIGINT))",
    "CAST(0 AS BIGINT)",
    "(s, v) -> s + v",
)


def _quant_ctes() -> str:
    """sc = per-vector symmetric scale (max|x|/127), qv = int8 arrays via
    the same deterministic floor(x/scale + 0.5) round-half-up as the
    Spark side."""
    maxabs = d_fold(
        "vec", "CAST(0.0 AS DOUBLE)", "(s, v) -> greatest(s, abs(v))"
    )
    return f"""
qbase AS (SELECT vec_id, {D_VEC} AS vec FROM embeddings),
sc AS (
  SELECT vec_id, vec, {maxabs} / {similarity.Q_MAX}.0 AS scale FROM qbase
),
qv AS (
  SELECT vec_id, vec, scale,
    CASE WHEN scale = 0.0 THEN list_transform(vec, x -> CAST(0 AS TINYINT))
    ELSE list_transform(vec, x -> CAST(greatest(CAST(-{similarity.Q_MAX} AS DOUBLE),
      least(CAST({similarity.Q_MAX} AS DOUBLE), floor(x / scale + 0.5))) AS TINYINT))
    END AS qvec
  FROM sc
)"""


def _quantization_report_sql() -> str:
    mse = d_fold(
        "list_transform(list_zip(vec, qvec), "
        "x -> (x[1] - x[2] * scale) * (x[1] - x[2] * scale))",
        "CAST(0.0 AS DOUBLE)",
        "(s, v) -> s + v",
    )
    dot_vq = d_fold(
        "list_transform(list_zip(vec, qvec), x -> x[1] * CAST(x[2] AS DOUBLE))",
        "CAST(0.0 AS DOUBLE)",
        "(s, v) -> s + v",
    )
    return f"""
WITH {_quant_ctes()}
SELECT vec_id, scale,
       {mse} / CAST(len(vec) AS DOUBLE) AS mse,
       {dot_vq} / nullif(sqrt({d_dot('vec', 'vec')})
                         * sqrt(CAST({_D_DOT_QQ} AS DOUBLE)), 0.0) AS cos_sim
FROM qv
"""


def _quantized_recall_sql(k: int = 10, n_queries: int = 8) -> str:
    dot_int = d_fold(
        "list_transform(list_zip(qq.q_qvec, qn.qvec), "
        "x -> CAST(x[1] AS BIGINT) * CAST(x[2] AS BIGINT))",
        "CAST(0 AS BIGINT)",
        "(s, v) -> s + v",
    )
    return f"""
WITH exact AS ({_knn_sql(k, n_queries, bucketed=False)}),
{_quant_ctes().lstrip()},
qn AS (
  SELECT vec_id, qvec, sqrt(CAST({_D_DOT_QQ} AS DOUBLE)) AS qnorm FROM qv
),
qq AS (
  SELECT vec_id AS query_id, qvec AS q_qvec, qnorm AS q_qnorm
  FROM qn WHERE vec_id < {n_queries}
),
qscored AS (
  SELECT qq.query_id, qn.vec_id,
         CAST({dot_int} AS DOUBLE) / nullif(qq.q_qnorm * qn.qnorm, 0.0) AS cosine
  FROM qn JOIN qq ON qn.vec_id <> qq.query_id
),
qtop AS (
  SELECT query_id, vec_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id) AS r
    FROM qscored
  ) WHERE r <= {k}
)
SELECT e.query_id, CAST(COUNT(q.vec_id) AS BIGINT) AS n_hits,
       CAST(COUNT(q.vec_id) AS DOUBLE) / {k}.0 AS recall
FROM exact e LEFT JOIN qtop q
  ON e.query_id = q.query_id AND e.vec_id = q.vec_id
GROUP BY e.query_id
"""


# ----------------------------------------------------- table profiling
def q_orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from audit_star_spark.analytics.profile import profile_table

    return profile_table(load_table(spark, sf_dir, "orders"))


def _profile_sql(table: str, cols: list[tuple[str, str, str]]) -> str:
    """Per-column scalar aggregates mirroring profile_table's one-pass
    semantics: (name, spark dtype literal, family num|str|ts)."""
    null_slot = {
        "num": "CAST(NULL AS DOUBLE)",
        "str": "CAST(NULL AS VARCHAR)",
        "ts": "CAST(NULL AS TIMESTAMP)",
    }
    parts = []
    for name, dt, fam in cols:
        mins = dict(null_slot)
        cast = {"num": "DOUBLE", "str": "VARCHAR", "ts": "TIMESTAMP"}[fam]
        lo, hi = f"CAST(MIN({name}) AS {cast})", f"CAST(MAX({name}) AS {cast})"
        slots = {
            "num_min": lo if fam == "num" else null_slot["num"],
            "num_max": hi if fam == "num" else null_slot["num"],
            "str_min": lo if fam == "str" else null_slot["str"],
            "str_max": hi if fam == "str" else null_slot["str"],
            "ts_min": lo if fam == "ts" else null_slot["ts"],
            "ts_max": hi if fam == "ts" else null_slot["ts"],
        }
        slot_sql = ", ".join(f"{v} AS {k}" for k, v in slots.items())
        parts.append(
            f"SELECT '{name}' AS \"column\", '{dt}' AS dtype, "
            f"CAST(COUNT(*) AS BIGINT) AS n_rows, "
            f"CAST(COUNT(CASE WHEN {name} IS NULL THEN 1 END) AS BIGINT) AS n_nulls, "
            f"CAST(COUNT(DISTINCT {name}) AS BIGINT) AS n_distinct, "
            f"{slot_sql} FROM {table}"
        )
    return "\nUNION ALL\n".join(parts)


SQL_ORDERS_PROFILE = _profile_sql(
    "orders",
    [
        ("o_orderkey", "bigint", "num"),
        ("o_custkey", "bigint", "num"),
        ("o_orderstatus", "string", "str"),
        ("o_totalprice", "double", "num"),
        ("o_orderdate", "timestamp", "ts"),
        ("o_orderpriority", "string", "str"),
    ],
)

def q_orders_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from audit_star_spark.analytics.profile import profile_distinct_contract

    return profile_distinct_contract(load_table(spark, sf_dir, "orders"))


def _profile_approx_sql(table: str, cols: list[tuple[str, str]]) -> str:
    parts = []
    for name, dt in cols:
        parts.append(
            f"SELECT '{name}' AS \"column\", '{dt}' AS dtype, "
            f"CAST(COUNT(*) AS BIGINT) AS n_rows, "
            f"CAST(COUNT(CASE WHEN {name} IS NULL THEN 1 END) AS BIGINT) AS n_nulls, "
            f"TRUE AS nd_ok FROM {table}"
        )
    return "\nUNION ALL\n".join(parts)


SQL_ORDERS_PROFILE_APPROX = _profile_approx_sql(
    "orders",
    [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp"),
        ("o_orderpriority", "string"),
    ],
)


# ------------------------------------------------- skew diagnostics
def q_event_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from audit_star_spark.operators.skew import heavy_hitters

    return heavy_hitters(load_table(spark, sf_dir, "events"), ["user_id"], k=10)


SQL_EVENT_HEAVY_HITTERS = """
WITH c AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1
),
t AS (
  SELECT CAST(SUM(n) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS nkeys
  FROM c
)
SELECT user_id, n,
       CAST(n AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
       CAST(n * t.nkeys AS DOUBLE) / CAST(t.total AS DOUBLE) AS skew_ratio
FROM c CROSS JOIN t
ORDER BY n DESC, user_id
LIMIT 10
"""


# ------------------------------------------- perceptual image hashing
def q_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode -> perceptual average-hash through the gate: per doc an
    8x8 PGM whose bytes follow a closed-form formula (ASCII-safe 32..126
    so the UTF-8 binary cast is byte-exact), so the oracle can restate
    the whole decode -> gray -> threshold -> hex pipeline in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.expr(
            "CAST(concat('P5\\n8 8\\n255\\n', concat_ws('', "
            "transform(sequence(0, 63), "
            "i -> char(32 + (doc_id * 11 + i * 7) % 95)))) AS BINARY)"
        ).alias("payload"),
    )
    return multimodal.image_ahash(media).select("doc_id", "ahash")


SQL_IMAGE_AHASH = f"""
WITH px AS (
  SELECT doc_id,
         list_transform(generate_series(0, 63),
                        i -> 32 + (doc_id * 11 + i * 7) % 95) AS b
  FROM documents
),
m AS (
  SELECT doc_id, b,
         CAST({d_fold('b', 'CAST(0 AS BIGINT)', '(s, v) -> s + v')} AS DOUBLE)
           / 64.0 AS mean
  FROM px
),
bits AS (
  SELECT doc_id,
         list_transform(b, x -> CASE WHEN x > mean THEN 1 ELSE 0 END) AS bit
  FROM m
)
SELECT doc_id,
       array_to_string(list_transform(generate_series(0, 15),
         n -> substr('0123456789abcdef',
                     1 + bit[4*n+1]*8 + bit[4*n+2]*4 + bit[4*n+3]*2 + bit[4*n+4],
                     1)), '') AS ahash
FROM bits
"""


def q_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WAV encode -> decode -> energy-contour fingerprint through
    the gate: per doc a 64-window square wave whose window amplitudes
    follow a closed form, so each window's mean energy is exactly A_w²
    and the oracle restates the fingerprint in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.synth_windowed_audio(docs)
    return multimodal.audio_fingerprint(media).select("doc_id", "afp")


SQL_AUDIO_FP = f"""
WITH en AS (
  SELECT doc_id,
         list_transform(generate_series(0, 63),
           w -> CAST(POWER(100 * (1 + (doc_id + 3 * w) % 5), 2) AS DOUBLE)) AS e
  FROM documents
),
m AS (
  SELECT doc_id, e,
         {d_fold('e', 'CAST(0.0 AS DOUBLE)', '(s, v) -> s + v')} / 64.0 AS mean
  FROM en
),
bits AS (
  SELECT doc_id,
         list_transform(e, x -> CASE WHEN x > mean THEN 1 ELSE 0 END) AS bit
  FROM m
)
SELECT doc_id,
       array_to_string(list_transform(generate_series(0, 15),
         n -> substr('0123456789abcdef',
                     1 + bit[4*n+1]*8 + bit[4*n+2]*4 + bit[4*n+3]*2 + bit[4*n+4],
                     1)), '') AS afp
FROM bits
"""


# --------------------------------------------------- HTML extraction
_HTML_PRE = (
    '<html><head><title>Doc {id} &amp; notes</title>'
    '<script type="text/javascript">var x = 1 < 2;</script>'
    "<style>p { color: red }</style></head><body><h1>Doc {id}</h1><p>"
)
_HTML_POST = (
    '</p><a href="https://example.com/{id}">first</a>'
    '<a href="/rel">second</a>&nbsp;&amp; tail</body></html>'
)


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> text through the gate: wrap each document's text in a
    deterministic page (script/style blocks, entities, two links), then
    run the regex extraction pipeline; the oracle mirrors both the
    synthesis and every HTML_STEPS regex 1:1."""
    from audit_star_spark.analytics.html import html_extract

    return html_extract(_synth_pages(spark, sf_dir))


def _html_extract_sql() -> str:
    from audit_star_spark.analytics.html import HTML_STEPS

    def sq(s: str) -> str:
        return s.replace("'", "''")

    pre = sq(_HTML_PRE).replace("{id}", "' || CAST(doc_id AS VARCHAR) || '")
    post = sq(_HTML_POST).replace("{id}", "' || CAST(doc_id AS VARCHAR) || '")
    html = f"'{pre}' || text || '{post}'"

    def chain(expr: str) -> str:
        for pat, rep in HTML_STEPS:
            expr = f"regexp_replace({expr}, '{sq(pat)}', '{sq(rep)}', 'g')"
        return f"trim({expr})"

    raw_title = "regexp_extract(h.html, '(?is)<title[^>]*>(.*?)</title>', 1)"
    return f"""
WITH h AS (SELECT doc_id, {html} AS html FROM documents)
SELECT doc_id,
       {chain('h.html')} AS text,
       {chain(raw_title)} AS title,
       CAST(len(regexp_extract_all(h.html, '(?is)<a\\s[^>]*href\\s*=')) AS BIGINT)
         AS n_links
FROM h
"""


def _synth_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pre = _HTML_PRE.replace("{id}", "', CAST(doc_id AS STRING), '")
    post = _HTML_POST.replace("{id}", "', CAST(doc_id AS STRING), '")
    return docs.select(
        "doc_id", F.expr(f"concat('{pre}', text, '{post}')").alias("html")
    )


def q_link_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    from audit_star_spark.analytics.html import domain_stats

    return domain_stats(_synth_pages(spark, sf_dir))


def _link_domains_sql() -> str:
    from audit_star_spark.analytics.html import _DOMAIN, _HREF_DQ, _HREF_SQ

    def sq(s: str) -> str:
        return s.replace("'", "''")

    pre = sq(_HTML_PRE).replace("{id}", "' || CAST(doc_id AS VARCHAR) || '")
    post = sq(_HTML_POST).replace("{id}", "' || CAST(doc_id AS VARCHAR) || '")
    return f"""
WITH h AS (SELECT doc_id, '{pre}' || text || '{post}' AS html FROM documents),
u AS (
  SELECT doc_id, unnest(list_concat(
    regexp_extract_all(html, '{sq(_HREF_DQ)}', 1),
    regexp_extract_all(html, '{sq(_HREF_SQ)}', 1))) AS url
  FROM h
)
SELECT lower(regexp_extract(url, '{sq(_DOMAIN)}', 1)) AS domain,
       CAST(COUNT(*) AS BIGINT) AS n_links,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM u
GROUP BY 1
"""


# --------------------------------------------------- data validation
def q_orders_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from audit_star_spark.operators.validate import (
        check_rules,
        in_range,
        matches,
        not_null,
    )

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return check_rules(
        orders,
        row_rules=[
            not_null("o_custkey"),
            in_range("o_totalprice", 0, 600000),
            matches("o_orderpriority", "^[1-5]-"),
        ],
        unique_cols=["o_orderkey"],
        foreign_keys=[("o_custkey", customer, "c_custkey")],
    )


SQL_ORDERS_VALIDATION = """
WITH r AS (
  SELECT 'not_null(o_custkey)' AS rule,
         CAST(COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT)
           AS n_violations
  FROM orders
  UNION ALL
  SELECT 'in_range(o_totalprice, 0, 600000)',
         CAST(COUNT(CASE WHEN o_totalprice IS NOT NULL
                     AND NOT (o_totalprice BETWEEN 0 AND 600000) THEN 1 END)
              AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'matches(o_orderpriority)',
         CAST(COUNT(CASE WHEN o_orderpriority IS NOT NULL
                     AND NOT regexp_matches(o_orderpriority, '^[1-5]-')
                     THEN 1 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'unique(o_orderkey)',
         CAST(COUNT(*) - (COUNT(DISTINCT o_orderkey)
              + CASE WHEN COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) > 0
                     THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'foreign_key(o_custkey)',
         CAST((SELECT COUNT(*) FROM orders o
               WHERE o.o_custkey IS NOT NULL
                 AND NOT EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
)
SELECT rule, n_violations, n_violations = 0 AS passed FROM r
"""


def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from audit_star_spark.analytics.profile import numeric_histogram

    return numeric_histogram(load_table(spark, sf_dir, "orders"), "o_totalprice", bins=10)


SQL_PRICE_HISTOGRAM = """
WITH v AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders
  WHERE o_totalprice IS NOT NULL
),
b AS (SELECT MIN(x) AS lo, MAX(x) AS hi FROM v),
s AS (
  SELECT x, lo, hi, (hi - lo) / 10.0 AS w,
         greatest(0, least(9,
           COALESCE(CAST(floor((x - lo) / nullif((hi - lo) / 10.0, 0.0))
                         AS BIGINT), 0))) AS bk
  FROM v CROSS JOIN b
)
SELECT CAST(bk AS INT) AS bucket,
       lo + bk * w AS lo_edge,
       lo + (bk + 1) * w AS hi_edge,
       CAST(COUNT(*) AS BIGINT) AS n
FROM s GROUP BY 1, 2, 3
"""


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.vocab_coverage(load_table(spark, sf_dir, "documents"), vocab_k=100)


SQL_VOCAB_COVERAGE = f"""
WITH toks AS (
  SELECT source, lang, unnest({D_TOKENS}) AS token FROM documents
),
tok2 AS (SELECT * FROM toks WHERE length(token) > 0),
vocab AS (
  SELECT token FROM (
    SELECT token, COUNT(*) AS freq FROM tok2 GROUP BY token
    ORDER BY freq DESC, token LIMIT 100
  )
)
SELECT t.source, t.lang,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(CASE WHEN v.token IS NULL THEN 1 END) AS BIGINT) AS n_oov,
       round(CAST(COUNT(CASE WHEN v.token IS NULL THEN 1 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 9) AS oov_rate
FROM tok2 t LEFT JOIN vocab v ON t.token = v.token
GROUP BY 1, 2
"""


def q_purchase_value_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranged-join aggregate generalization (r4): per purchase, count,
    sum, and max of the same-user click/view VALUES in the prior hour —
    same bucketed plan as the count-only query, no nested-loop node.
    The sum is rounded (6 dp) because double addition order differs
    between engines; max is exact."""
    from audit_star_spark.operators.ranged import ranged_count_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    prior = ev.filter(F.col("event_type").isin("click", "view"))
    return ranged_count_join(
        purchases,
        prior,
        keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        lower_s=-3600,
        upper_s=0,
        counts={"n_prior": None},
        carry_right=("value",),
        aggregates={
            "sum_prior_value": F.round(
                F.coalesce(F.sum("r_value"), F.lit(0.0)), 6
            ),
            "max_prior_value": F.max("r_value"),
        },
    )


SQL_PURCHASE_VALUE_ATTRIBUTION = """
SELECT p.event_id, p.user_id, p.ts,
       CAST(COALESCE(SUM(CASE WHEN e.ts IS NOT NULL THEN 1 END), 0)
         AS BIGINT) AS n_prior,
       round(COALESCE(SUM(e.value), 0), 6) AS sum_prior_value,
       MAX(e.value) AS max_prior_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT user_id, ts, value FROM events
           WHERE event_type IN ('click', 'view')) e
  ON e.user_id = p.user_id
 AND e.ts >= p.ts - INTERVAL 3600 SECOND
 AND e.ts < p.ts
GROUP BY 1, 2, 3
"""


# -------------------------------------------- unicode tokenizer (r4)
def q_unicode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.unicode_token_stats(load_table(spark, sf_dir, "documents"))


def _unicode_tokens_sql() -> str:
    """DuckDB mirror of TOKENS_EXPR_UNICODE: the same nfc_lite_sql replace
    chain (generated from the same NFC_PAIRS list, so it cannot drift) and
    the same letter/digit-run extraction; DuckDB string literals keep
    backslashes raw, hence the single-backslash regex."""
    tok = (
        "regexp_extract_all(lower(" + text.nfc_lite_sql("text") + "), "
        "'[\\p{L}\\p{N}]+')"
    )
    suffix = text.UNICODE_SUFFIX
    return f"""
WITH aug AS (
  SELECT doc_id, text || '{suffix}' AS text FROM documents
),
toks AS (
  SELECT doc_id, unnest({tok}) AS token FROM aug
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT token) AS BIGINT) AS n_distinct,
       CAST(count(CASE WHEN token = 'caf\u00e9' THEN 1 END) AS BIGINT) AS n_cafe,
       CAST(count(CASE WHEN token = '\u00fcber' THEN 1 END) AS BIGINT) AS n_uber
FROM toks GROUP BY doc_id
"""


# Driver-gate analytics group: exactly 42 entries, so the driver's 50-row
# correctness window is 8 audit + these 42 (insertion order; see
# __spark_entry__.queries()). The per-round gate rotation happens in the
# _R6_ROTATE block at the bottom of this module (the round-N query
# functions are defined after this literal): round 6 rotates the 17
# round-5 queries (scd2_users .. gif_meta) in, displacing 17 double-green
# entries whose operator families stay represented in the window; every
# displaced query stays oracle-locked in tests/test_oracle_parity.py.
ANALYTICS_QUERIES = {
    "dedup_minhash_pairs": q_dedup_minhash,
    "dedup_clusters": q_dedup_clusters,
    "embedding_near_pairs": q_embedding_near_pairs,
    "simhash_near_pairs": q_simhash_pairs,
    "knn_ivf": q_knn_ivf,
    "capped_user_sessions": q_capped_sessions,
    "jpeg_meta": q_jpeg_meta,
    "bpe_merges": q_bpe_merges,
    "quality_flags": q_quality_flags,
    "pipeline_report": q_pipeline_report,
    "retention_cohorts": q_retention_cohorts,
    "rate_anomalies": q_rate_anomalies,
    "video_meta": q_video_meta,
    "video_frame_means": q_video_frame_means,
    "split_leakage": q_split_leakage,
    "compression_ratio": q_compression_ratio,
    "resample_to_mix": q_resample_to_mix,
    "corpus_clean_stats": q_corpus_clean_stats,
    "span_dedup_stats": q_span_dedup,
    "source_tfidf_topk": q_source_tfidf,
    "event_resample_hourly": q_event_resample,
    "purchase_attribution": q_purchase_attribution,
    "event_funnel": q_event_funnel,
    "bpe_transfer_stats": q_bpe_transfer,
    "embedding_quantization": q_quantization_report,
    "quantized_knn_recall": q_quantized_recall,
    "orders_profile": q_orders_profile,
    "event_heavy_hitters": q_event_heavy_hitters,
    "image_ahash": q_image_ahash,
    "audio_fingerprint": q_audio_fingerprint,
    "html_extract": q_html_extract,
    "link_domains": q_link_domains,
    "orders_validation": q_orders_validation,
    "price_histogram": q_price_histogram,
    "vocab_coverage": q_vocab_coverage,
    "unicode_token_stats": q_unicode_tokens,
    "purchase_value_attribution": q_purchase_value_attribution,
    "orders_profile_approx": q_orders_profile_approx,
    "dedup_canonical_stats": q_dedup_canonical,
    "url_normalization": q_url_normalization,
    "cross_corpus_near_dups": q_cross_corpus_near_dups,
    "script_profile": q_script_profile,
}

ANALYTICS_ORACLES = {
    "dedup_minhash_pairs": _minhash_sql_clean(),
    "dedup_clusters": _clusters_sql(),
    "embedding_near_pairs": _near_pairs_sql(),
    "simhash_near_pairs": SQL_SIMHASH_PAIRS,
    "knn_ivf": _ivf_sql(),
    "capped_user_sessions": SQL_CAPPED_SESSIONS,
    "jpeg_meta": SQL_JPEG_META,
    "bpe_merges": _bpe_merges_sql(),
    "quality_flags": _quality_flags_sql(),
    "pipeline_report": _pipeline_report_sql(),
    "retention_cohorts": SQL_RETENTION_COHORTS,
    "rate_anomalies": SQL_RATE_ANOMALIES,
    "video_meta": SQL_VIDEO_META,
    "video_frame_means": SQL_VIDEO_FRAME_MEANS,
    "split_leakage": _split_leakage_sql(),
    # compression_ratio: no SQL oracle exists (stdlib zlib inside the
    # engine); the driver records a rows-only check and the byte-exact
    # semantic replay lives in tests/test_oracle_parity.py.
    "resample_to_mix": _resample_mix_sql(),
    "corpus_clean_stats": _corpus_clean_sql(),
    "span_dedup_stats": _span_dedup_sql(),
    "source_tfidf_topk": SQL_SOURCE_TFIDF,
    "event_resample_hourly": SQL_EVENT_RESAMPLE,
    "purchase_attribution": SQL_PURCHASE_ATTRIBUTION,
    "event_funnel": SQL_EVENT_FUNNEL,
    "bpe_transfer_stats": _bpe_transfer_sql(),
    "embedding_quantization": _quantization_report_sql(),
    "quantized_knn_recall": _quantized_recall_sql(),
    "orders_profile": SQL_ORDERS_PROFILE,
    "event_heavy_hitters": SQL_EVENT_HEAVY_HITTERS,
    "image_ahash": SQL_IMAGE_AHASH,
    "audio_fingerprint": SQL_AUDIO_FP,
    "html_extract": _html_extract_sql(),
    "link_domains": _link_domains_sql(),
    "orders_validation": SQL_ORDERS_VALIDATION,
    "price_histogram": SQL_PRICE_HISTOGRAM,
    "vocab_coverage": SQL_VOCAB_COVERAGE,
    "unicode_token_stats": _unicode_tokens_sql(),
    "purchase_value_attribution": SQL_PURCHASE_VALUE_ATTRIBUTION,
    "orders_profile_approx": SQL_ORDERS_PROFILE_APPROX,
    "dedup_canonical_stats": _dedup_canonical_sql(),
    "url_normalization": SQL_URL_NORMALIZATION,
    "cross_corpus_near_dups": _cross_corpus_sql(),
    "script_profile": _script_profile_sql(),
}

# Trailing group, outside the driver's 50-slot window: queries that were
# driver-green in earlier rounds and are displaced by the latest rotation.
# Still pytest-oracle-verified every run (tests/test_oracle_parity.py).
from audit_star_spark.queries_audit import SQL_SCD2_USERS, q_scd2_users  # noqa: E402

# ------------------------------------------------- retrieval / LM scoring
BM25_QUERY_TERMS = ["spark", "window", "merge"]
BM25_K = 10


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k lexical retrieval (analytics/search.py): the
    query-probe shape every corpus sweep uses. Oracle generated from the
    same term list and constants."""
    from audit_star_spark.analytics.search import bm25_topk

    t = bm25_topk(
        load_table(spark, sf_dir, "documents"), BM25_QUERY_TERMS, k=BM25_K
    )
    # round for a stable cross-engine hash (ln differs in the last ulp)
    return t.select("doc_id", F.round("score", 6).alias("score"), "n_matched")


def _bm25_sql() -> str:
    from audit_star_spark.analytics.search import bm25_sql

    inner = bm25_sql("documents", "text", BM25_QUERY_TERMS, k=BM25_K)
    return f"""
SELECT doc_id, round(score, 6) AS score, n_matched FROM ({inner})
"""


def q_doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained bigram-LM perplexity per document (analytics/lm.py)
    — the CCNet-style quality-filter signal. perplexity is rounded to 6
    decimals for a stable cross-engine hash (ln/exp differ in the last
    ulp between engines)."""
    from audit_star_spark.analytics.lm import doc_perplexity

    p = doc_perplexity(load_table(spark, sf_dir, "documents"))
    return p.select(
        "doc_id",
        "n_bigrams",
        F.round("avg_nll", 6).alias("avg_nll"),
        F.round("perplexity", 6).alias("perplexity"),
    )


def _perplexity_sql() -> str:
    from audit_star_spark.analytics.lm import perplexity_sql

    inner = perplexity_sql("documents", "text")
    return f"""
SELECT doc_id, n_bigrams, round(avg_nll, 6) AS avg_nll,
       round(perplexity, 6) AS perplexity
FROM ({inner})
"""


PAGERANK_ITERS = 3


def q_doc_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (analytics/graph.py) over a deterministic doc-level link
    graph synthesized from doc_id (every doc links to (7i+1)%N and
    (13i+3)%N; docs with i%17==0 are dangling) — the gate-query recipe:
    both engines generate the SAME edges closed-form, then the oracle
    unrolls the identical damped iteration as chained CTEs. Ranks are
    rounded for a stable cross-engine hash (float sums associate
    differently across engines)."""
    from audit_star_spark.analytics.graph import pagerank

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    nd = docs.agg(F.count("*").alias("n"))
    linkers = docs.filter(F.col("doc_id") % 17 != 0).crossJoin(F.broadcast(nd))
    edges = linkers.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 1) % F.col("n")).alias("dst"),
    ).unionByName(
        linkers.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 13 + 3) % F.col("n")).alias("dst"),
        )
    )
    r = pagerank(edges, n_iter=PAGERANK_ITERS)
    return r.select(F.col("node").alias("doc_id"), F.round("rank", 9).alias("rank"))


def _pagerank_sql() -> str:
    from audit_star_spark.analytics.graph import pagerank_sql_iterations

    edges_cte = """nn0 AS (SELECT count(*) AS n FROM documents),
linkers AS (SELECT doc_id FROM documents WHERE doc_id % 17 <> 0),
edges AS (
  SELECT doc_id AS src, (doc_id * 7 + 1) % nn0.n AS dst FROM linkers CROSS JOIN nn0
  UNION ALL
  SELECT doc_id AS src, (doc_id * 13 + 3) % nn0.n AS dst FROM linkers CROSS JOIN nn0
)"""
    inner = pagerank_sql_iterations(edges_cte, n_iter=PAGERANK_ITERS)
    return f"""
SELECT node AS doc_id, round(rank, 9) AS rank FROM ({inner})
"""


def q_embedding_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random-projection distortion report (similarity.py): sampled
    pairs' original vs 16-d projected Euclidean distance. The +-0.25
    matrix entries are exactly representable and both engines fold the
    dot products left-to-right over the same literals, so distances match
    bit-for-bit before the stabilizing round."""
    from audit_star_spark.analytics.similarity import projection_distortion

    d = projection_distortion(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    return d.select(
        "vec_a",
        "vec_b",
        F.round("orig_dist", 9).alias("orig_dist"),
        F.round("proj_dist", 9).alias("proj_dist"),
        F.round("distortion", 9).alias("distortion"),
    )


def _projection_sql() -> str:
    from audit_star_spark.analytics.similarity import projection_matrix

    rows = projection_matrix(64)
    proj_elems = ", ".join(
        d_fold(
            f"list_transform(list_zip({D_VEC}, [{', '.join(repr(x) for x in row)}]), "
            "x -> x[1] * x[2])",
            "CAST(0.0 AS DOUBLE)",
            "(s, v) -> s + v",
        )
        for row in rows
    )
    l2 = (
        lambda a, b: "sqrt("
        + d_fold(
            f"list_transform(list_zip({a}, {b}), x -> (x[1] - x[2]) * (x[1] - x[2]))",
            "CAST(0.0 AS DOUBLE)",
            "(s, v) -> s + v",
        )
        + ")"
    )
    return f"""
WITH proj AS (
  SELECT vec_id, {D_VEC} AS vec, [{proj_elems}] AS p FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({l2('a.vec', 'b.vec')}, 9) AS orig_dist,
       round({l2('a.p', 'b.p')}, 9) AS proj_dist,
       round({l2('a.p', 'b.p')} / {l2('a.vec', 'b.vec')}, 9) AS distortion
FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1
WHERE a.vec_id % 25 = 0
"""


def _synth_warc(spark_df):
    """doc_id-keyed WARC synthesis (mapInPandas): per doc one archive of
    1 warcinfo + (1 + d%3) response records carrying the doc text; odd
    doc_ids use per-record gzip members (the Common Crawl layout), even
    ones plain — both decode paths cross the gate."""
    from audit_star_spark.sources.warc import encode_warc

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                recs = [
                    {
                        "warc_type": "warcinfo",
                        "content_type": "application/warc-fields",
                        "payload": b"software: audit-star-spark\r\n",
                    }
                ] + [
                    {
                        "warc_type": "response",
                        "target_uri": f"https://example.org/{d}/{j}",
                        "warc_date": "2024-01-01T00:00:00Z",
                        "content_type": "text/plain",
                        "payload": text.encode("utf-8"),
                    }
                    for j in range(1 + d % 3)
                ]
                payloads.append(encode_warc(recs, gzip_members=bool(d % 2)))
            yield pd.DataFrame(
                {"archive_id": pdf["doc_id"], "payload": payloads}
            )

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("archive_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return spark_df.mapInPandas(synth, schema)


def q_warc_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WARC parse through the gate (sources/warc.py): synthesize an
    archive per document (both plain and member-gzip layouts), run the
    record parser, aggregate a per-archive census; the oracle states the
    expected census closed-form from the same synthesis arithmetic."""
    from audit_star_spark.sources.warc import warc_records

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    recs = warc_records(_synth_warc(docs))
    return recs.groupBy("archive_id").agg(
        F.count("*").alias("n_records"),
        F.sum(F.when(F.col("warc_type") == "response", 1).otherwise(0)).alias(
            "n_response"
        ),
        F.sum(
            F.when(F.col("warc_type") == "response", F.col("content_length"))
            .otherwise(0)
        ).alias("response_bytes"),
        F.min("target_uri").alias("first_uri"),
    )


SQL_WARC_CENSUS = """
SELECT doc_id AS archive_id,
       CAST(2 + doc_id % 3 AS BIGINT) AS n_records,
       CAST(1 + doc_id % 3 AS BIGINT) AS n_response,
       CAST((1 + doc_id % 3) * octet_length(encode(text)) AS BIGINT) AS response_bytes,
       'https://example.org/' || CAST(doc_id AS VARCHAR) || '/0' AS first_uri
FROM documents
"""


def _synth_warc_http(spark_df):
    """doc_id-keyed WARC+HTTP synthesis: per doc one archive of
    1 warcinfo + (1 + d%3) HTTP-enveloped responses (status 200/404 by
    the (d+j)%4 formula, gzip Content-Encoding for odd d, chunked
    Transfer-Encoding for d%5==0) + 1 bare-content response (no
    envelope). Odd-indexed archives use per-record gzip members. Every
    decode path of sources/warc.py's HTTP layer crosses the gate."""
    from audit_star_spark.sources.warc import encode_http_response, encode_warc

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                body = text.encode("utf-8")
                recs = [
                    {
                        "warc_type": "warcinfo",
                        "content_type": "application/warc-fields",
                        "payload": b"software: audit-star-spark\r\n",
                    }
                ]
                for j in range(1 + d % 3):
                    recs.append(
                        {
                            "warc_type": "response",
                            "target_uri": f"https://example.org/{d}/{j}",
                            "content_type": "application/http;msgtype=response",
                            "payload": encode_http_response(
                                404 if (d + j) % 4 == 0 else 200,
                                body,
                                gzip_body=bool(d % 2),
                                chunked=d % 5 == 0,
                            ),
                        }
                    )
                recs.append(
                    {
                        "warc_type": "response",
                        "target_uri": f"https://example.org/{d}/bare",
                        "content_type": "text/plain",
                        "payload": body,
                    }
                )
                payloads.append(encode_warc(recs, gzip_members=bool(d % 3 == 0)))
            yield pd.DataFrame(
                {"archive_id": pdf["doc_id"], "payload": payloads}
            )

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("archive_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return spark_df.mapInPandas(synth, schema)


def q_warc_http_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WARC + HTTP-envelope parse through the gate (sources/
    warc.py http_responses): archives of HTTP response records — gzip
    Content-Encoding, chunked Transfer-Encoding, 404s, bare-content
    payloads — parsed by the real envelope layer; the census checks
    status extraction, header mime/charset, and that every decoded body
    round-trips to the original text bytes (closed-form oracle from the
    same synthesis arithmetic)."""
    from audit_star_spark.sources.warc import http_responses, warc_records

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    resp = http_responses(warc_records(_synth_warc_http(docs)))
    return resp.groupBy("archive_id").agg(
        F.count("*").cast("long").alias("n_responses"),
        F.count("http_status").cast("long").alias("n_http"),
        F.sum(F.when(F.col("http_status") == 200, 1).otherwise(0))
        .cast("long")
        .alias("n_ok"),
        F.sum(F.length("body")).cast("long").alias("body_bytes"),
        F.min("mime").alias("mime"),
        F.min("charset").alias("charset"),
        F.sum(F.when(F.col("content_encoding") == "gzip", 1).otherwise(0))
        .cast("long")
        .alias("n_gzip"),
    )


SQL_WARC_HTTP_CENSUS = """
SELECT doc_id AS archive_id,
       CAST(2 + doc_id % 3 AS BIGINT) AS n_responses,
       CAST(1 + doc_id % 3 AS BIGINT) AS n_http,
       CAST((CASE WHEN doc_id % 4 <> 0 THEN 1 ELSE 0 END)
          + (CASE WHEN doc_id % 3 >= 1 AND (doc_id + 1) % 4 <> 0 THEN 1 ELSE 0 END)
          + (CASE WHEN doc_id % 3 >= 2 AND (doc_id + 2) % 4 <> 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_ok,
       CAST((2 + doc_id % 3) * octet_length(encode(text)) AS BIGINT) AS body_bytes,
       'text/html' AS mime,
       'utf-8' AS charset,
       CAST(CASE WHEN doc_id % 2 = 1 THEN 1 + doc_id % 3 ELSE 0 END AS BIGINT) AS n_gzip
FROM documents
"""


def q_heavy_hitters_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled heavy-hitter certification (skew.py): top-10 hottest
    users with exact count, 10%-sample estimate, and the 4-sigma
    binomial contract flag — the scan-budget scale path, gate-certified
    like the HLL distinct contract."""
    from audit_star_spark.operators.skew import heavy_hitters_sampled

    h = heavy_hitters_sampled(
        load_table(spark, sf_dir, "events"),
        ["user_id"],
        row_id="event_id",
        k=10,
        rate_pct=10,
    )
    return h.select(
        "user_id", "n", F.round("est_n", 6).alias("est_n"), "within_contract"
    )


SQL_HEAVY_HITTERS_APPROX = """
WITH exact AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1
),
sampled AS (
  SELECT user_id, CAST(count(*) * 10.0 AS DOUBLE) AS est_n
  FROM events
  WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':hh'), 1, 15))::BIGINT % 100 < 10
  GROUP BY 1
)
SELECT e.user_id, e.n,
       round(coalesce(s.est_n, 0.0), 6) AS est_n,
       (abs(coalesce(s.est_n, 0.0) - e.n) <= 4.0 * sqrt(e.n * 9.0)) AS within_contract
FROM exact e LEFT JOIN sampled s USING (user_id)
ORDER BY e.n DESC, e.user_id
LIMIT 10
"""


def q_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key (plans/zorder.py) over
    (o_custkey, o_totalprice) for a deterministic order sample — the
    multi-column data-skipping layout's sort key, evaluated as the same
    unrolled shift/mask closed form in both engines."""
    from audit_star_spark.plans.zorder import zorder_key

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    keyed = zorder_key(orders, ["o_custkey", "o_totalprice"], width=8)
    return (
        keyed.filter(F.col("o_orderkey") % 101 == 0)
        .select("o_orderkey", F.col("__zkey").alias("zkey"))
    )


def _zorder_sql() -> str:
    from audit_star_spark.plans.zorder import morton_sql

    def rank(c: str, lo: str, hi: str) -> str:
        return (
            f"CASE WHEN {hi} <= {lo} THEN CAST(0 AS BIGINT) ELSE "
            f"CAST(least(CAST(255 AS DOUBLE), floor("
            f"(CAST({c} AS DOUBLE) - CAST({lo} AS DOUBLE)) / "
            f"(CAST({hi} AS DOUBLE) - CAST({lo} AS DOUBLE)) * 256)) AS BIGINT) END"
        )

    morton = morton_sql(["r_cust", "r_price"], width=8)
    return f"""
WITH bounds AS (
  SELECT min(o_custkey) AS lo_c, max(o_custkey) AS hi_c,
         min(o_totalprice) AS lo_p, max(o_totalprice) AS hi_p
  FROM orders
),
ranked AS (
  SELECT o_orderkey,
         {rank('o_custkey', 'b.lo_c', 'b.hi_c')} AS r_cust,
         {rank('o_totalprice', 'b.lo_p', 'b.hi_p')} AS r_price
  FROM orders CROSS JOIN bounds b
)
SELECT o_orderkey, {morton} AS zkey
FROM ranked WHERE o_orderkey % 101 = 0
"""


WEIGHTED_SAMPLE_K = 50


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted sampling without replacement (text.py
    weighted_sample, Efraimidis-Spirakis over md5-derived uniforms):
    sample K documents proportionally to token count — the standard
    data-mixing draw. The oracle evaluates the identical key formula."""
    from audit_star_spark.analytics.text import TOKENS_EXPR, weighted_sample

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.expr(f"size({TOKENS_EXPR})").cast("long").alias("n_tokens"),
    )
    return weighted_sample(docs, "n_tokens", k=WEIGHTED_SAMPLE_K)


SQL_WEIGHTED_SAMPLE = f"""
WITH base AS (
  SELECT doc_id, source, CAST(len({D_TOKENS}) AS BIGINT) AS n_tokens,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':ws'), 1, 15))::BIGINT
           + 1.0) / 1152921504606846977.0 AS u
  FROM documents
)
SELECT doc_id, source, n_tokens
FROM base
WHERE n_tokens IS NOT NULL AND n_tokens > 0
ORDER BY pow(u, 1.0 / n_tokens) DESC, doc_id
LIMIT {WEIGHTED_SAMPLE_K}
"""


def q_audio_resampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio resampling through the gate (multimodal.audio_resample,
    factor 2): the synthesized ±A square wave decimates to blocks of two
    samples — same-sign blocks stay ±A, blocks straddling a sign flip
    average to 0, so the resampled RMS has the closed form
    A*sqrt(1 - straddles/n_blocks) with straddles counted from the
    half-period's odd multiples. The payload is re-encoded WAV; rms is
    computed from the re-decoded int16 samples, so the whole
    decode->filter->encode loop is differential."""
    docs = load_table(spark, sf_dir, "documents")
    r = multimodal.audio_resample(multimodal.synth_audio(docs), factor=2)
    return r.select(
        "doc_id", "sample_rate", "n_samples", F.round("rms", 6).alias("rms")
    )


SQL_AUDIO_RESAMPLED = f"""
WITH params AS (
  SELECT doc_id,
         10 + doc_id % 7 AS half,
         CAST(400 + (doc_id % 5) * 80 AS BIGINT) AS n_blocks
  FROM documents
),
straddle AS (
  SELECT doc_id, n_blocks,
         CASE WHEN half % 2 = 0 THEN 0
              ELSE ((2 * n_blocks - 1) // half + 1) // 2 END AS s
  FROM params
)
SELECT doc_id,
       CAST({multimodal.AUDIO_RATE} // 2 AS INT) AS sample_rate,
       n_blocks AS n_samples,
       round({multimodal.AUDIO_AMP}.0 *
             sqrt(1.0 - CAST(s AS DOUBLE) / CAST(n_blocks AS DOUBLE)), 6) AS rms
FROM straddle
"""


def _synth_webdataset(spark_df):
    """doc_id-keyed WebDataset shard synthesis: per doc a tar of
    (1 + d%3) samples keyed {d:08d}-{j}, components txt (the doc text)
    and cls (d%10); odd doc_ids gzip the shard."""
    from audit_star_spark.sources.webdataset import encode_webdataset

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                samples = [
                    {
                        "key": f"{d:08d}-{j}",
                        "components": {
                            "txt": text.encode("utf-8"),
                            "cls": str(d % 10).encode(),
                        },
                    }
                    for j in range(1 + d % 3)
                ]
                payloads.append(encode_webdataset(samples, gz=bool(d % 2)))
            yield pd.DataFrame(
                {"archive_id": pdf["doc_id"], "payload": payloads}
            )

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("archive_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return spark_df.mapInPandas(synth, schema)


def q_webdataset_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WebDataset (tar-shard) parse through the gate
    (sources/webdataset.py): synthesize a shard per document (plain and
    gzip layouts), group members into samples, aggregate a census the
    oracle states closed-form from the synthesis arithmetic."""
    from audit_star_spark.sources.webdataset import webdataset_samples

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    recs = webdataset_samples(_synth_webdataset(docs))
    return recs.groupBy("archive_id").agg(
        F.count("*").alias("n_samples"),
        F.sum("n_components").cast("long").alias("n_components"),
        F.sum(
            F.length(F.element_at("components", F.lit("txt")))
        ).cast("long").alias("txt_bytes"),
        F.min("sample_key").alias("first_key"),
    )


SQL_WEBDATASET_CENSUS = """
SELECT doc_id AS archive_id,
       CAST(1 + doc_id % 3 AS BIGINT) AS n_samples,
       CAST(2 * (1 + doc_id % 3) AS BIGINT) AS n_components,
       CAST((1 + doc_id % 3) * octet_length(encode(text)) AS BIGINT) AS txt_bytes,
       printf('%08d-0', doc_id) AS first_key
FROM documents
"""


def q_image_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode -> ViT patch grid through the gate
    (multimodal.image_patches): per doc a 16x16 PGM with closed-form
    bytes (ASCII-safe so the UTF-8 binary cast is byte-exact), tiled
    into four 8x8 patches; the oracle restates per-patch mean and
    population std in SQL. Rounded for cross-engine float-sum order."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.expr(
            "CAST(concat('P5\\n16 16\\n255\\n', concat_ws('', "
            "transform(sequence(0, 255), "
            "i -> char(32 + (doc_id * 11 + i * 7) % 95)))) AS BINARY)"
        ).alias("payload"),
    )
    p = multimodal.image_patches(media, patch=8)
    return p.select(
        "doc_id",
        "patch_row",
        "patch_col",
        F.round("mean_luma", 6).alias("mean_luma"),
        F.round("std_luma", 6).alias("std_luma"),
    )


SQL_IMAGE_PATCHES = """
WITH px AS (
  SELECT doc_id, i // 16 AS r, i % 16 AS c,
         CAST(32 + (doc_id * 11 + i * 7) % 95 AS DOUBLE) AS v
  FROM documents, LATERAL (SELECT unnest(range(0, 256)) AS i)
),
patches AS (
  SELECT doc_id,
         CAST(r // 8 AS INT) AS patch_row,
         CAST(c // 8 AS INT) AS patch_col,
         avg(v) AS m,
         avg(v * v) AS m2
  FROM px GROUP BY 1, 2, 3
)
SELECT doc_id, patch_row, patch_col,
       round(m, 6) AS mean_luma,
       round(sqrt(m2 - m * m), 6) AS std_luma
FROM patches
"""


def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-distance z-score outlier sweep (similarity.py
    embedding_outliers): the corrupt-vector filter. The gate flag is
    recomputed from the ROUNDED z so a boundary |z| ~ 3 cannot flip
    between engines."""
    from audit_star_spark.analytics.similarity import embedding_outliers

    o = embedding_outliers(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    rz = F.round("z", 6)
    return o.select(
        "vec_id",
        "label",
        F.round("dist", 6).alias("dist"),
        rz.alias("z"),
        (F.abs(rz) > 3.0).alias("is_outlier"),
    )


SQL_EMBEDDING_OUTLIERS = f"""
WITH e AS (
  SELECT vec_id, label, {D_VEC} AS v FROM embeddings
),
dims AS (
  SELECT i, avg(v[i]) AS c
  FROM e, LATERAL (SELECT unnest(range(1, 65)) AS i)
  GROUP BY i
),
cent AS (SELECT list(c ORDER BY i) AS centroid FROM dims),
d AS (
  SELECT vec_id, label,
         sqrt({d_fold("list_transform(list_zip(v, centroid), p -> (p[1] - p[2]) * (p[1] - p[2]))", "CAST(0.0 AS DOUBLE)", "(a, b) -> a + b")}) AS dist
  FROM e CROSS JOIN cent
),
st AS (SELECT avg(dist) AS mu, stddev_pop(dist) AS sigma FROM d)
SELECT vec_id, label, round(dist, 6) AS dist,
       round((dist - mu) / sigma, 6) AS z,
       (abs(round((dist - mu) / sigma, 6)) > 3.0) AS is_outlier
FROM d CROSS JOIN st
"""


# synthetic 20-char titles: groups of 5 docs share an md5-derived base
# (collision-free across groups), each doc substitutes one digit at its
# own position -> within-group pairwise substitution distance exactly 2
_TITLE_SPARK = (
    "concat_ws('', transform(sequence(0, 19), j -> "
    "CASE WHEN j = (doc_id % 5) * 4 THEN char(48 + doc_id % 5) "
    "ELSE char(97 + CAST(conv(substring(md5(concat(CAST(doc_id div 5 AS STRING), "
    "'-', CAST(j AS STRING))), 1, 2), 16, 10) AS INT) % 26) END))"
)


def q_title_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-recall substitution-distance near-pairs (dedup.py
    string_subst_pairs): pigeonhole segment blocking on synthetic
    titles; the oracle brute-forces ALL pairs with DuckDB's hamming(),
    so the blocking's 100%-recall claim is hash-checked against an
    exhaustive independent computation."""
    from audit_star_spark.analytics.dedup import string_subst_pairs

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_TITLE_SPARK).alias("title")
    )
    return string_subst_pairs(docs, "title", max_subs=2)


SQL_TITLE_NEAR_PAIRS = """
WITH titles AS (
  SELECT doc_id,
         (SELECT string_agg(
            CASE WHEN j = (d.doc_id % 5) * 4 THEN chr(48 + CAST(d.doc_id % 5 AS INT))
                 ELSE chr(97 + ('0x' || substr(md5(concat(d.doc_id // 5, '-', j)), 1, 2))::INT % 26)
            END, '' ORDER BY j)
          FROM generate_series(0, 19) t(j)) AS title
  FROM documents d
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(hamming(a.title, b.title) AS INT) AS distance
FROM titles a JOIN titles b ON a.doc_id < b.doc_id
WHERE hamming(a.title, b.title) <= 2
"""


def q_projected_knn_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of brute-force kNN in the 16-d JL-projected space vs the
    exact 64-d top-10 (similarity.projected_recall) — the accuracy gate
    for running ANN over projections, twin of quantized_knn_recall. The
    projection is bit-identical cross-engine, so the oracle recomputes
    the whole projected ranking independently."""
    from audit_star_spark.analytics.similarity import projected_recall

    return projected_recall(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), n_queries=8, k=10
    )


def _projected_recall_sql(k: int = 10, n_queries: int = 8) -> str:
    from audit_star_spark.analytics.similarity import projection_matrix

    rows = projection_matrix(64)
    proj_elems = ", ".join(
        d_fold(
            f"list_transform(list_zip({D_VEC}, [{', '.join(repr(x) for x in row)}]), "
            "x -> x[1] * x[2])",
            "CAST(0.0 AS DOUBLE)",
            "(s, v) -> s + v",
        )
        for row in rows
    )
    pdot = d_fold(
        "list_transform(list_zip(pq.q_p, pn.p), x -> x[1] * x[2])",
        "CAST(0.0 AS DOUBLE)",
        "(s, v) -> s + v",
    )
    pnorm = d_fold(
        "list_transform(p, x -> x * x)", "CAST(0.0 AS DOUBLE)", "(s, v) -> s + v"
    )
    return f"""
WITH exact AS ({_knn_sql(k, n_queries, bucketed=False)}),
proj AS (
  SELECT vec_id, [{proj_elems}] AS p FROM embeddings
),
pn AS (SELECT vec_id, p, sqrt({pnorm}) AS pnorm FROM proj),
pq AS (
  SELECT vec_id AS query_id, p AS q_p, pnorm AS q_pnorm
  FROM pn WHERE vec_id < {n_queries}
),
pscored AS (
  SELECT pq.query_id, pn.vec_id,
         {pdot} / nullif(pq.q_pnorm * pn.pnorm, 0.0) AS cosine
  FROM pn JOIN pq ON pn.vec_id <> pq.query_id
),
ptop AS (
  SELECT query_id, vec_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id) AS r
    FROM pscored
  ) WHERE r <= {k}
)
SELECT e.query_id, CAST(COUNT(p.vec_id) AS BIGINT) AS n_hits,
       CAST(COUNT(p.vec_id) AS DOUBLE) / {k}.0 AS recall
FROM exact e LEFT JOIN ptop p
  ON e.query_id = p.query_id AND e.vec_id = p.vec_id
GROUP BY e.query_id
"""


def _synth_gif(spark_df):
    """doc_id-keyed GIF synthesis (mapInPandas): grayscale
    (4 + d%5) x (3 + d%4) frames, pixel i = (d*13 + i*5) % 256, every
    third doc interlaced and every fourth two-frame — LZW, palette,
    interlace and multi-frame paths all cross the gate."""
    from audit_star_spark.analytics.gif import encode_gif

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 4 + d % 5, 3 + d % 4
                px = (d * 13 + np.arange(w * h) * 5) % 256
                img = px.astype(np.uint8).reshape(h, w, 1)
                payloads.append(
                    encode_gif(
                        img,
                        interlace=(d % 3 == 0),
                        n_frames=2 if d % 4 == 0 else 1,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return spark_df.mapInPandas(synth, schema)


def q_gif_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode through the gate (analytics/gif.py): LZW with
    width growth, interlace, palette mapping and multi-frame structure,
    pushed through image_meta; the oracle states dimensions and mean
    luminance closed-form from the synthesis arithmetic."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    m = multimodal.image_meta(_synth_gif(docs))
    return m.select(
        "doc_id",
        "format",
        "width",
        "height",
        "channels",
        F.round("mean_luma", 6).alias("mean_luma"),
    )


SQL_GIF_META = """
WITH dims AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
),
px AS (
  SELECT doc_id, w, h, CAST((doc_id * 13 + i * 5) % 256 AS DOUBLE) AS v
  FROM dims, LATERAL (SELECT unnest(range(0, w * h)) AS i)
)
SELECT doc_id, 'gif' AS format,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(3 AS INT) AS channels,
       round(avg(0.299 * v + 0.587 * v + 0.114 * v), 6) AS mean_luma
FROM px GROUP BY doc_id, w, h
"""


def _synth_gif_anim(spark_df):
    """doc_id-keyed animated-GIF synthesis: 4 frames per doc over an
    8x8 screen with grayscale v = doc_id % 200 + 1 — full paint
    (disposal 0), 4x4 patch of 248 at (0,0) with disposal 2 (rect
    restored to background), 2x2 patch of 128 at (4,4), and a
    checkerboard-masked transparent 4x4 patch of 30 at (0,0). All pixel
    counts are powers of two so every composite mean is EXACT in
    float64 and the oracle states it closed-form."""
    import numpy as np

    from audit_star_spark.analytics.gif import encode_gif_animation

    def synth(batches):
        import pandas as pd

        mask = np.zeros((4, 4), dtype=bool)
        mask[::2, ::2] = True
        mask[1::2, 1::2] = True  # 8 of 16 opaque
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                v = int(doc_id) % 200 + 1
                base = np.full((8, 8, 3), v, dtype=np.uint8)
                p1 = np.full((4, 4, 3), 248, dtype=np.uint8)
                p2 = np.full((2, 2, 3), 128, dtype=np.uint8)
                p3 = np.full((4, 4, 3), 30, dtype=np.uint8)
                payloads.append(
                    encode_gif_animation(
                        [
                            {"img": base, "disposal": 0},
                            {"img": p1, "left": 0, "top": 0, "disposal": 2},
                            {"img": p2, "left": 4, "top": 4, "disposal": 0},
                            {
                                "img": p3,
                                "left": 0,
                                "top": 0,
                                "mask": mask,
                                "disposal": 0,
                            },
                        ],
                        (8, 8),
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return spark_df.mapInPandas(synth, schema)


def q_gif_anim_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL animated-GIF compositing through the gate (gif.py
    parse_gif_frames via multimodal.gif_frame_means): disposal 0 and 2,
    frame offsets, GCE transparency all cross the decode; the oracle
    states every composite's channel mean closed-form (binary-exact
    arithmetic by construction, no rounding hazard):

      f0 = v;                      full paint
      f1 = (48v + 16*248)/64       4x4 of 248 over f0
      f2 = (44v + 4*128)/64        f1's rect restored to bg 0, 2x2 of 128
      f3 = f2 + 8*30/64            8 transparent-masked px of 30 over bg
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    m = multimodal.gif_frame_means(_synth_gif_anim(docs))
    return m.select(
        "doc_id",
        "frame_idx",
        "disposal",
        "transparent",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_b", 6).alias("mean_b"),
    )


SQL_GIF_ANIM_CENSUS = """
WITH v AS (
  SELECT doc_id, CAST(doc_id % 200 + 1 AS DOUBLE) AS v FROM documents
),
frames AS (
  SELECT doc_id, 0 AS frame_idx, 0 AS disposal, FALSE AS transparent,
         v AS m FROM v
  UNION ALL
  SELECT doc_id, 1, 2, FALSE, (48 * v + 16 * 248) / 64 FROM v
  UNION ALL
  SELECT doc_id, 2, 0, FALSE, (44 * v + 4 * 128) / 64 FROM v
  UNION ALL
  SELECT doc_id, 3, 0, TRUE, (44 * v + 4 * 128) / 64 + 240.0 / 64 FROM v
)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(disposal AS INT) AS disposal, transparent,
       round(m, 6) AS mean_r, round(m, 6) AS mean_b
FROM frames
"""


def q_source_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source length-weighted sampling (text.py
    weighted_sample_per_group): 3 docs per source — the per-bucket
    variant of the data-mixing draw, one group-keyed window."""
    from audit_star_spark.analytics.text import (
        TOKENS_EXPR,
        weighted_sample_per_group,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.expr(f"size({TOKENS_EXPR})").cast("long").alias("n_tokens"),
    )
    return weighted_sample_per_group(docs, "source", "n_tokens", k=3)


SQL_SOURCE_WEIGHTED_SAMPLE = f"""
WITH base AS (
  SELECT doc_id, source, CAST(len({D_TOKENS}) AS BIGINT) AS n_tokens,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':ws'), 1, 15))::BIGINT
           + 1.0) / 1152921504606846977.0 AS u
  FROM documents
),
ranked AS (
  SELECT doc_id, source, n_tokens,
         row_number() OVER (PARTITION BY source
                            ORDER BY pow(u, 1.0 / n_tokens) DESC, doc_id) AS rn
  FROM base WHERE n_tokens IS NOT NULL AND n_tokens > 0
)
SELECT doc_id, source, n_tokens FROM ranked WHERE rn <= 3
"""


EXTRA_QUERIES = {
    "scd2_users": q_scd2_users,
    "source_weighted_sample": q_source_weighted_sample,
    "audio_resampled": q_audio_resampled,
    "webdataset_census": q_webdataset_census,
    "image_patches": q_image_patches,
    "embedding_outliers": q_embedding_outliers,
    "title_near_pairs": q_title_near_pairs,
    "projected_knn_recall": q_projected_knn_recall,
    "gif_meta": q_gif_meta,
    "bm25_search": q_bm25_search,
    "doc_perplexity": q_doc_perplexity,
    "doc_pagerank": q_doc_pagerank,
    "embedding_projection": q_embedding_projection,
    "warc_census": q_warc_census,
    "warc_http_census": q_warc_http_census,
    "gif_anim_census": q_gif_anim_census,
    "ivf_index_probe": q_ivf_index_probe,
    "flac_meta": q_flac_meta,
    "crawl_pipeline_report": q_crawl_pipeline_report,
    "warc_reshard_census": q_warc_reshard_census,
    "vision_prep_census": q_vision_prep_census,
    "hll_event_users": q_hll_event_users,
    "kmv_audience_overlap": q_kmv_audience_overlap,
    "doc_triangles": q_doc_triangles,
    "price_quantiles_hdr": q_price_quantiles_hdr,
    "bloom_prefilter_stats": q_bloom_prefilter_stats,
    "customer_fuzzy_links": q_customer_fuzzy_links,
    "cms_event_counts": q_cms_event_counts,
    "y4m_census": q_y4m_census,
    "pq_topk_recall": q_pq_topk_recall,
    "ivfpq_probe_recall": q_ivfpq_probe_recall,
    "join_size_estimate": q_join_size_estimate,
    "g711_census": q_g711_census,
    "weighted_price_quantiles": q_weighted_price_quantiles,
    "weighted_sample_docs": q_weighted_sample,
    "heavy_hitters_approx": q_heavy_hitters_approx,
    "zorder_keys": q_zorder_keys,
    "dedup_ngram_jaccard": q_ngram_jaccard,
    "knn_lsh": q_knn_lsh,
    "label_nearest_neighbor": q_label_nn,
    "repetition_stats": q_repetition_stats,
    "pii_scan": q_pii_scan,
    "benchmark_contamination": q_benchmark_contamination,
    "bpe_corpus": q_bpe_corpus,
    "text_stats": q_text_stats,
    "token_topk": q_token_topk,
    "corpus_splits": q_corpus_splits,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    "char_entropy": q_char_entropy,
    "multimodal_features": q_multimodal_features,
    "frame_samples": q_frame_samples,
    "stratified_sample": q_stratified_sample,
    "doc_chunks": q_doc_chunks,
    "knn_bruteforce": q_knn_bruteforce,
    "sequence_packing": q_sequence_packing,
    "simhash_fingerprints": q_simhash,
    "image_meta": q_image_meta,
    "dedup_exact": q_dedup_exact,
    "audio_meta": q_audio_meta,
    "png_meta": q_png_meta,
    "boilerplate_phrases": q_boilerplate_phrases,
    "semantic_dedup": q_semantic_dedup,
    "kmeans_update": q_kmeans_update,
    "source_mix_report": q_source_mix_report,
}

EXTRA_ORACLES = {
    "scd2_users": SQL_SCD2_USERS,
    "source_weighted_sample": SQL_SOURCE_WEIGHTED_SAMPLE,
    "audio_resampled": SQL_AUDIO_RESAMPLED,
    "webdataset_census": SQL_WEBDATASET_CENSUS,
    "image_patches": SQL_IMAGE_PATCHES,
    "embedding_outliers": SQL_EMBEDDING_OUTLIERS,
    "title_near_pairs": SQL_TITLE_NEAR_PAIRS,
    "projected_knn_recall": _projected_recall_sql(),
    "gif_meta": SQL_GIF_META,
    "bm25_search": _bm25_sql(),
    "doc_perplexity": _perplexity_sql(),
    "doc_pagerank": _pagerank_sql(),
    "embedding_projection": _projection_sql(),
    "warc_census": SQL_WARC_CENSUS,
    "warc_http_census": SQL_WARC_HTTP_CENSUS,
    "gif_anim_census": SQL_GIF_ANIM_CENSUS,
    "ivf_index_probe": _ivf_index_probe_sql(),
    "flac_meta": SQL_FLAC_META,
    "crawl_pipeline_report": _crawl_pipeline_sql(),
    "warc_reshard_census": SQL_WARC_RESHARD_CENSUS,
    "vision_prep_census": SQL_VISION_PREP_CENSUS,
    "hll_event_users": _hll_event_users_sql(),
    "kmv_audience_overlap": _kmv_overlap_sql(),
    "doc_triangles": _doc_triangles_sql(),
    "price_quantiles_hdr": _price_quantiles_hdr_sql(),
    "bloom_prefilter_stats": _bloom_prefilter_sql(),
    "customer_fuzzy_links": SQL_CUSTOMER_FUZZY_LINKS,
    "cms_event_counts": _cms_event_counts_sql(),
    "y4m_census": SQL_Y4M_CENSUS,
    "pq_topk_recall": _pq_recall_sql(),
    "ivfpq_probe_recall": _ivfpq_recall_sql(),
    "join_size_estimate": _join_size_sql(),
    "g711_census": SQL_G711_CENSUS,
    "weighted_price_quantiles": _weighted_price_quantiles_sql(),
    "weighted_sample_docs": SQL_WEIGHTED_SAMPLE,
    "heavy_hitters_approx": SQL_HEAVY_HITTERS_APPROX,
    "zorder_keys": _zorder_sql(),
    "text_stats": SQL_TEXT_STATS,
    "token_topk": SQL_TOKEN_TOPK,
    "corpus_splits": SQL_CORPUS_SPLITS,
    "lang_id": _lang_sql(),
    "doc_fingerprint": SQL_FINGERPRINT,
    "char_entropy": SQL_CHAR_ENTROPY,
    "multimodal_features": SQL_MULTIMODAL,
    "frame_samples": SQL_FRAME_SAMPLES,
    "stratified_sample": SQL_STRATIFIED,
    "doc_chunks": _doc_chunks_sql(),
    "knn_bruteforce": _knn_sql(k=10, n_queries=8, bucketed=False),
    "sequence_packing": _sequence_packing_sql(),
    "simhash_fingerprints": SQL_SIMHASH,
    "image_meta": SQL_IMAGE_META,
    "dedup_exact": SQL_DEDUP_EXACT,
    "audio_meta": SQL_AUDIO_META,
    "png_meta": SQL_PNG_META,
    "boilerplate_phrases": _boilerplate_sql(),
    "semantic_dedup": _semantic_dedup_sql(),
    "kmeans_update": _kmeans_sql(),
    "source_mix_report": _source_mix_sql(),
    "dedup_ngram_jaccard": _ngram_jaccard_sql(),
    "knn_lsh": _knn_sql(k=5, n_queries=8, bucketed=True),
    "label_nearest_neighbor": SQL_LABEL_NN,
    "repetition_stats": _repetition_sql(),
    "pii_scan": _pii_sql(),
    "benchmark_contamination": _contamination_sql(),
    "bpe_corpus": _bpe_corpus_sql(),
}


# ----------------------------------------------------------- gate rotation
# Round-6 rotation of the driver's 50-row correctness window (8 audit +
# 42 analytics, insertion order — see __spark_entry__.queries()). The 17
# round-5 queries move from EXTRA into the gate so they earn hard
# CORRECTNESS_r06 rows; 17 double-green (driver-green in >=2 prior
# rounds) entries move out to EXTRA, where tests/test_oracle_parity.py
# keeps them oracle-locked every pytest run. Done as a mutation block
# because the round-5 query functions are defined after the
# ANALYTICS_QUERIES literal above.
_R6_ROTATE_IN = [
    "scd2_users",
    "source_weighted_sample",
    "bm25_search",
    "doc_perplexity",
    "doc_pagerank",
    "embedding_projection",
    "warc_census",
    "weighted_sample_docs",
    "heavy_hitters_approx",
    "zorder_keys",
    "audio_resampled",
    "webdataset_census",
    "image_patches",
    "embedding_outliers",
    "title_near_pairs",
    "projected_knn_recall",
    "gif_meta",
]
_R6_ROTATE_OUT = [
    "span_dedup_stats",
    "source_tfidf_topk",
    "event_resample_hourly",
    "purchase_attribution",
    "event_funnel",
    "image_ahash",
    "audio_fingerprint",
    "html_extract",
    "link_domains",
    "orders_validation",
    "price_histogram",
    "vocab_coverage",
    "embedding_quantization",
    "bpe_transfer_stats",
    "event_heavy_hitters",
    "url_normalization",
    "script_profile",
]
for _name in _R6_ROTATE_OUT:
    EXTRA_QUERIES[_name] = ANALYTICS_QUERIES.pop(_name)
    EXTRA_ORACLES[_name] = ANALYTICS_ORACLES.pop(_name)
for _name in _R6_ROTATE_IN:
    ANALYTICS_QUERIES[_name] = EXTRA_QUERIES.pop(_name)
    ANALYTICS_ORACLES[_name] = EXTRA_ORACLES.pop(_name)
del _name

# Round-9 rotation: the 20 gate-ready round-7/8 queries (IVF-PQ + IVF
# index, mergeable sketches, FLAC/Y4M/G.711/GIF-animation codecs, WARC
# HTTP envelope + crawl pipeline + re-sharding, vision prep, Bloom
# prefilter, FastSS linkage, triangle counting) move from EXTRA into the
# gate so they earn hard CORRECTNESS_r09 rows; 20 double-green entries
# (driver-green in >=2 prior rounds, and the no-oracle compression_ratio
# slot, which can never hash-check) retire to EXTRA where
# tests/test_oracle_parity.py keeps them oracle-locked every pytest run.
_R9_ROTATE_IN = [
    "hll_event_users",
    "kmv_audience_overlap",
    "cms_event_counts",
    "join_size_estimate",
    "price_quantiles_hdr",
    "weighted_price_quantiles",
    "bloom_prefilter_stats",
    "customer_fuzzy_links",
    "doc_triangles",
    "ivf_index_probe",
    "pq_topk_recall",
    "ivfpq_probe_recall",
    "flac_meta",
    "gif_anim_census",
    "y4m_census",
    "g711_census",
    "warc_http_census",
    "crawl_pipeline_report",
    "warc_reshard_census",
    "vision_prep_census",
]
_R9_ROTATE_OUT = [
    "compression_ratio",  # no SQL oracle by design — burns a hash slot
    "jpeg_meta",
    "bpe_merges",
    "retention_cohorts",
    "rate_anomalies",
    "video_meta",
    "video_frame_means",
    "scd2_users",
    "source_weighted_sample",
    "embedding_projection",
    "weighted_sample_docs",
    "heavy_hitters_approx",
    "zorder_keys",
    "audio_resampled",
    "webdataset_census",
    "image_patches",
    "embedding_outliers",
    "title_near_pairs",
    "projected_knn_recall",
    "gif_meta",
]
for _name in _R9_ROTATE_OUT:
    EXTRA_QUERIES[_name] = ANALYTICS_QUERIES.pop(_name)
    if _name in ANALYTICS_ORACLES:  # compression_ratio has no oracle
        EXTRA_ORACLES[_name] = ANALYTICS_ORACLES.pop(_name)
for _name in _R9_ROTATE_IN:
    ANALYTICS_QUERIES[_name] = EXTRA_QUERIES.pop(_name)
    ANALYTICS_ORACLES[_name] = EXTRA_ORACLES.pop(_name)

if len(ANALYTICS_QUERIES) != 42:  # driver gate window: 8 audit + 42 analytics
    raise RuntimeError(
        "ANALYTICS_QUERIES must stay exactly 42 entries so the driver's "
        f"50-slot correctness window is stable; got {len(ANALYTICS_QUERIES)}"
    )
del _name


# ------------------------------------------------ round-9 additions (EXTRA)
def q_substring_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup WITH REMOVAL through the gate
    (analytics/dedup.py substring_dedup_rewrite): overlapping 8-token
    window hashes, global keep-first occurrence rank, in-row span merge
    and text rewrite. The oracle restates window hashing, the
    first-occurrence rank, the lag-based interval merge and the indexed
    list_filter rewrite in SQL; clean_md5 locks the rewritten TEXT
    byte-for-byte, not just the counts."""
    return dedup.substring_dedup_rewrite(
        load_table(spark, sf_dir, "documents"), k=8
    )


def _substring_dedup_sql(k: int = 8) -> str:
    h = (
        f"('0x' || substr(md5(array_to_string("
        f"list_slice(toks, pos + 1, pos + {k}), ' ')), 1, 15))::BIGINT"
    )
    return f"""
WITH base AS (
  SELECT doc_id, {D_TOKENS} AS toks FROM documents
),
wins AS (
  SELECT doc_id, unnest(generate_series(0, len(toks) - {k})) AS pos, toks
  FROM base WHERE len(toks) >= {k}
),
hashed AS (
  SELECT doc_id, pos, {h} AS h FROM wins
),
removed AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
    FROM hashed
  ) WHERE rn > 1
),
marked AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                OR pos > lag(pos) OVER w + {k} THEN 1 ELSE 0 END AS new_span
  FROM removed
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sp AS (
  SELECT doc_id, pos,
         SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
  FROM marked
),
spans AS (
  SELECT doc_id, span_id, MIN(pos) AS s, MAX(pos) + {k} AS e
  FROM sp GROUP BY 1, 2
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
         CAST(SUM(e - s) AS BIGINT) AS n_removed_tokens,
         list(struct_pack(s := s, e := e)) AS spans
  FROM spans GROUP BY 1
)
SELECT b.doc_id,
       CAST(len(b.toks) AS BIGINT) AS n_tokens,
       COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
       COALESCE(p.n_removed_tokens, 0) AS n_removed_tokens,
       round(COALESCE(p.n_removed_tokens, 0) / CAST(len(b.toks) AS DOUBLE), 6)
         AS removed_fraction,
       -- COALESCE: DuckDB's array_to_string([]) is NULL, Spark's
       -- array_join(empty) is '' — a fully-removed doc must hash ''
       md5(COALESCE(array_to_string(
         CASE WHEN p.spans IS NULL THEN b.toks
              ELSE list_filter(b.toks, (t, i) -> len(list_filter(p.spans,
                     sp -> i - 1 >= sp.s AND i - 1 < sp.e)) = 0) END,
         ' '), '')) AS clean_md5
FROM base b LEFT JOIN per_doc p USING (doc_id)
"""


EXTRA_QUERIES["substring_dedup_rewrite"] = q_substring_dedup_rewrite
EXTRA_ORACLES["substring_dedup_rewrite"] = _substring_dedup_sql()


def _synth_audio_441(spark_df):
    """doc_id-keyed 44.1 kHz WAV synthesis (mapInPandas, same plumbing
    as multimodal.synth_audio): ±8000 square wave, half-period
    10 + d%7, length 800 + (d%5)*160 samples — but at the real-world
    44100 Hz rate whose 16 kHz conversion is rational 160:441."""
    import numpy as np
    from pyspark.sql import types as T

    from audit_star_spark.util import spread

    def synth(batches):
        import pandas as pd

        from audit_star_spark.analytics.multimodal import encode_wav

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                half = 10 + d % 7
                n = 800 + (d % 5) * 160
                i = np.arange(n)
                s = 8000 * (1 - 2 * ((i // half) % 2))
                payloads.append(encode_wav(s.astype("<i2"), 44100))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return spread(spark_df.select("doc_id")).mapInPandas(
        synth,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def q_audio_resampled_rational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL rational-factor resampling through the gate
    (multimodal.audio_resample_rational, 44.1 kHz -> 16 kHz = 160:441,
    THE most common audio-pipeline conversion): boxcar prefilter of
    width down//up = 2, then linear interpolation at exact rational
    positions. The oracle replays the ENTIRE arithmetic per sample in
    SQL — square-wave synth, prefilter, integer-index/frac split,
    interpolation, half-away-from-zero rounding, RMS — exactly: every
    float step is either exact in f64 (±8000 halves, integer squares
    < 2^53, order-free sums) or a deterministic single-expression op."""
    docs = load_table(spark, sf_dir, "documents")
    r = multimodal.audio_resample_rational(
        _synth_audio_441(docs), up=160, down=441
    )
    return r.select(
        "doc_id", "sample_rate", "n_samples", F.round("rms", 6).alias("rms")
    )


SQL_AUDIO_RESAMPLED_RATIONAL = """
WITH params AS (
  SELECT doc_id, 10 + doc_id % 7 AS half,
         CAST(800 + (doc_id % 5) * 160 AS BIGINT) AS n
  FROM documents
),
-- f[j] = (s[j] + s[j+1]) / 2 for j in 0..n-2 (boxcar w = 441//160 = 2)
fv AS (
  SELECT doc_id, n, j,
         (8000.0 * (1 - 2 * ((j // half) % 2))
          + 8000.0 * (1 - 2 * (((j + 1) // half) % 2))) / 2.0 AS f
  FROM (SELECT doc_id, half, n, unnest(generate_series(0, n - 2)) AS j
        FROM params)
),
-- n_out = (len_f - 1) * up // down + 1 with len_f = n - 1
outidx AS (
  SELECT doc_id, n, unnest(generate_series(0, ((n - 2) * 160) // 441)) AS m
  FROM params
),
interp AS (
  SELECT o.doc_id, o.m, fl.f AS flo, fh.f AS fhi,
         CAST((o.m * 441) % 160 AS DOUBLE) / 160.0 AS frac
  FROM outidx o
  JOIN fv fl ON fl.doc_id = o.doc_id AND fl.j = (o.m * 441) // 160
  JOIN fv fh ON fh.doc_id = o.doc_id
            AND fh.j = LEAST((o.m * 441) // 160 + 1, o.n - 2)
),
rounded AS (
  SELECT doc_id,
         CASE WHEN v >= 0 THEN floor(v + 0.5)
              ELSE -floor(-v + 0.5) END AS o
  FROM (SELECT doc_id, flo * (1.0 - frac) + fhi * frac AS v FROM interp)
)
SELECT doc_id,
       CAST(16000 AS INT) AS sample_rate,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       round(sqrt(AVG(o * o)), 6) AS rms
FROM rounded GROUP BY doc_id
"""


EXTRA_QUERIES["audio_resampled_rational"] = q_audio_resampled_rational
EXTRA_ORACLES["audio_resampled_rational"] = SQL_AUDIO_RESAMPLED_RATIONAL


def _synth_mp3_l2(spark_df):
    """doc_id-keyed MPEG-1 Layer II synthesis (mapInPandas, via the
    bit-level encoder in analytics/mp3.py): 1 + d%3 identical 192 kbps
    44.1 kHz mono frames; 9 active subbands (sb % 3 == d % 3), levels
    3/5/7/15 by row class, all four scfsi modes, doc-keyed scalefactors
    and codes — every value a closed form in (doc_id, sb, gr, i) so the
    oracle can replay the requantization in SQL."""
    from pyspark.sql import types as T

    from audit_star_spark.util import spread

    def synth(batches):
        import pandas as pd

        from audit_star_spark.analytics.mp3 import (
            _b2a_row,
            _QCLASS,
            encode_mp3_layer2,
        )

        def frame(d):
            fr = {"alloc": {}, "scfsi": {}, "sf": {}, "codes": {}}
            for sb in range(27):
                if sb % 3 != d % 3:
                    continue
                _, steps = _b2a_row(sb)
                idx = 1 + ((sb + d) % (3 if sb < 23 else 2))
                n = steps[idx - 1]
                _, grouped, _ = _QCLASS[n]
                scfsi = (sb + d) % 4
                count = {0: 3, 1: 2, 2: 1, 3: 2}[scfsi]
                fr["alloc"][sb] = idx
                fr["scfsi"][sb] = scfsi
                fr["sf"][sb] = [
                    (2 * sb + 3 * d + 11 * j) % 63 for j in range(count)
                ]
                if grouped:
                    fr["codes"][sb] = [
                        (d + 13 * gr + 31 * sb) % (n * n * n)
                        for gr in range(12)
                    ]
                else:
                    fr["codes"][sb] = [
                        tuple(
                            (d + 13 * gr + 31 * sb + 17 * i) % n
                            for i in range(3)
                        )
                        for gr in range(12)
                    ]
            return fr

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                payloads.append(
                    encode_mp3_layer2([frame(d)] * (1 + d % 3), kbps=192)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return spread(spark_df.select("doc_id")).mapInPandas(
        synth,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def q_mp3_l2_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MPEG-1 Layer II decode through the gate (analytics/mp3.py
    decode_mp3_layer2): the synthesized frames round-trip the actual
    bitstream — allocation/scfsi/scalefactor/grouped-code packing by
    encode_mp3_layer2, bit-exact requantization on the way back — and
    the oracle replays s' = 2^(1-sf/3) * (2^nb/n) * (code*2^(1-nb) - 1
    + D) per (sb, granule, i) in SQL. A single mispacked bit anywhere
    scrambles every later code in the frame, so subband_rms is a
    whole-bitstream checksum."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    r = multimodal.mp3_layer2_census(_synth_mp3_l2(docs))
    return r.select(
        "doc_id",
        "n_frames",
        "sample_rate",
        "n_active_subbands",
        "n_samples",
        F.round("subband_rms", 6).alias("subband_rms"),
    )


SQL_MP3_L2_CENSUS = """
WITH sbs AS (
  SELECT doc_id, sb
  FROM documents CROSS JOIN (SELECT unnest(range(27)) AS sb)
  WHERE sb % 3 = doc_id % 3
),
lvl AS (
  SELECT doc_id, sb,
    CASE WHEN sb < 3 THEN
           (CASE (sb + doc_id) % 3 WHEN 0 THEN 3 WHEN 1 THEN 7 ELSE 15 END)
         WHEN sb < 23 THEN
           (CASE (sb + doc_id) % 3 WHEN 0 THEN 3 WHEN 1 THEN 5 ELSE 7 END)
         ELSE (CASE (sb + doc_id) % 2 WHEN 0 THEN 3 ELSE 5 END) END AS n,
    (sb + doc_id) % 4 AS scfsi
  FROM sbs
),
samp AS (
  SELECT l.*, g.gr, i.i, g.gr // 4 AS part,
         CASE l.n WHEN 3 THEN 2 WHEN 5 THEN 3 WHEN 7 THEN 3 ELSE 4 END AS nb
  FROM lvl l
  CROSS JOIN (SELECT unnest(range(12)) AS gr) g
  CROSS JOIN (SELECT unnest(range(3)) AS i) i
),
coded AS (
  SELECT doc_id, n, nb,
    (2 * sb + 3 * doc_id + 11 *
      (CASE WHEN scfsi = 0 THEN part
            WHEN scfsi = 1 THEN (CASE WHEN part <= 1 THEN 0 ELSE 1 END)
            WHEN scfsi = 2 THEN 0
            ELSE (CASE WHEN part = 0 THEN 0 ELSE 1 END) END)) % 63 AS sfidx,
    CASE WHEN n IN (3, 5) THEN
      (((doc_id + 13 * gr + 31 * sb) % (n * n * n))
        // (CASE i WHEN 0 THEN 1 WHEN 1 THEN n ELSE n * n END)) % n
    ELSE (doc_id + 13 * gr + 31 * sb + 17 * i) % n END AS code
  FROM samp
),
vals AS (
  SELECT doc_id,
    power(2.0, 1.0 - sfidx / 3.0)
      * (power(2.0, nb) / n)
      * (code * power(2.0, CAST(1 - nb AS DOUBLE)) - 1.0
         + (1.0 - (n - 1) * power(2.0, CAST(-nb AS DOUBLE)))) AS sp
  FROM coded
)
SELECT doc_id,
  CAST(1 + doc_id % 3 AS INT) AS n_frames,
  CAST(44100 AS INT) AS sample_rate,
  CAST(9 * (1 + doc_id % 3) AS BIGINT) AS n_active_subbands,
  CAST(COUNT(*) * (1 + doc_id % 3) AS BIGINT) AS n_samples,
  round(sqrt(AVG(sp * sp)), 6) AS subband_rms
FROM vals GROUP BY doc_id
"""


EXTRA_QUERIES["mp3_l2_census"] = q_mp3_l2_census
EXTRA_ORACLES["mp3_l2_census"] = SQL_MP3_L2_CENSUS


def q_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+dense retrieval through the gate
    (analytics/search.py hybrid_rrf_topk): BM25 over the corpus fused
    with the exact cosine top-pool for doc 0's embedding by reciprocal
    rank — the score-calibration-free fusion every retrieval-augmented
    curation sweep runs. The oracle replays both rankings (BM25 from
    the shared SQL generator, cosine from the d_dot idiom) and the
    1/(60+rank) fusion arithmetic."""
    from audit_star_spark.analytics.search import hybrid_rrf_topk

    return hybrid_rrf_topk(
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
        BM25_QUERY_TERMS,
        query_vec_id=0,
        k=10,
        pool=20,
    )


def _hybrid_rrf_sql(
    k: int = 10, pool: int = 20, rrf_k: int = 60, query_vec_id: int = 0
) -> str:
    from audit_star_spark.analytics.search import bm25_sql

    bm = bm25_sql("documents", "text", BM25_QUERY_TERMS, k=pool)
    return f"""
WITH bm AS ({bm}),
lexr AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY round(score, 6) DESC, doc_id) AS r_lex
  FROM bm
),
base AS (
  SELECT vec_id, {D_VEC} AS vec FROM embeddings
),
normed AS (
  SELECT vec_id, vec, sqrt({d_dot('vec', 'vec')}) AS norm FROM base
),
qv AS (
  SELECT vec AS qvec, norm AS qnorm FROM normed
  WHERE vec_id = {query_vec_id}
),
sem AS (
  SELECT n.vec_id AS doc_id,
         {d_dot('q.qvec', 'n.vec')} / (q.qnorm * n.norm) AS cosine
  FROM normed n CROSS JOIN qv q
  WHERE n.vec_id <> {query_vec_id}
  ORDER BY cosine DESC, n.vec_id
  LIMIT {pool}
),
semr AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS r_sem
  FROM sem
),
fused AS (
  SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
         l.r_lex AS r_lex, s.r_sem AS r_sem,
         COALESCE(1.0 / ({rrf_k}.0 + l.r_lex), 0.0)
           + COALESCE(1.0 / ({rrf_k}.0 + s.r_sem), 0.0) AS rrf
  FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id
)
SELECT CAST(rank AS INT) AS rank, doc_id, round(rrf, 9) AS rrf,
       CAST(r_lex AS INT) AS r_lex, CAST(r_sem AS INT) AS r_sem
FROM (
  SELECT doc_id, r_lex, r_sem, rrf,
         ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rank
  FROM fused
) WHERE rank <= {k}
"""


EXTRA_QUERIES["hybrid_rrf_search"] = q_hybrid_rrf_search
EXTRA_ORACLES["hybrid_rrf_search"] = _hybrid_rrf_sql()


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot versioning through the gate
    (analytics/snapshot.py): documents vs a deterministically-evolved
    copy — doc_id % 7 == 0 dropped (removals), % 5 == 0 gets an
    appended token (changes), and % 11 == 0 re-lands under a shifted id
    (additions). The oracle restates the evolution and the full-outer
    hash diff in SQL; counts are integer-exact."""
    from audit_star_spark.analytics.snapshot import snapshot_diff

    old = load_table(spark, sf_dir, "documents")
    survivors = old.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.coalesce(F.col("text"), F.lit("")), F.lit(" v2")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "source",
    )
    added = old.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "source"
    )
    new = survivors.unionByName(added)
    return snapshot_diff(old, new)


SQL_SNAPSHOT_DIFF = """
WITH old AS (
  SELECT doc_id, source,
         md5(regexp_replace(trim(lower(COALESCE(text, ''))), '\\s+', ' ', 'g')) AS h
  FROM documents
),
new AS (
  SELECT doc_id,
         md5(regexp_replace(trim(lower(
           CASE WHEN doc_id % 5 = 0 THEN COALESCE(text, '') || ' v2'
                ELSE COALESCE(text, '') END
         )), '\\s+', ' ', 'g')) AS h,
         source
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         md5(regexp_replace(trim(lower(COALESCE(text, ''))), '\\s+', ' ', 'g')) AS h,
         source
  FROM documents WHERE doc_id % 11 = 0
),
j AS (
  SELECT COALESCE(n.source, o.source) AS source,
         CASE WHEN o.h IS NULL THEN 'added'
              WHEN n.h IS NULL THEN 'removed'
              WHEN o.h <> n.h THEN 'changed'
              ELSE 'unchanged' END AS state,
         o.h IS NOT NULL AS in_old,
         n.h IS NOT NULL AS in_new
  FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
)
SELECT source,
  CAST(SUM(CASE WHEN state = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
  CAST(SUM(CASE WHEN state = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
  CAST(SUM(CASE WHEN state = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
  CAST(SUM(CASE WHEN state = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_unchanged,
  CAST(SUM(CASE WHEN in_old THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
  CAST(SUM(CASE WHEN in_new THEN 1 ELSE 0 END) AS BIGINT) AS n_new
FROM j GROUP BY source
"""


EXTRA_QUERIES["snapshot_diff"] = q_snapshot_diff
EXTRA_ORACLES["snapshot_diff"] = SQL_SNAPSHOT_DIFF


def q_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN through the gate (ivf_index.py probe_pq_rerank):
    compressed ADC shortlist (floats never read), then exact-cosine
    re-rank of ONLY the top-20 candidates per query — the FAISS refine
    pattern, which is what a 100 TB serving path actually runs. The
    oracle replays both stages (shared _ivfpq_adc_ctes pipeline + the
    cosine re-score)."""
    import os
    import tempfile

    from audit_star_spark.analytics.ivf_index import (
        add_pq_codes,
        build_ivf_index,
        probe_pq_rerank,
    )
    from audit_star_spark.analytics.similarity import VEC_EXPR

    emb = load_table(spark, sf_dir, "embeddings")
    d = tempfile.mkdtemp(prefix="ivfpq_rr_gate_")
    idx = build_ivf_index(emb, os.path.join(d, "idx"), n_cells=16, iters=1)
    add_pq_codes(idx, emb, m_sub=4, k_codes=16)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.expr(VEC_EXPR).alias("qvec"),
    )
    return probe_pq_rerank(idx, queries, k=5, rerank=20, n_probe=4)


def _ivfpq_rerank_sql(
    n_cells: int = 16,
    m_sub: int = 4,
    k_codes: int = 16,
    n_queries: int = 8,
    k_nn: int = 5,
    rerank: int = 20,
    n_probe: int = 4,
    dim: int = 64,
) -> str:
    ctes = _ivfpq_adc_ctes(n_cells, m_sub, k_codes, n_queries, n_probe, dim)
    return f"""
{ctes},
shortlist AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY adc, vec_id) AS rk
    FROM adc
  ) WHERE rk <= {rerank}
),
rescored AS (
  SELECT s.query_id, s.vec_id,
         {d_dot('q.qvec', 'n.vec')} / (q.qnorm * n.norm) AS cosine
  FROM shortlist s
  JOIN normed2 n ON n.vec_id = s.vec_id
  JOIN queries q ON q.query_id = s.query_id
)
SELECT query_id, CAST(rank AS INT) AS rank, vec_id, round(cosine, 9) AS cosine
FROM (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM rescored
) WHERE rank <= {k_nn}
"""


EXTRA_QUERIES["ivfpq_rerank"] = q_ivfpq_rerank
EXTRA_ORACLES["ivfpq_rerank"] = _ivfpq_rerank_sql()


def _synth_mp3_l1(spark_df):
    """doc_id-keyed MPEG-1 Layer I synthesis: 1 + d%2 identical 448 kbps
    frames; 8 active subbands (sb % 4 == d % 4), allocation
    1 + (sb + 3d) % 14 (levels 3..32767), sf (5sb + 7d) % 63, codes
    (d + 11gr + 29sb) % n — closed forms in (doc_id, sb, gr)."""
    from pyspark.sql import types as T

    from audit_star_spark.util import spread

    def synth(batches):
        import pandas as pd

        from audit_star_spark.analytics.mp3 import encode_mp3_layer1

        def frame(d):
            fr = {"alloc": {}, "sf": {}, "codes": {}}
            for sb in range(32):
                if sb % 4 != d % 4:
                    continue
                a = 1 + ((sb + 3 * d) % 14)
                n = (1 << (a + 1)) - 1
                fr["alloc"][sb] = a
                fr["sf"][sb] = (5 * sb + 7 * d) % 63
                fr["codes"][sb] = [
                    (d + 11 * gr + 29 * sb) % n for gr in range(12)
                ]
            return fr

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                payloads.append(
                    encode_mp3_layer1([frame(d)] * (1 + d % 2), kbps=448)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return spread(spark_df.select("doc_id")).mapInPandas(
        synth,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def q_mp3_l1_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MPEG-1 Layer I decode through the gate (analytics/mp3.py
    decode_mp3_layer1 — the same bitstream-roundtrip design as the
    Layer II gate, over the simpler 384-sample frame layout with
    per-subband 4-bit allocations and no grouping)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    media = _synth_mp3_l1(docs)

    def run(batches):
        import pandas as pd

        from audit_star_spark.analytics.mp3 import decode_mp3_layer1

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    info = decode_mp3_layer1(bytes(payload))
                    rows.append(
                        (
                            int(doc_id), info["n_frames"],
                            info["sample_rate"], info["n_active_subbands"],
                            info["n_samples"], info["subband_rms"],
                        )
                    )
                except Exception:  # noqa: BLE001 — poison degrade
                    rows.append((int(doc_id), None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "sample_rate",
                    "n_active_subbands", "n_samples", "subband_rms",
                ],
            ).astype(
                {
                    "doc_id": "int64", "n_frames": "Int32",
                    "sample_rate": "Int32", "n_active_subbands": "Int64",
                    "n_samples": "Int64", "subband_rms": "float64",
                }
            )

    r = media.mapInPandas(run, schema=multimodal.MP3_L2_SCHEMA)
    return r.select(
        "doc_id", "n_frames", "sample_rate", "n_active_subbands",
        "n_samples", F.round("subband_rms", 6).alias("subband_rms"),
    )


SQL_MP3_L1_CENSUS = """
WITH sbs AS (
  SELECT doc_id, sb,
         1 + ((sb + 3 * doc_id) % 14) AS a
  FROM documents CROSS JOIN (SELECT unnest(range(32)) AS sb)
  WHERE sb % 4 = doc_id % 4
),
samp AS (
  SELECT doc_id, sb, a + 1 AS nb,
         CAST((1 << (a + 1)) - 1 AS BIGINT) AS n,
         (5 * sb + 7 * doc_id) % 63 AS sfidx,
         g.gr
  FROM sbs CROSS JOIN (SELECT unnest(range(12)) AS gr) g
),
vals AS (
  SELECT doc_id,
    power(2.0, 1.0 - sfidx / 3.0)
      * (power(2.0, nb) / n)
      * (((doc_id + 11 * gr + 29 * sb) % n)
           * power(2.0, CAST(1 - nb AS DOUBLE)) - 1.0
         + (1.0 - (n - 1) * power(2.0, CAST(-nb AS DOUBLE)))) AS sp
  FROM samp
)
SELECT doc_id,
  CAST(1 + doc_id % 2 AS INT) AS n_frames,
  CAST(44100 AS INT) AS sample_rate,
  CAST(8 * (1 + doc_id % 2) AS BIGINT) AS n_active_subbands,
  CAST(COUNT(*) * (1 + doc_id % 2) AS BIGINT) AS n_samples,
  round(sqrt(AVG(sp * sp)), 6) AS subband_rms
FROM vals GROUP BY doc_id
"""


EXTRA_QUERIES["mp3_l1_census"] = q_mp3_l1_census
EXTRA_ORACLES["mp3_l1_census"] = SQL_MP3_L1_CENSUS


def _synth_policy_robots(spark: SparkSession) -> DataFrame:
    """The 16-domain robots.txt dimension shared by the robots gate and
    the composed crawl-policy report: comments, an ignored specific-
    agent group on odd domains, crawl-delay junk — every rule a closed
    form in the domain id so the oracle can restate it."""
    return (
        spark.range(16)
        .select(F.col("id").cast("int").alias("d"))
        .select(
            F.concat(F.lit("d"), F.col("d"), F.lit(".test")).alias("domain"),
            F.concat(
                F.when(
                    F.col("d") % 2 == 1,
                    F.lit("User-agent: auditbot\nDisallow: /\n\n"),
                ).otherwise(F.lit("")),
                F.lit("# synthetic\nUser-agent: *\n"),
                F.lit("Disallow: /private"), F.col("d"), F.lit("/*\n"),
                F.lit("Allow: /private"), F.col("d"), F.lit("/open\n"),
                F.lit("Disallow: /exact"), F.col("d"), F.lit("$\n"),
                F.lit("Crawl-delay: 3\n"),
            ).alias("robots_txt"),
        )
    )


def q_robots_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL robots.txt evaluation through the gate (analytics/robots.py
    — RFC 9309 group selection, wildcard/anchor matching, longest-rule
    precedence): 16 synthesized per-domain robots files (comments,
    an ignored specific-agent group on odd domains, crawl-delay junk)
    are PARSED by the operator, while the oracle constructs the same
    rules directly from the generating formulas — a parser differential:
    any mis-tokenized line or mis-translated pattern flips verdicts."""
    from audit_star_spark.analytics.robots import robots_verdicts

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id") % 16
    robots = _synth_policy_robots(spark)
    urls = docs.select(
        F.col("doc_id").alias("url_id"),
        F.concat(F.lit("d"), d, F.lit(".test")).alias("domain"),
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.lit("/private"), d, F.lit("/page")))
        .when(F.col("doc_id") % 5 == 1, F.concat(F.lit("/private"), d, F.lit("/open")))
        .when(F.col("doc_id") % 5 == 2, F.concat(F.lit("/exact"), d))
        .when(F.col("doc_id") % 5 == 3, F.concat(F.lit("/exact"), d, F.lit("more")))
        .otherwise(F.lit("/other"))
        .alias("path"),
    )
    return robots_verdicts(urls, robots).select(
        "url_id", "domain", "path", "allowed", "rule_pattern"
    )


SQL_ROBOTS_VERDICTS = """
WITH doms AS (SELECT unnest(range(16)) AS d),
rules AS (
  SELECT 'd' || d || '.test' AS domain,
         FALSE AS allow, '/private' || d || '/*' AS pattern,
         strlen('/private' || d || '/*') AS plen,
         '^/private' || d || '/.*' AS rx
  FROM doms
  UNION ALL
  SELECT 'd' || d || '.test', TRUE, '/private' || d || '/open',
         strlen('/private' || d || '/open'),
         '^/private' || d || '/open'
  FROM doms
  UNION ALL
  SELECT 'd' || d || '.test', FALSE, '/exact' || d || '$',
         strlen('/exact' || d || '$'),
         '^/exact' || d || '$'
  FROM doms
),
urls AS (
  SELECT doc_id AS url_id,
         'd' || (doc_id % 16) || '.test' AS domain,
         CASE doc_id % 5
           WHEN 0 THEN '/private' || (doc_id % 16) || '/page'
           WHEN 1 THEN '/private' || (doc_id % 16) || '/open'
           WHEN 2 THEN '/exact' || (doc_id % 16)
           WHEN 3 THEN '/exact' || (doc_id % 16) || 'more'
           ELSE '/other' END AS path
  FROM documents
),
matched AS (
  SELECT u.url_id, u.domain, u.path, r.allow, r.pattern,
         COALESCE(r.plen, -1) AS plen
  FROM urls u LEFT JOIN rules r
    ON r.domain = u.domain AND regexp_matches(u.path, r.rx)
),
best AS (
  SELECT url_id, domain, path, allow, pattern FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY url_id
      ORDER BY plen DESC, allow DESC, pattern) AS rn
    FROM matched
  ) WHERE rn = 1
)
SELECT url_id, domain, path,
       COALESCE(allow, TRUE) AS allowed,
       pattern AS rule_pattern
FROM best
"""


EXTRA_QUERIES["robots_verdicts"] = q_robots_verdicts
EXTRA_ORACLES["robots_verdicts"] = SQL_ROBOTS_VERDICTS


def _synth_policy_crawl(spark_df):
    """doc_id-keyed WARC synthesis for the policy report: one archive
    per doc holding a single response record whose WARC-Target-URI is
    http://d{d%16}.test{path}, path per the robots-gate formulas; odd
    doc_ids member-gzip the archive. The URI travels through the REAL
    WARC writer and parser — a mangled byte anywhere flips verdicts."""
    from pyspark.sql import types as T

    from audit_star_spark.util import spread

    def synth(batches):
        import pandas as pd

        from audit_star_spark.sources.warc import encode_warc

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                dd = did % 16
                path = {
                    0: f"/private{dd}/page",
                    1: f"/private{dd}/open",
                    2: f"/exact{dd}",
                    3: f"/exact{dd}more",
                    4: "/other",
                }[did % 5]
                rec = {
                    "warc_type": "response",
                    "target_uri": f"http://d{dd}.test{path}",
                    "content_type": "application/http; msgtype=response",
                    "payload": b"HTTP/1.1 200 OK\r\n\r\n",
                }
                payloads.append(encode_warc([rec], gzip_members=did % 2 == 1))
            yield pd.DataFrame(
                {
                    "archive_id": pdf["doc_id"].astype("int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return spread(spark_df.select("doc_id")).mapInPandas(
        synth,
        schema=T.StructType(
            [
                T.StructField("archive_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def q_crawl_policy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl COMPLIANCE as one DAG through the gate: WARC archives ->
    record parse (real reader) -> target-URI split -> RFC 9309 robots
    verdicts (real parser over synthesized robots.txt) -> per-domain
    allowed/blocked census. This is the sweep a pipeline runs to prove
    which fetched URLs its policy permitted; the oracle restates URIs
    and rules from the shared formulas, so any WARC or robots parsing
    slip flips integer counts."""
    from audit_star_spark.analytics.robots import robots_verdicts
    from audit_star_spark.sources.warc import warc_records

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    recs = warc_records(_synth_policy_crawl(docs)).filter(
        F.col("warc_type") == "response"
    )
    urls = recs.select(
        F.col("archive_id").alias("url_id"),
        F.regexp_extract("target_uri", r"^http://([^/]+)", 1).alias("domain"),
        F.regexp_extract("target_uri", r"^http://[^/]+(/.*)$", 1).alias("path"),
    )
    v = robots_verdicts(urls, _synth_policy_robots(spark))
    return v.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.sum(F.col("allowed").cast("int")).cast("long").alias("n_allowed"),
        F.sum((~F.col("allowed")).cast("int")).cast("long").alias("n_blocked"),
        F.sum(F.col("rule_pattern").isNull().cast("int"))
        .cast("long")
        .alias("n_default"),
    )


SQL_CRAWL_POLICY_REPORT = """
WITH doms AS (SELECT unnest(range(16)) AS d),
rules AS (
  SELECT 'd' || d || '.test' AS domain,
         FALSE AS allow, strlen('/private' || d || '/*') AS plen,
         '^/private' || d || '/.*' AS rx
  FROM doms
  UNION ALL
  SELECT 'd' || d || '.test', TRUE, strlen('/private' || d || '/open'),
         '^/private' || d || '/open'
  FROM doms
  UNION ALL
  SELECT 'd' || d || '.test', FALSE, strlen('/exact' || d || '$'),
         '^/exact' || d || '$'
  FROM doms
),
urls AS (
  SELECT doc_id AS url_id,
         'd' || (doc_id % 16) || '.test' AS domain,
         CASE doc_id % 5
           WHEN 0 THEN '/private' || (doc_id % 16) || '/page'
           WHEN 1 THEN '/private' || (doc_id % 16) || '/open'
           WHEN 2 THEN '/exact' || (doc_id % 16)
           WHEN 3 THEN '/exact' || (doc_id % 16) || 'more'
           ELSE '/other' END AS path
  FROM documents
),
matched AS (
  SELECT u.url_id, u.domain, r.allow, r.rx,
         COALESCE(r.plen, -1) AS plen
  FROM urls u LEFT JOIN rules r
    ON r.domain = u.domain AND regexp_matches(u.path, r.rx)
),
best AS (
  SELECT url_id, domain, allow, rx FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY url_id ORDER BY plen DESC, allow DESC, rx) AS rn
    FROM matched
  ) WHERE rn = 1
)
SELECT domain,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(SUM(CASE WHEN COALESCE(allow, TRUE) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_allowed,
       CAST(SUM(CASE WHEN COALESCE(allow, TRUE) THEN 0 ELSE 1 END) AS BIGINT)
         AS n_blocked,
       CAST(SUM(CASE WHEN rx IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_default
FROM best GROUP BY domain
"""


EXTRA_QUERIES["crawl_policy_report"] = q_crawl_policy_report
EXTRA_ORACLES["crawl_policy_report"] = SQL_CRAWL_POLICY_REPORT


def q_decontaminate_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-span scrubbing through the gate
    (analytics/dedup.py decontaminate_rewrite): every corpus occurrence
    of an 8-token window appearing in the probe set (doc_id % 97 == 0 —
    the contamination gate's eval-set stand-in) is removed and the text
    rewritten; probe docs themselves scrub to empty (don't train on the
    benchmark). clean_md5 locks the rewritten bytes; the oracle restates
    windows, membership and the span/rewrite pipeline in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    probes = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("probe_id"), "text"
    )
    return dedup.decontaminate_rewrite(docs, probes, k=8)


def _decontaminate_sql(k: int = 8) -> str:
    h = (
        f"('0x' || substr(md5(array_to_string("
        f"list_slice(toks, pos + 1, pos + {k}), ' ')), 1, 15))::BIGINT"
    )
    return f"""
WITH base AS (
  SELECT doc_id, {D_TOKENS} AS toks FROM documents
),
wins AS (
  SELECT doc_id, unnest(generate_series(0, len(toks) - {k})) AS pos, toks
  FROM base WHERE len(toks) >= {k}
),
hashed AS (
  SELECT doc_id, pos, {h} AS h FROM wins
),
probe_h AS (
  SELECT DISTINCT h FROM hashed WHERE doc_id % 97 = 0
),
removed AS (
  SELECT w.doc_id, w.pos FROM hashed w JOIN probe_h USING (h)
),
marked AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                OR pos > lag(pos) OVER w + {k} THEN 1 ELSE 0 END AS new_span
  FROM removed
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sp AS (
  SELECT doc_id, pos,
         SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
  FROM marked
),
spans AS (
  SELECT doc_id, span_id, MIN(pos) AS s, MAX(pos) + {k} AS e
  FROM sp GROUP BY 1, 2
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
         CAST(SUM(e - s) AS BIGINT) AS n_removed_tokens,
         list(struct_pack(s := s, e := e)) AS spans
  FROM spans GROUP BY 1
)
SELECT b.doc_id,
       CAST(len(b.toks) AS BIGINT) AS n_tokens,
       COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
       COALESCE(p.n_removed_tokens, 0) AS n_removed_tokens,
       round(COALESCE(p.n_removed_tokens, 0) / CAST(len(b.toks) AS DOUBLE), 6)
         AS removed_fraction,
       md5(COALESCE(array_to_string(
         CASE WHEN p.spans IS NULL THEN b.toks
              ELSE list_filter(b.toks, (t, i) -> len(list_filter(p.spans,
                     sp -> i - 1 >= sp.s AND i - 1 < sp.e)) = 0) END,
         ' '), '')) AS clean_md5
FROM base b LEFT JOIN per_doc p USING (doc_id)
"""


EXTRA_QUERIES["decontaminate_rewrite"] = q_decontaminate_rewrite
EXTRA_ORACLES["decontaminate_rewrite"] = _decontaminate_sql()


def q_length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching layout through the gate
    (analytics/text.py length_bucketed_batches): the padding-waste
    report a static-shape trainer's loader optimizes. Exact integer
    lengths, deterministic (length, doc_id) order — counts and
    fractions hash-match the oracle."""
    return text.length_bucketed_batches(
        load_table(spark, sf_dir, "documents"), batch_size=8
    )


SQL_LENGTH_BUCKETED_BATCHES = f"""
WITH lens AS (
  SELECT doc_id, CAST(len({D_TOKENS}) AS BIGINT) AS n_tokens FROM documents
),
batched AS (
  SELECT doc_id, n_tokens,
         CAST((ROW_NUMBER() OVER (ORDER BY n_tokens, doc_id) - 1) // 8
              AS BIGINT) AS batch_id
  FROM lens
),
agg AS (
  SELECT batch_id,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         MAX(n_tokens) AS batch_max_tokens,
         CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens
  FROM batched GROUP BY batch_id
)
SELECT batch_id, n_docs, batch_max_tokens, batch_tokens,
       n_docs * batch_max_tokens - batch_tokens AS padded_tokens,
       round(1.0 - batch_tokens /
             CAST(n_docs * batch_max_tokens AS DOUBLE), 9) AS padding_frac
FROM agg
"""


EXTRA_QUERIES["length_bucketed_batches"] = q_length_bucketed_batches
EXTRA_ORACLES["length_bucketed_batches"] = SQL_LENGTH_BUCKETED_BATCHES


def q_alpha_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature/alpha-sampling through the gate (analytics/text.py
    alpha_mix_report, alpha = 0.5): p_s ∝ share_s^0.5 rebalancing with
    the deterministic downsample-only hash filter — the multilingual
    low-resource boost. Rates, shares and kept counts hash-match the
    oracle (same pow/normalize chain, same md5-bucket filter)."""
    return text.alpha_mix_report(
        load_table(spark, sf_dir, "documents"), alpha=0.5
    )


SQL_ALPHA_MIX_REPORT = """
WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source
),
shares AS (
  SELECT source, n,
         CAST(n AS DOUBLE) / SUM(n) OVER () AS share
  FROM counts
),
wts AS (
  SELECT source, n, share, power(share, 0.5) AS w FROM shares
),
raw AS (
  SELECT source, n, share,
         (w / SUM(w) OVER ()) / share AS raw_rate
  FROM wts
),
rates AS (
  SELECT source, n, share,
         raw_rate / MAX(raw_rate) OVER () AS rate
  FROM raw
),
kept AS (
  SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM documents d JOIN rates r ON r.source = d.source
  WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
          % 1000000
        < CAST(round(r.rate * 1000000) AS BIGINT)
  GROUP BY d.source
)
SELECT r.source, r.n AS n_docs,
       round(r.share, 9) AS share,
       round(r.rate, 9) AS rate,
       COALESCE(k.n_kept, 0) AS n_kept
FROM rates r LEFT JOIN kept k ON k.source = r.source
"""


EXTRA_QUERIES["alpha_mix_report"] = q_alpha_mix_report
EXTRA_ORACLES["alpha_mix_report"] = SQL_ALPHA_MIX_REPORT


def q_doc_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank through the gate (analytics/graph.py) over
    the doc_pagerank link graph with seeds {1, 2, 3}: rank = transitive
    proximity to the seed docs (the crawl-frontier prioritizer). The
    oracle unrolls the identical seeded iteration."""
    from audit_star_spark.analytics.graph import personalized_pagerank

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    nd = docs.agg(F.count("*").alias("n"))
    linkers = docs.filter(F.col("doc_id") % 17 != 0).crossJoin(F.broadcast(nd))
    edges = linkers.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 1) % F.col("n")).alias("dst"),
    ).unionByName(
        linkers.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 13 + 3) % F.col("n")).alias("dst"),
        )
    )
    r = personalized_pagerank(edges, seeds=[1, 2, 3], n_iter=PAGERANK_ITERS)
    return r.select(
        F.col("node").alias("doc_id"), F.round("rank", 9).alias("rank")
    )


def _ppr_sql() -> str:
    from audit_star_spark.analytics.graph import ppr_sql_iterations

    edges_cte = """nn0 AS (SELECT count(*) AS n FROM documents),
linkers AS (SELECT doc_id FROM documents WHERE doc_id % 17 <> 0),
edges AS (
  SELECT doc_id AS src, (doc_id * 7 + 1) % nn0.n AS dst FROM linkers CROSS JOIN nn0
  UNION ALL
  SELECT doc_id AS src, (doc_id * 13 + 3) % nn0.n AS dst FROM linkers CROSS JOIN nn0
)"""
    inner = ppr_sql_iterations(edges_cte, seeds=[1, 2, 3], n_iter=PAGERANK_ITERS)
    return f"""
SELECT node AS doc_id, round(rank, 9) AS rank FROM ({inner})
"""


EXTRA_QUERIES["doc_ppr"] = q_doc_ppr
EXTRA_ORACLES["doc_ppr"] = _ppr_sql()


# ----------------------------------------------------- round-10 rotation
# The 13 round-9 queries (gate-sim + pytest-oracle-locked but never
# driver-certified) move into the 50-slot window to earn hard
# CORRECTNESS_r10 rows; 13 double-green entries (driver-green in both
# r8 and r9) retire to EXTRA, where tests/test_oracle_parity.py keeps
# them oracle-locked on every pytest run. Window stays 8 audit + 42
# analytics.
_R10_ROTATE_IN = [
    "ivfpq_rerank",
    "substring_dedup_rewrite",
    "decontaminate_rewrite",
    "doc_ppr",
    "crawl_policy_report",
    "robots_verdicts",
    "mp3_l1_census",
    "mp3_l2_census",
    "hybrid_rrf_search",
    "snapshot_diff",
    "audio_resampled_rational",
    "alpha_mix_report",
    "length_bucketed_batches",
]
_R10_ROTATE_OUT = [
    "bm25_search",
    "capped_user_sessions",
    "corpus_clean_stats",
    "cross_corpus_near_dups",
    "dedup_clusters",
    "doc_perplexity",
    "embedding_near_pairs",
    "knn_ivf",
    "orders_profile_approx",
    "purchase_value_attribution",
    "quantized_knn_recall",
    "resample_to_mix",
    "simhash_near_pairs",
]
for _name in _R10_ROTATE_OUT:
    EXTRA_QUERIES[_name] = ANALYTICS_QUERIES.pop(_name)
    EXTRA_ORACLES[_name] = ANALYTICS_ORACLES.pop(_name)
for _name in _R10_ROTATE_IN:
    ANALYTICS_QUERIES[_name] = EXTRA_QUERIES.pop(_name)
    ANALYTICS_ORACLES[_name] = EXTRA_ORACLES.pop(_name)

if len(ANALYTICS_QUERIES) != 42:  # driver gate window: 8 audit + 42 analytics
    raise RuntimeError(
        "ANALYTICS_QUERIES must stay exactly 42 entries so the driver's "
        f"50-slot correctness window is stable; got {len(ANALYTICS_QUERIES)}"
    )
del _name


# ------------------------------------------------ round-10 additions (EXTRA)
def q_opq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimized Product Quantization through the gate (analytics/pq.py
    opq_* — Ge et al. 2013 restricted to closed-form cross-subspace
    Givens rotations so the learned rotation is BIT-REPLAYABLE: the 2x2
    Procrustes solution uses only +,-,*,/ and sqrt, all IEEE-754
    correctly rounded in both engines, where the paper's SVD is not).
    One monotone alternation — PQ train, reconstruct, rotate, re-encode
    against the same codebook, one Lloyd re-mean — then ADC top-5 of
    rotated queries against rotated codes, scored against the exact L2
    top-5 on the ORIGINAL vectors (orthogonal rotation preserves L2).
    The oracle replays codebook training, the reconstruction, the pair
    statistics, the rotation coefficients, the rotated encode and both
    rankings with identical folds and tie-breaks."""
    from audit_star_spark.analytics.pq import opq_recall

    return opq_recall(
        load_table(spark, sf_dir, "embeddings"),
        m_sub=4,
        k=16,
        n_queries=8,
        k_nn=5,
    )


def _opq_recall_sql(
    m_sub: int = 4, k: int = 16, n_queries: int = 8, k_nn: int = 5, dim: int = 64
) -> str:
    w = dim // m_sub
    h = dim // 2
    d2 = _d2
    sfold = lambda col: d_fold(  # noqa: E731
        f"list_sort(list({col}))", "CAST(0.0 AS DOUBLE)", "(s, v) -> s + v"
    )
    return f"""
WITH base AS (
  SELECT vec_id, {D_VEC} AS vec FROM embeddings
),
{_pq_codebook_ctes(m_sub, k, dim)},
yrec AS (
  SELECT e.vec_id, e.sub_id, b.svec, c.centroid
  FROM enc e
  JOIN sub b ON e.vec_id = b.vec_id AND e.sub_id = b.sub_id
  JOIN codebook c ON e.sub_id = c.sub_id AND e.cell_id = c.cell_id
),
ydims AS (
  SELECT vec_id, sub_id * {w} + i - 1 AS gpos, svec[i] AS x, centroid[i] AS y
  FROM (SELECT vec_id, sub_id, svec, centroid,
               unnest(generate_series(1, len(svec))) AS i
        FROM yrec)
),
pv AS (
  SELECT l.vec_id, l.gpos AS p,
         l.x * l.y + r.x * r.y AS t,
         l.x * r.y - r.x * l.y AS v
  FROM ydims l JOIN ydims r
    ON l.vec_id = r.vec_id AND r.gpos = l.gpos + {h}
  WHERE l.gpos < {h}
),
rot AS (
  SELECT p,
         CASE WHEN r = 0 THEN 1.0 ELSE tt / r END AS c,
         CASE WHEN r = 0 THEN 0.0 ELSE ww / r END AS s
  FROM (SELECT p, tt, ww, sqrt(tt * tt + ww * ww) AS r
        FROM (SELECT p, {sfold('t')} AS tt, {sfold('v')} AS ww
              FROM pv GROUP BY p))
),
rotl AS (
  SELECT list_transform(list_sort(list(struct_pack(p := p, c := c))),
                        x -> x.c) AS cl,
         list_transform(list_sort(list(struct_pack(p := p, s := s))),
                        x -> x.s) AS sl
  FROM rot
),
rbase AS (
  SELECT vec_id,
         list_transform(generate_series(1, {dim}), i ->
           CASE WHEN i <= {h}
                THEN cl[i] * vec[i] - sl[i] * vec[i + {h}]
                ELSE sl[i - {h}] * vec[i - {h}] + cl[i - {h}] * vec[i]
           END) AS rvec
  FROM base CROSS JOIN rotl
),
rsub AS (
  SELECT vec_id, s.sub_id,
         list_slice(rvec, s.sub_id * {w} + 1, s.sub_id * {w} + {w}) AS svec
  FROM rbase CROSS JOIN (SELECT UNNEST(range({m_sub})) AS sub_id) s
),
rassigned AS (
  SELECT vec_id, sub_id, svec, cell_id FROM (
    SELECT b.vec_id, b.sub_id, b.svec, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY b.vec_id, b.sub_id
                              ORDER BY {d2('b.svec', 'c.centroid')},
                                       c.cell_id) AS rn
    FROM rsub b JOIN codebook c USING (sub_id)
  ) WHERE rn = 1
),
rdims AS (
  SELECT sub_id, cell_id, i - 1 AS pos, svec[i] AS x FROM (
    SELECT sub_id, cell_id, svec,
           unnest(generate_series(1, len(svec))) AS i
    FROM rassigned
  )
),
rsums AS (
  SELECT sub_id, cell_id, pos, {sfold('x')} AS s, COUNT(*) AS n
  FROM rdims GROUP BY 1, 2, 3
),
cb1 AS (
  SELECT sub_id, cell_id,
         list_transform(list_sort(list(struct_pack(pos := pos, m := m))),
                        x -> x.m) AS centroid
  FROM (SELECT sub_id, cell_id, pos, s / n AS m FROM rsums)
  GROUP BY 1, 2
),
enc1 AS (
  SELECT vec_id, sub_id, cell_id FROM (
    SELECT b.vec_id, b.sub_id, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY b.vec_id, b.sub_id
                              ORDER BY {d2('b.svec', 'c.centroid')},
                                       c.cell_id) AS rn
    FROM rsub b JOIN cb1 c USING (sub_id)
  ) WHERE rn = 1
),
queries AS (
  SELECT vec_id AS query_id, vec AS qvec FROM base WHERE vec_id < {n_queries}
),
rq AS (
  SELECT query_id,
         list_transform(generate_series(1, {dim}), i ->
           CASE WHEN i <= {h}
                THEN cl[i] * qvec[i] - sl[i] * qvec[i + {h}]
                ELSE sl[i - {h}] * qvec[i - {h}] + cl[i - {h}] * qvec[i]
           END) AS rqvec
  FROM queries CROSS JOIN rotl
),
qsub AS (
  SELECT query_id, s.sub_id,
         list_slice(rqvec, s.sub_id * {w} + 1, s.sub_id * {w} + {w}) AS qsvec
  FROM rq CROSS JOIN (SELECT UNNEST(range({m_sub})) AS sub_id) s
),
tbl AS (
  SELECT q.query_id, q.sub_id, c.cell_id,
         {d2('q.qsvec', 'c.centroid')} AS pd
  FROM qsub q JOIN cb1 c USING (sub_id)
),
adc AS (
  SELECT t.query_id, e.vec_id, {sfold('pd')} AS adc
  FROM enc1 e JOIN tbl t ON e.sub_id = t.sub_id AND e.cell_id = t.cell_id
  GROUP BY 1, 2
),
atop AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY adc, vec_id) AS rk
    FROM adc
  ) WHERE rk <= {k_nn}
),
ex AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, b.vec_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY {d2('b.vec', 'q.qvec')},
                                       b.vec_id) AS rk
    FROM base b CROSS JOIN queries q
  ) WHERE rk <= {k_nn}
),
hits AS (
  SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM atop a JOIN ex USING (query_id, vec_id) GROUP BY 1
)
SELECT q.query_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(COALESCE(h.n_hits, 0) / CAST({float(k_nn)!r} AS DOUBLE), 6)
         AS recall
FROM queries q LEFT JOIN hits h USING (query_id)
"""


EXTRA_QUERIES["opq_recall"] = q_opq_recall
EXTRA_ORACLES["opq_recall"] = _opq_recall_sql()


def q_doc_perplexity_kn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained interpolated Kneser-Ney TRIGRAM perplexity per
    document (analytics/lm.py doc_perplexity_kn — the CCNet-grade
    quality filter: absolute discounting + continuation counts, uniform
    1/V backstop). The oracle restates the trigram type tables, the
    continuation statistics and the three-level interpolation; rounded
    to 6 decimals for a stable cross-engine hash (ln/exp last-ulp)."""
    from audit_star_spark.analytics.lm import doc_perplexity_kn

    p = doc_perplexity_kn(load_table(spark, sf_dir, "documents"))
    return p.select(
        "doc_id",
        "n_trigrams",
        F.round("avg_nll", 6).alias("avg_nll"),
        F.round("perplexity", 6).alias("perplexity"),
    )


def _kn_perplexity_oracle() -> str:
    from audit_star_spark.analytics.lm import kn_perplexity_sql

    inner = kn_perplexity_sql("documents", "text")
    return f"""
SELECT doc_id, n_trigrams, round(avg_nll, 6) AS avg_nll,
       round(perplexity, 6) AS perplexity
FROM ({inner})
"""


EXTRA_QUERIES["doc_perplexity_kn"] = q_doc_perplexity_kn
EXTRA_ORACLES["doc_perplexity_kn"] = _kn_perplexity_oracle()


def _synth_mp3_l3(spark_df):
    """doc_id-keyed MPEG-1 Layer III side-info synthesis (mapInPandas,
    via the bit-level encoder in analytics/mp3.py): 1 + d%3 frames of
    64 kbps 44.1 kHz mono, two granules each, every side-info field a
    closed form in (doc_id, frame, granule) — window-switching granules
    every third (d+g+f), short blocks when (d+g)%3 == 1, doc-keyed
    scfsi/bit-reservoir pointers — so the oracle can replay the whole
    census (including the §2.4.2.7 scalefactor bit budgets) in SQL."""
    from pyspark.sql import types as T

    from audit_star_spark.util import spread

    def synth(batches):
        import pandas as pd

        from audit_star_spark.analytics.mp3 import encode_mp3_layer3_sideinfo

        def granule(d, f, g):
            ws = 1 if (d + g + f) % 3 == 0 else 0
            gd = {
                "part2_3_length": (d + 100 * f + 37 * g) % 4096,
                "big_values": (3 * d + 17 * g + 5 * f) % 289,
                "global_gain": (d + 29 * g + 3 * f) % 256,
                "scalefac_compress": (d + g + f) % 16,
                "window_switching": ws,
                "preflag": (d + g) % 2,
                "scalefac_scale": d % 2,
                "count1table_select": (d + f) % 2,
            }
            if ws:
                gd["block_type"] = 1 + ((d + g) % 3)
                gd["mixed_block"] = (d + f) % 2
                gd["table_select"] = [(5 * d + i) % 32 for i in range(2)]
                gd["subblock_gain"] = [(d + g + i) % 8 for i in range(3)]
            else:
                gd["block_type"] = 0
                gd["mixed_block"] = 0
                gd["table_select"] = [(5 * d + i) % 32 for i in range(3)]
                gd["region0_count"] = d % 16
                gd["region1_count"] = (d + g) % 8
            return gd

        def frame(d, f):
            return {
                "main_data_begin": (7 * d + 13 * f) % 512,
                "scfsi": [d % 16],
                "granules": [[granule(d, f, g)] for g in range(2)],
            }

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                payloads.append(
                    encode_mp3_layer3_sideinfo(
                        [frame(d, f) for f in range(1 + d % 3)], kbps=64
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return spread(spark_df.select("doc_id")).mapInPandas(
        synth,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def q_mp3_l3_sideinfo_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MPEG-1 Layer III side-information decode through the gate
    (analytics/mp3.py decode_mp3_layer3_sideinfo): the synthesized
    streams round-trip the actual bitstream — §2.4.1.7 grammar packed
    by encode_mp3_layer3_sideinfo, read back bit-exactly including the
    window-switching tree, the bit-reservoir pointer, and the §2.4.2.7
    scalefactor bit budgets with scfsi granule-1 reuse. A single
    misplaced bit desyncs every later field of the frame, so the summed
    census columns are a whole-bitstream checksum. (Spectral samples
    are the documented Table B.7/B.8 raise — see
    decode_mp3_layer3_samples.)"""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    r = multimodal.mp3_layer3_sideinfo_census(_synth_mp3_l3(docs))
    return r.select(
        "doc_id", "n_frames", "sample_rate", "n_granules",
        "sum_part2_3", "sum_big_values", "sum_global_gain",
        "n_short_granules", "max_main_data_begin",
        "n_reservoir_frames", "sum_scf_bits",
    )


SQL_MP3_L3_SIDEINFO = """
WITH gk AS (
  SELECT doc_id, f, g
  FROM documents
  CROSS JOIN (SELECT unnest(range(3)) AS f)
  CROSS JOIN (SELECT unnest(range(2)) AS g)
  WHERE f < 1 + doc_id % 3
),
fields AS (
  SELECT doc_id, f, g,
         (doc_id + 100 * f + 37 * g) % 4096 AS part23,
         (3 * doc_id + 17 * g + 5 * f) % 289 AS bv,
         (doc_id + 29 * g + 3 * f) % 256 AS gg,
         (doc_id + g + f) % 16 AS sc,
         CASE WHEN (doc_id + g + f) % 3 = 0 THEN 1 ELSE 0 END AS ws,
         1 + (doc_id + g) % 3 AS bt,
         (doc_id + f) % 2 AS mixed,
         doc_id % 16 AS scfsi
  FROM gk
),
slens AS (
  SELECT *,
    CASE sc WHEN 0 THEN 0 WHEN 1 THEN 0 WHEN 2 THEN 0 WHEN 3 THEN 0
            WHEN 4 THEN 3 WHEN 5 THEN 1 WHEN 6 THEN 1 WHEN 7 THEN 1
            WHEN 8 THEN 2 WHEN 9 THEN 2 WHEN 10 THEN 2 WHEN 11 THEN 3
            WHEN 12 THEN 3 WHEN 13 THEN 3 ELSE 4 END AS s1,
    CASE sc WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 3
            WHEN 4 THEN 0 WHEN 5 THEN 1 WHEN 6 THEN 2 WHEN 7 THEN 3
            WHEN 8 THEN 1 WHEN 9 THEN 2 WHEN 10 THEN 3 WHEN 11 THEN 1
            WHEN 12 THEN 2 WHEN 13 THEN 3 WHEN 14 THEN 2 ELSE 3 END AS s2
  FROM fields
),
scf AS (
  SELECT *,
    CASE
      WHEN ws = 1 AND bt = 2 AND mixed = 1 THEN 17 * s1 + 18 * s2
      WHEN ws = 1 AND bt = 2 THEN 18 * s1 + 18 * s2
      WHEN g = 0 THEN 11 * s1 + 10 * s2
      ELSE (CASE WHEN (scfsi // 8) % 2 = 0 THEN 6 * s1 ELSE 0 END)
         + (CASE WHEN (scfsi // 4) % 2 = 0 THEN 5 * s1 ELSE 0 END)
         + (CASE WHEN (scfsi // 2) % 2 = 0 THEN 5 * s2 ELSE 0 END)
         + (CASE WHEN scfsi % 2 = 0 THEN 5 * s2 ELSE 0 END)
    END AS scf_bits
  FROM slens
),
frames AS (
  SELECT DISTINCT doc_id, f, (7 * doc_id + 13 * f) % 512 AS mdb
  FROM gk
),
fagg AS (
  SELECT doc_id,
         CAST(count(*) AS INT) AS n_frames,
         CAST(max(mdb) AS INT) AS max_main_data_begin,
         CAST(sum(CASE WHEN mdb > 0 THEN 1 ELSE 0 END) AS INT)
           AS n_reservoir_frames
  FROM frames GROUP BY doc_id
),
gagg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_granules,
         CAST(sum(part23) AS BIGINT) AS sum_part2_3,
         CAST(sum(bv) AS BIGINT) AS sum_big_values,
         CAST(sum(gg) AS BIGINT) AS sum_global_gain,
         CAST(sum(CASE WHEN ws = 1 AND bt = 2 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_short_granules,
         CAST(sum(scf_bits) AS BIGINT) AS sum_scf_bits
  FROM scf GROUP BY doc_id
)
SELECT d.doc_id, fa.n_frames, CAST(44100 AS INT) AS sample_rate,
       ga.n_granules, ga.sum_part2_3, ga.sum_big_values,
       ga.sum_global_gain, ga.n_short_granules, fa.max_main_data_begin,
       fa.n_reservoir_frames, ga.sum_scf_bits
FROM documents d
JOIN fagg fa USING (doc_id)
JOIN gagg ga USING (doc_id)
"""


EXTRA_QUERIES["mp3_l3_sideinfo_census"] = q_mp3_l3_sideinfo_census
EXTRA_ORACLES["mp3_l3_sideinfo_census"] = SQL_MP3_L3_SIDEINFO


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed-feature quality classifier through the
    gate (analytics/classifier.py — the CCNet/LLaMA linear filter):
    hashing-trick term frequencies (512 features + bias), logistic
    regression trained with TWO fixed full-batch GD steps from w = 0 on
    closed-form weak labels (length >= 30 tokens), per-source report.
    The oracle replays feature hashing, both gradient steps (sorted
    folds), the sigmoid scores and the rounded-threshold decisions —
    every weight bit-derived from the corpus."""
    from audit_star_spark.analytics.classifier import (
        quality_classifier_report,
    )

    return quality_classifier_report(
        load_table(spark, sf_dir, "documents"),
        n_features=512,
        lr=1.0,
        steps=2,
        min_tokens=30,
    ).orderBy("source")


def _quality_classifier_sql(
    n_features: int = 512, lr: float = 1.0, min_tokens: int = 30
) -> str:
    fold = lambda xs: d_fold(  # noqa: E731
        f"list_sort(list({xs}))", "CAST(0.0 AS DOUBLE)", "(s, v) -> s + v"
    )
    nf = n_features
    return f"""
WITH tl AS (
  SELECT doc_id, source, {D_TOKENS} AS toks FROM documents
),
lab AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= {min_tokens} THEN 1 ELSE 0 END AS y
  FROM tl
),
tok AS (SELECT doc_id, unnest(toks) AS tok FROM tl),
feat0 AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT % {nf} AS feat,
         count(*) AS c
  FROM tok GROUP BY 1, 2
),
dn AS (SELECT doc_id, sum(c) AS n FROM feat0 GROUP BY 1),
feats AS (
  SELECT doc_id, feat, CAST(c AS DOUBLE) / n AS x
  FROM feat0 JOIN dn USING (doc_id)
  UNION ALL
  SELECT doc_id, CAST({nf} AS BIGINT) AS feat, 1.0 AS x FROM tl
),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM lab),
g1 AS (
  SELECT feat, {fold('xr')} / any_value(nd.n) AS gm
  FROM (SELECT f.doc_id, f.feat, f.x * (0.5 - l.y) AS xr
        FROM feats f JOIN lab l USING (doc_id)) CROSS JOIN nd
  GROUP BY feat
),
w1 AS (SELECT feat, -{float(lr)!r} * gm AS w FROM g1),
s2 AS (
  SELECT f.doc_id, {fold('f.x * w1.w')} AS s
  FROM feats f JOIN w1 USING (feat) GROUP BY f.doc_id
),
r2 AS (
  SELECT l.doc_id,
         1.0 / (1.0 + exp(-COALESCE(s2.s, 0.0))) - l.y AS r
  FROM lab l LEFT JOIN s2 USING (doc_id)
),
g2 AS (
  SELECT feat, {fold('xr')} / any_value(nd.n) AS gm
  FROM (SELECT f.doc_id, f.feat, f.x * r2.r AS xr
        FROM feats f JOIN r2 USING (doc_id)) CROSS JOIN nd
  GROUP BY feat
),
w2 AS (
  SELECT feat,
         COALESCE(w1.w, 0.0) + COALESCE(-{float(lr)!r} * g2.gm, 0.0) AS w
  FROM w1 FULL OUTER JOIN g2 USING (feat)
),
score AS (
  SELECT f.doc_id, {fold('f.x * w2.w')} AS s
  FROM feats f JOIN w2 USING (feat) GROUP BY f.doc_id
),
prob AS (
  SELECT doc_id, 1.0 / (1.0 + exp(-s)) AS p FROM score
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(l.y) AS BIGINT) AS n_positive_label,
       round(avg(p.p), 6) AS mean_prob,
       CAST(sum(CASE WHEN round(p.p, 6) >= 0.5 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_pred_positive
FROM documents d
JOIN lab l USING (doc_id)
JOIN prob p USING (doc_id)
GROUP BY d.source
ORDER BY d.source
"""


EXTRA_QUERIES["quality_classifier"] = q_quality_classifier
EXTRA_ORACLES["quality_classifier"] = _quality_classifier_sql()


def q_doc_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (analytics/graph.py hits) over the same
    deterministic doc-level link graph as doc_pagerank — the other
    classic link-analysis signal (page quality via mutual
    reinforcement). Both engines generate the SAME closed-form edges;
    the oracle unrolls the identical L1-normalized rounds as
    MATERIALIZED CTEs. Scores rounded to 9 decimals (float sums
    associate differently across engines)."""
    from audit_star_spark.analytics.graph import hits

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    nd = docs.agg(F.count("*").alias("n"))
    linkers = docs.filter(F.col("doc_id") % 17 != 0).crossJoin(F.broadcast(nd))
    edges = linkers.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 1) % F.col("n")).alias("dst"),
    ).unionByName(
        linkers.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 13 + 3) % F.col("n")).alias("dst"),
        )
    )
    r = hits(edges, n_iter=PAGERANK_ITERS)
    return r.select(
        F.col("node").alias("doc_id"),
        F.round("hub", 9).alias("hub"),
        F.round("authority", 9).alias("authority"),
    )


def _hits_sql() -> str:
    from audit_star_spark.analytics.graph import hits_sql_iterations

    edges_cte = """nn0 AS (SELECT count(*) AS n FROM documents),
linkers AS (SELECT doc_id FROM documents WHERE doc_id % 17 <> 0),
edges AS (
  SELECT doc_id AS src, (doc_id * 7 + 1) % nn0.n AS dst FROM linkers CROSS JOIN nn0
  UNION ALL
  SELECT doc_id AS src, (doc_id * 13 + 3) % nn0.n AS dst FROM linkers CROSS JOIN nn0
)"""
    inner = hits_sql_iterations(edges_cte, n_iter=PAGERANK_ITERS)
    return f"""
SELECT node AS doc_id, round(hub, 9) AS hub, round(authority, 9) AS authority
FROM ({inner})
"""


EXTRA_QUERIES["doc_hits"] = q_doc_hits
EXTRA_ORACLES["doc_hits"] = _hits_sql()


def q_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus through the gate
    (analytics/pca.py — 8 power-iteration steps from the uniform start;
    +,-,*,/,sqrt only, so the oracle replays the WHOLE eigencomputation
    including the covariance, every iteration, the sign convention and
    the Rayleigh-quotient variance share — no library eigensolver on
    either side). Anisotropy diagnostics and the whitening direction
    for embedding pipelines (Mu & Viswanath 2018)."""
    from audit_star_spark.analytics.pca import embedding_pca_report

    return embedding_pca_report(
        load_table(spark, sf_dir, "embeddings"), n_iter=8
    )


def _pca_sql(n_iter: int = 8, dim: int = 64) -> str:
    fold = lambda xs: d_fold(  # noqa: E731
        f"list_sort(list({xs}))", "CAST(0.0 AS DOUBLE)", "(s, v) -> s + v"
    )
    parts = [
        f"""WITH base AS (
  SELECT vec_id, {D_VEC} AS vec FROM embeddings
),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM base),
dims AS (
  SELECT k - 1 AS i, vec[k] AS x
  FROM base, LATERAL (SELECT unnest(range(1, {dim + 1})) AS k)
),
mean AS (
  SELECT i, {fold('x')} / any_value(nn.n) AS m FROM dims CROSS JOIN nn
  GROUP BY i
),
ml AS (
  SELECT list_transform(list_sort(list(struct_pack(i := i, m := m))),
                        x -> x.m) AS ml
  FROM mean
),
centered AS (
  SELECT vec_id,
         list_transform(generate_series(1, {dim}),
                        k -> vec[k] - ml[k]) AS cv
  FROM base CROSS JOIN ml
),
pairs AS (
  SELECT i.k - 1 AS i, j.k - 1 AS j, cv[i.k] * cv[j.k] AS v
  FROM centered,
       LATERAL (SELECT unnest(range(1, {dim + 1})) AS k) i,
       LATERAL (SELECT unnest(range(1, {dim + 1})) AS k) j
),
cov AS MATERIALIZED (
  SELECT i, j, {fold('v')} / any_value(nn.n) AS c
  FROM pairs CROSS JOIN nn GROUP BY i, j
),
v0 AS (
  SELECT unnest(range({dim})) AS j, 1.0 / sqrt(CAST({dim} AS DOUBLE)) AS val
)"""
    ]
    for k in range(n_iter):
        parts.append(
            f"""w{k} AS MATERIALIZED (
  SELECT cov.i, {fold('cov.c * v.val')} AS w
  FROM cov JOIN v{k} v ON v.j = cov.j GROUP BY cov.i
),
n{k} AS (SELECT sqrt({fold('w * w')}) AS nrm FROM w{k}),
v{k + 1} AS MATERIALIZED (
  SELECT i AS j, w / n{k}.nrm AS val FROM w{k} CROSS JOIN n{k}
)"""
        )
    parts.append(
        f"""sg AS (
  SELECT CASE WHEN val < 0 THEN -1.0 ELSE 1.0 END AS sg
  FROM v{n_iter} WHERE j = 0
),
loadings AS (
  SELECT j AS dim, val * sg.sg AS loading FROM v{n_iter} CROSS JOIN sg
),
cvf AS (
  SELECT cov.i, {fold('cov.c * l.loading')} AS w
  FROM cov JOIN loadings l ON l.dim = cov.j GROUP BY cov.i
),
eig AS (
  SELECT {fold('c.w * l.loading')} AS eigenvalue
  FROM cvf c JOIN loadings l ON l.dim = c.i
),
tr AS (SELECT {fold('c')} AS trace FROM cov WHERE i = j)"""
    )
    body = ",\n".join(parts)
    return f"""{body}
SELECT CAST(l.dim AS INT) AS dim, round(l.loading, 9) AS loading,
       round(eig.eigenvalue / tr.trace, 9) AS var_share
FROM loadings l CROSS JOIN eig CROSS JOIN tr
"""


EXTRA_QUERIES["embedding_pca"] = q_embedding_pca
EXTRA_ORACLES["embedding_pca"] = _pca_sql()


def q_pca_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 principal components by Hotelling deflation through the
    gate (analytics/pca.py pca_components — extract top eigenpair,
    subtract lambda*v*v', repeat): the "All-but-the-Top" whitening
    directions plus the anisotropy report (per-component variance
    shares). The oracle replays BOTH eigenextractions and the deflation
    arithmetic — still nothing beyond +,-,*,/,sqrt on either side."""
    from audit_star_spark.analytics.pca import pca_components

    r = pca_components(load_table(spark, sf_dir, "embeddings"), k=2, n_iter=8)
    return r.select(
        "comp",
        "dim",
        F.round("loading", 9).alias("loading"),
        F.round("eigenvalue", 9).alias("eigenvalue"),
        F.round("var_share", 9).alias("var_share"),
    )


def _pca_components_sql(k: int = 2, n_iter: int = 8, dim: int = 64) -> str:
    fold = lambda xs: d_fold(  # noqa: E731
        f"list_sort(list({xs}))", "CAST(0.0 AS DOUBLE)", "(s, v) -> s + v"
    )
    parts = [
        f"""WITH base AS (
  SELECT vec_id, {D_VEC} AS vec FROM embeddings
),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM base),
dims AS (
  SELECT kk - 1 AS i, vec[kk] AS x
  FROM base, LATERAL (SELECT unnest(range(1, {dim + 1})) AS kk)
),
mean AS (
  SELECT i, {fold('x')} / any_value(nn.n) AS m FROM dims CROSS JOIN nn
  GROUP BY i
),
ml AS (
  SELECT list_transform(list_sort(list(struct_pack(i := i, m := m))),
                        x -> x.m) AS ml
  FROM mean
),
centered AS (
  SELECT vec_id,
         list_transform(generate_series(1, {dim}),
                        kk -> vec[kk] - ml[kk]) AS cv
  FROM base CROSS JOIN ml
),
pairs AS (
  SELECT i.kk - 1 AS i, j.kk - 1 AS j, cv[i.kk] * cv[j.kk] AS v
  FROM centered,
       LATERAL (SELECT unnest(range(1, {dim + 1})) AS kk) i,
       LATERAL (SELECT unnest(range(1, {dim + 1})) AS kk) j
),
cov1 AS MATERIALIZED (
  SELECT i, j, {fold('v')} / any_value(nn.n) AS c
  FROM pairs CROSS JOIN nn GROUP BY i, j
),
tr AS (SELECT {fold('c')} AS trace FROM cov1 WHERE i = j)"""
    ]
    for comp in range(1, k + 1):
        parts.append(
            f"""v{comp}_0 AS (
  SELECT unnest(range({dim})) AS j,
         1.0 / sqrt(CAST({dim} AS DOUBLE)) AS val
)"""
        )
        for it in range(n_iter):
            parts.append(
                f"""w{comp}_{it} AS MATERIALIZED (
  SELECT cov.i, {fold('cov.c * v.val')} AS w
  FROM cov{comp} cov JOIN v{comp}_{it} v ON v.j = cov.j GROUP BY cov.i
),
n{comp}_{it} AS (SELECT sqrt({fold('w * w')}) AS nrm FROM w{comp}_{it}),
v{comp}_{it + 1} AS MATERIALIZED (
  SELECT i AS j, w / n{comp}_{it}.nrm AS val
  FROM w{comp}_{it} CROSS JOIN n{comp}_{it}
)"""
            )
        parts.append(
            f"""sg{comp} AS (
  SELECT CASE WHEN val < 0 THEN -1.0 ELSE 1.0 END AS sg
  FROM v{comp}_{n_iter} WHERE j = 0
),
l{comp} AS MATERIALIZED (
  SELECT j AS dim, val * sg{comp}.sg AS loading
  FROM v{comp}_{n_iter} CROSS JOIN sg{comp}
),
cvf{comp} AS (
  SELECT cov.i, {fold('cov.c * l.loading')} AS w
  FROM cov{comp} cov JOIN l{comp} l ON l.dim = cov.j GROUP BY cov.i
),
e{comp} AS MATERIALIZED (
  SELECT {fold('c.w * l.loading')} AS eigenvalue
  FROM cvf{comp} c JOIN l{comp} l ON l.dim = c.i
)"""
        )
        if comp < k:
            parts.append(
                f"""cov{comp + 1} AS MATERIALIZED (
  SELECT cov.i, cov.j,
         cov.c - e{comp}.eigenvalue * li.loading * lj.loading AS c
  FROM cov{comp} cov
  JOIN l{comp} li ON li.dim = cov.i
  JOIN l{comp} lj ON lj.dim = cov.j
  CROSS JOIN e{comp}
)"""
            )
    selects = [
        f"""SELECT CAST({comp} AS INT) AS comp, CAST(l.dim AS INT) AS dim,
       round(l.loading, 9) AS loading,
       round(e{comp}.eigenvalue, 9) AS eigenvalue,
       round(e{comp}.eigenvalue / tr.trace, 9) AS var_share
FROM l{comp} l CROSS JOIN e{comp} CROSS JOIN tr"""
        for comp in range(1, k + 1)
    ]
    body = ",\n".join(parts)
    return f"{body}\n" + "\nUNION ALL\n".join(selects)


EXTRA_QUERIES["pca_components"] = q_pca_components
EXTRA_ORACLES["pca_components"] = _pca_components_sql()


def q_audio_spectral_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-domain audio features through the gate
    (multimodal.audio_spectral_stats): Hann-windowed 64-point DFT per
    frame, band energies (thirds of bins 1..32) and spectral centroid
    over the synthesized square waves. The oracle recomputes the WHOLE
    transform — window, DFT real/imag sums, powers, band sums,
    centroid — from the closed-form samples in SQL; rounded to 6
    decimals (libm cos/sin differ in the last ulp between numpy and
    DuckDB; the energies are smooth sums, so rounding absorbs it)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    r = multimodal.audio_spectral_stats(_synth_audio_441(docs), frame=64)
    return r.select(
        "doc_id",
        "sample_rate",
        "n_frames",
        F.round("e_low", 6).alias("e_low"),
        F.round("e_mid", 6).alias("e_mid"),
        F.round("e_high", 6).alias("e_high"),
        F.round("centroid", 6).alias("centroid"),
    )


SQL_AUDIO_SPECTRAL = """
WITH params AS (
  SELECT doc_id, 10 + doc_id % 7 AS half,
         CAST(800 + (doc_id % 5) * 160 AS BIGINT) AS n
  FROM documents
),
fk AS (
  SELECT doc_id, half, n, f.f, k.k
  FROM params,
       LATERAL (SELECT unnest(generate_series(0, n // 64 - 1)) AS f) f,
       LATERAL (SELECT unnest(range(1, 33)) AS k) k
),
spec AS (
  SELECT doc_id, f, k,
         SUM((0.5 - 0.5 * cos(2 * pi() * t / 64.0))
             * ((8000.0 * (1 - 2 * (((f * 64 + t) // half) % 2))) / 32768.0)
             * cos(2 * pi() * k * t / 64.0)) AS re,
         SUM((0.5 - 0.5 * cos(2 * pi() * t / 64.0))
             * ((8000.0 * (1 - 2 * (((f * 64 + t) // half) % 2))) / 32768.0)
             * sin(2 * pi() * k * t / 64.0)) AS im
  FROM fk, LATERAL (SELECT unnest(range(64)) AS t) t
  GROUP BY doc_id, f, k
),
p AS (SELECT doc_id, f, k, re * re + im * im AS pw FROM spec),
agg AS (
  SELECT doc_id,
         SUM(CASE WHEN k BETWEEN 1 AND 10 THEN pw ELSE 0 END) AS e_low,
         SUM(CASE WHEN k BETWEEN 11 AND 20 THEN pw ELSE 0 END) AS e_mid,
         SUM(CASE WHEN k BETWEEN 21 AND 32 THEN pw ELSE 0 END) AS e_high,
         SUM(k * pw) / SUM(pw) AS centroid
  FROM p GROUP BY doc_id
)
SELECT pr.doc_id, CAST(44100 AS INT) AS sample_rate,
       CAST(pr.n // 64 AS INT) AS n_frames,
       round(a.e_low, 6) AS e_low,
       round(a.e_mid, 6) AS e_mid,
       round(a.e_high, 6) AS e_high,
       round(a.centroid, 6) AS centroid
FROM params pr JOIN agg a USING (doc_id)
"""


EXTRA_QUERIES["audio_spectral_census"] = q_audio_spectral_census
EXTRA_ORACLES["audio_spectral_census"] = SQL_AUDIO_SPECTRAL


# ----------------------------------------------------- round-11 rotation
# The 8 round-10 queries (gate-sim + pytest-oracle-locked but never
# driver-certified) move into the 50-slot window to earn hard
# CORRECTNESS_r11 rows; 8 double-green entries (driver-green in BOTH
# r9 and r10) retire to EXTRA, where tests/test_oracle_parity.py keeps
# them oracle-locked on every pytest run. Window stays 8 audit + 42
# analytics.
_R11_ROTATE_IN = [
    "opq_recall",
    "doc_perplexity_kn",
    "mp3_l3_sideinfo_census",
    "quality_classifier",
    "doc_hits",
    "embedding_pca",
    "pca_components",
    "audio_spectral_census",
]
_R11_ROTATE_OUT = [
    "dedup_minhash_pairs",
    "quality_flags",
    "pipeline_report",
    "split_leakage",
    "orders_profile",
    "unicode_token_stats",
    "doc_pagerank",
    "warc_census",
]
for _name in _R11_ROTATE_OUT:
    EXTRA_QUERIES[_name] = ANALYTICS_QUERIES.pop(_name)
    EXTRA_ORACLES[_name] = ANALYTICS_ORACLES.pop(_name)
for _name in _R11_ROTATE_IN:
    ANALYTICS_QUERIES[_name] = EXTRA_QUERIES.pop(_name)
    ANALYTICS_ORACLES[_name] = EXTRA_ORACLES.pop(_name)

if len(ANALYTICS_QUERIES) != 42:  # driver gate window: 8 audit + 42 analytics
    raise RuntimeError(
        "ANALYTICS_QUERIES must stay exactly 42 entries so the driver's "
        f"50-slot correctness window is stable; got {len(ANALYTICS_QUERIES)}"
    )
del _name


# ------------------------------------------------ round-11 additions (EXTRA)
DSIR_TARGET = "source IN ('src0', 'src1', 'src2')"
DSIR_B = 256
DSIR_K = 100


def q_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling through the gate (analytics/dsir.py —
    Xie et al. 2023): hashed unigram+bigram bucket models of the target
    slice (sources src0-src2) vs the raw remainder, add-one smoothing,
    per-doc importance log-weights, Gumbel top-k selection in the
    deterministic md5-uniform family. The oracle replays the feature
    hashing, both bag models, the log-ratio table, the sorted per-doc
    fold and the Gumbel keys, then takes the same top-k."""
    from audit_star_spark.analytics.dsir import dsir_resample

    sel = dsir_resample(
        load_table(spark, sf_dir, "documents"),
        target=DSIR_TARGET,
        k=DSIR_K,
        n_buckets=DSIR_B,
    )
    return sel.select(
        "doc_id", "source", F.round("log_w", 6).alias("log_w")
    )


def _dsir_selection_sql(
    target: str = DSIR_TARGET, n_buckets: int = DSIR_B, k: int = DSIR_K
) -> str:
    b = n_buckets
    fold = d_fold(
        "list_sort(list(c * lr))", "CAST(0.0 AS DOUBLE)", "(s, v) -> s + v"
    )
    return f"""
WITH tl AS (SELECT doc_id, {D_TOKENS} AS t FROM documents),
grams AS (
  SELECT doc_id, unnest(list_concat(
    list_transform(t, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % {b}),
    CASE WHEN len(t) >= 2 THEN
      list_transform(generate_series(1, len(t) - 1),
        i -> ('0x' || substr(md5(t[i] || ' ' || t[i+1]), 1, 15))::BIGINT % {b})
    ELSE [] END)) AS bucket
  FROM tl
),
cnt AS (SELECT doc_id, bucket, count(*) AS c FROM grams GROUP BY 1, 2),
tgt AS (SELECT doc_id FROM documents WHERE {target}),
fl AS (
  SELECT c.bucket, c.c,
         CASE WHEN t.doc_id IS NULL THEN 0 ELSE 1 END AS tflag
  FROM cnt c LEFT JOIN tgt t USING (doc_id)
),
pb AS (
  SELECT bucket,
         sum(CASE WHEN tflag = 1 THEN c ELSE 0 END) AS tc,
         sum(CASE WHEN tflag = 0 THEN c ELSE 0 END) AS qc
  FROM fl GROUP BY 1
),
tot AS (SELECT sum(tc) AS tt, sum(qc) AS qt FROM pb),
ratio AS (
  SELECT ab.bucket,
         ln((COALESCE(pb.tc, 0) + 1.0) / (tot.tt + {float(b)!r}))
       - ln((COALESCE(pb.qc, 0) + 1.0) / (tot.qt + {float(b)!r})) AS lr
  FROM (SELECT unnest(generate_series(0, {b - 1})) AS bucket) ab
  LEFT JOIN pb USING (bucket) CROSS JOIN tot
),
lw AS (
  SELECT c.doc_id, {fold} AS log_w
  FROM cnt c JOIN ratio USING (bucket)
  WHERE c.doc_id NOT IN (SELECT doc_id FROM tgt)
  GROUP BY c.doc_id
),
keyed AS (
  SELECT d.doc_id, d.source, lw.log_w,
         lw.log_w - ln(-ln(
           (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':dsir'), 1, 15))::BIGINT
            + 1.0) / 1152921504606846977.0)) AS g_key
  FROM documents d JOIN lw USING (doc_id)
)
SELECT doc_id, source, round(log_w, 6) AS log_w
FROM keyed ORDER BY g_key DESC, doc_id LIMIT {k}
"""


EXTRA_QUERIES["dsir_selection"] = q_dsir_selection
EXTRA_ORACLES["dsir_selection"] = _dsir_selection_sql()


def _synth_mp3_l3_samples(spark_df):
    """doc_id-keyed FULL Layer III frames (side info + Huffman main
    data) under the clearly-synthetic table set
    (mp3.synthetic_l3_tables, max_val=2): 1 + d%2 frames of 64 kbps
    mono, two long-block granules each, every sample/scalefactor a
    closed form in (doc_id, frame, granule, index) so the oracle can
    replay the decoded census without touching the bitstream."""
    from pyspark.sql import types as T

    from audit_star_spark.util import spread

    def synth(batches):
        import pandas as pd

        from audit_star_spark.analytics.mp3 import (
            encode_mp3_layer3_frames,
            synthetic_l3_tables,
        )

        tables = synthetic_l3_tables(max_val=2)

        def granule(d, f, g):
            n_pairs = 4 + (d + g) % 5
            pairs = []
            for i in range(n_pairs):
                xm = (d + g + i) % 3
                ym = (d + 2 * i + g) % 3
                pairs.append(
                    (
                        -xm if (d + i) % 2 == 1 else xm,
                        -ym if (d + g + i) % 3 == 2 else ym,
                    )
                )
            quads = [
                tuple(
                    -((d + i + j + g) % 2)
                    if (i + j) % 2 == 1
                    else (d + i + j + g) % 2
                    for j in range(4)
                )
                for i in range((d + f) % 3)
            ]
            return {
                "global_gain": (d + g) % 256,
                "scalefac_compress": 13,  # slen (3, 3)
                "window_switching": 0, "block_type": 0, "mixed_block": 0,
                "table_select": [1, 1, 1],
                "region0_count": 4, "region1_count": 5,
                "preflag": 0, "scalefac_scale": 0,
                "count1table_select": (d + g) % 2,
                "scalefacs": [(d + g + j) % 8 for j in range(21)],
                "pairs": pairs, "quads": quads,
            }

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                payloads.append(
                    encode_mp3_layer3_frames(
                        [
                            {
                                "scfsi": [d % 16],
                                "granules": [
                                    [granule(d, f, g)] for g in range(2)
                                ],
                            }
                            for f in range(1 + d % 2)
                        ],
                        tables,
                        kbps=64,
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return spread(spark_df.select("doc_id")).mapInPandas(
        synth,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def q_mp3_l3_samples_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MPEG-1 Layer III spectral-sample decode through the
    user-supplied-table escape hatch (analytics/mp3.py
    decode_mp3_layer3_samples + synthetic_l3_tables): the synthesized
    frames carry actual Huffman-coded main data — scalefactors with
    scfsi granule-1 reuse, three-region big_values pairs with sign
    bits, count1 quadruples, rzero padding — packed by
    encode_mp3_layer3_frames and read back bit-exactly. The tables are
    CLEARLY SYNTHETIC (never the ISO B.7/B.8 constants): the query
    certifies the complete decode machinery; a caller who owns the
    spec plugs the real tables into the same code path. One misplaced
    bit desyncs the Huffman walk, so the summed census is a
    whole-main-data checksum."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    from audit_star_spark.analytics.mp3 import synthetic_l3_tables

    r = multimodal.mp3_layer3_samples_census(
        _synth_mp3_l3_samples(docs), synthetic_l3_tables(max_val=2)
    )
    return r.select(
        "doc_id", "n_frames", "n_granules", "sum_samples",
        "sum_abs_samples", "n_nonzero", "sum_scalefacs",
        "sum_stuffing_bits",
    )


SQL_MP3_L3_SAMPLES = """
WITH fr AS (
  SELECT doc_id AS d, f
  FROM documents CROSS JOIN (SELECT unnest(range(2)) AS f)
  WHERE f < 1 + doc_id % 2
),
gg AS (SELECT d, f, g FROM fr CROSS JOIN (SELECT unnest(range(2)) AS g)),
pairs AS (
  SELECT d,
    CASE WHEN (d + i) % 2 = 1 THEN -((d + g + i) % 3)
         ELSE (d + g + i) % 3 END AS x,
    CASE WHEN (d + g + i) % 3 = 2 THEN -((d + 2 * i + g) % 3)
         ELSE (d + 2 * i + g) % 3 END AS y
  FROM gg CROSS JOIN (SELECT unnest(range(9)) AS i)
  WHERE i < 4 + (d + g) % 5
),
quads AS (
  SELECT d,
    CASE WHEN (i + j) % 2 = 1 THEN -((d + i + j + g) % 2)
         ELSE (d + i + j + g) % 2 END AS v
  FROM gg
  CROSS JOIN (SELECT unnest(range(3)) AS i)
  CROSS JOIN (SELECT unnest(range(4)) AS j)
  WHERE i < (d + f) % 3
),
scf AS (
  SELECT d,
    CASE WHEN g = 1 AND ((d // (CASE WHEN j < 6 THEN 8 WHEN j < 11 THEN 4
                                     WHEN j < 16 THEN 2 ELSE 1 END)) % 2) = 1
         THEN (d + j) % 8 ELSE (d + g + j) % 8 END AS s
  FROM gg CROSS JOIN (SELECT unnest(range(21)) AS j)
),
psum AS (
  SELECT d, sum(x + y) AS ss, sum(abs(x) + abs(y)) AS sa,
         sum(CASE WHEN x <> 0 THEN 1 ELSE 0 END
           + CASE WHEN y <> 0 THEN 1 ELSE 0 END) AS nz
  FROM pairs GROUP BY d
),
qsum AS (
  SELECT d, sum(v) AS ss, sum(abs(v)) AS sa,
         sum(CASE WHEN v <> 0 THEN 1 ELSE 0 END) AS nz
  FROM quads GROUP BY d
),
ssum AS (SELECT d, sum(s) AS sf FROM scf GROUP BY d)
SELECT dd.doc_id,
       CAST(1 + dd.doc_id % 2 AS INT) AS n_frames,
       CAST(2 * (1 + dd.doc_id % 2) AS BIGINT) AS n_granules,
       CAST(COALESCE(p.ss, 0) + COALESCE(q.ss, 0) AS BIGINT) AS sum_samples,
       CAST(COALESCE(p.sa, 0) + COALESCE(q.sa, 0) AS BIGINT)
         AS sum_abs_samples,
       CAST(COALESCE(p.nz, 0) + COALESCE(q.nz, 0) AS BIGINT) AS n_nonzero,
       CAST(s.sf AS BIGINT) AS sum_scalefacs,
       CAST(0 AS BIGINT) AS sum_stuffing_bits
FROM documents dd
LEFT JOIN psum p ON p.d = dd.doc_id
LEFT JOIN qsum q ON q.d = dd.doc_id
JOIN ssum s ON s.d = dd.doc_id
"""


EXTRA_QUERIES["mp3_l3_samples_census"] = q_mp3_l3_samples_census
EXTRA_ORACLES["mp3_l3_samples_census"] = SQL_MP3_L3_SAMPLES


def q_doremi_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain reweighting through the gate
    (analytics/doremi.py — Xie et al. 2023): per-source excess loss =
    mean self-trained bigram-LM NLL minus the uniform-LM baseline ln V
    (clamped at 0), then 4 exponentiated-gradient Group-DRO steps with
    simplex projection and uniform smoothing from the uniform start;
    the reported avg_weight is the paper's step-averaged mixture. The
    oracle replays the bigram LM, the domain folds, and every update
    step (sorted folds, same arithmetic)."""
    import math

    from audit_star_spark.analytics.doremi import (
        domain_excess_loss,
        doremi_weights,
    )
    from audit_star_spark.analytics.lm import doc_perplexity
    from audit_star_spark.analytics.text import TOKENS_EXPR

    docs = load_table(spark, sf_dir, "documents")
    scored = doc_perplexity(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    # bounded control decision: ONE integer (train vocabulary size)
    # feeds the closed-form reference loss ln V — both engines compute
    # the same integer, so the constant is bit-identical
    v = (
        docs.select(F.explode(F.expr(TOKENS_EXPR)).alias("w"))
        .agg(F.countDistinct("w"))
        .collect()[0][0]
    )
    from audit_star_spark.plans.iterate import iter_materialize

    # one materialization of the D-row excess frame serves both the
    # weight iteration and the report join (its lineage is the full
    # LM-scoring scan)
    excess = iter_materialize(domain_excess_loss(scored, math.log(int(v))))
    w = doremi_weights(excess, n_steps=4, lr=1.0, smoothing=0.1)
    return excess.join(w, "domain").select(
        "domain",
        "n_docs",
        F.round("excess", 6).alias("excess"),
        F.round("final_weight", 6).alias("final_weight"),
        F.round("avg_weight", 6).alias("avg_weight"),
    )


def _doremi_sql() -> str:
    from audit_star_spark.analytics.doremi import doremi_sql_iterations
    from audit_star_spark.analytics.lm import perplexity_sql

    fold = d_fold(
        "list_sort(list(CASE WHEN avg_nll IS NULL THEN 0.0 "
        "ELSE avg_nll END))",
        "CAST(0.0 AS DOUBLE)",
        "(s, v) -> s + v",
    )
    excess_cte = f"""px AS ({perplexity_sql('documents', 'text')}),
scored AS (
  SELECT d.source AS domain, px.avg_nll
  FROM documents d JOIN px ON px.doc_id = d.doc_id
),
uni2 AS (
  SELECT unnest(str_split(regexp_replace(trim(lower(text)), '\\s+', ' ',
    'g'), ' ')) AS w
  FROM documents
),
voc2 AS (SELECT count(DISTINCT w) AS v FROM uni2),
per AS (
  SELECT domain, count(*) AS n_docs,
         {fold} AS nll_sum,
         sum(CASE WHEN avg_nll IS NOT NULL THEN 1 ELSE 0 END) AS n_scored
  FROM scored GROUP BY domain
),
excess AS (
  SELECT domain, n_docs,
         greatest(0.0, CASE WHEN n_scored > 0
                            THEN nll_sum / n_scored - ln(voc2.v)
                            ELSE 0.0 END) AS excess
  FROM per CROSS JOIN voc2
)"""
    inner = doremi_sql_iterations(
        excess_cte, n_steps=4, lr=1.0, smoothing=0.1
    )
    return f"""
SELECT e.domain, e.n_docs, round(e.excess, 6) AS excess,
       round(i.final_weight, 6) AS final_weight,
       round(i.avg_weight, 6) AS avg_weight
FROM ({inner}) i
JOIN ({ 'WITH ' + excess_cte + ' SELECT * FROM excess' }) e USING (domain)
"""


EXTRA_QUERIES["doremi_mixture"] = q_doremi_mixture
EXTRA_ORACLES["doremi_mixture"] = _doremi_sql()


def q_winnow_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint near-duplicates through the gate
    (analytics/winnow.py — Schleimer et al. 2003 / MOSS): per document,
    the rightmost-tie window minima of rolling k-gram hashes form the
    fingerprint set (guarantee: shared runs >= w + k - 1 tokens always
    collide); pairs sharing >= 2 distinct fingerprints report the
    containment-style overlap. The oracle replays the k-gram hashes,
    the window selection fold (identical tie-break), the inverted-index
    join and the score."""
    from audit_star_spark.analytics.winnow import winnow_near_pairs

    r = winnow_near_pairs(
        load_table(spark, sf_dir, "documents"), k=4, w=4, min_shared=2
    )
    return r.select(
        "doc_a", "doc_b", "n_shared", F.round("overlap", 6).alias("overlap")
    )


def _winnow_sql(k: int = 4, w: int = 4, min_shared: int = 2) -> str:
    from audit_star_spark.analytics.text import FP_PRIME

    p = FP_PRIME
    return f"""
WITH th AS (SELECT doc_id, {D_TOK_HASHES} AS th FROM documents),
kg AS (
  SELECT doc_id,
    CASE WHEN len(th) >= {k} THEN
      list_transform(generate_series(1, len(th) - {k} + 1),
        i -> list_reduce(
               list_concat([CAST(0 AS BIGINT)],
                           list_slice(th, i, i + {k} - 1)),
               (h, t) -> (h * 31 + t % {p}) % {p}))
    ELSE [] END AS kg
  FROM th
),
sel AS (
  SELECT doc_id, list_transform(generate_series(1,
      CASE WHEN len(kg) >= {w} THEN len(kg) - {w} + 1
           WHEN len(kg) >= 1 THEN 1 ELSE 0 END),
    s -> list_reduce(
         list_concat([struct_pack(pos := 0, fp := CAST(-1 AS BIGINT))],
           list_transform(generate_series(s, least(s + {w} - 1, len(kg))),
             j -> struct_pack(pos := j, fp := kg[j]))),
         (st, e) -> CASE WHEN st.fp < 0 OR e.fp <= st.fp
                         THEN e ELSE st END)) AS sel
  FROM kg
),
fps AS (
  SELECT DISTINCT doc_id, u.fp AS fp
  FROM (SELECT doc_id, unnest(sel) AS u FROM sel)
),
sizes AS (SELECT doc_id, count(*) AS n_fp FROM fps GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= {min_shared}
)
SELECT doc_a, doc_b, n_shared,
       round(CAST(n_shared AS DOUBLE) / least(sa.n_fp, sb.n_fp), 6)
         AS overlap
FROM shared
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
"""


EXTRA_QUERIES["winnow_near_dups"] = q_winnow_near_dups
EXTRA_ORACLES["winnow_near_dups"] = _winnow_sql()


def q_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation recall through the gate
    (analytics/similarity.py matryoshka_recall — Kusupati et al. 2022):
    exact cosine top-10 over the 16/32/64-dim PREFIXES of each
    embedding, scored against the full-dim exact top-10. The oracle
    replays the prefix slices, both rankings (same tie-break) and the
    recall join."""
    from audit_star_spark.analytics.similarity import matryoshka_recall

    return matryoshka_recall(
        load_table(spark, sf_dir, "embeddings"), dims=(16, 32, 64)
    ).select(
        "prefix_dim", "query_id", "n_hits",
        F.round("recall", 6).alias("recall"),
    )


def _matryoshka_sql(
    dims: tuple[int, ...] = (16, 32, 64), n_queries: int = 8, k: int = 10
) -> str:
    def topk_cte(tag: str, d: int | None) -> str:
        vec = f"list_slice(vec, 1, {d})" if d is not None else "vec"
        return f"""
n_{tag} AS (
  SELECT vec_id, {vec} AS pv FROM base
),
m_{tag} AS (
  SELECT vec_id, pv, sqrt({d_dot('pv', 'pv')}) AS nrm FROM n_{tag}
),
q_{tag} AS (
  SELECT vec_id AS query_id, pv AS qv, nrm AS qn
  FROM m_{tag} WHERE vec_id < {n_queries}
),
t_{tag} AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, b.vec_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY {d_dot('q.qv', 'b.pv')} / (q.qn * b.nrm) DESC,
                      b.vec_id) AS rank
    FROM m_{tag} b JOIN q_{tag} q ON b.vec_id <> q.query_id
  ) WHERE rank <= {k}
)"""

    ctes = [f"base AS (SELECT vec_id, {D_VEC} AS vec FROM embeddings)"]
    ctes.append(topk_cte("full", None).strip().lstrip("\n"))
    for d in dims:
        ctes.append(topk_cte(f"d{d}", d).strip())
    unions = "\n  UNION ALL\n  ".join(
        f"SELECT {d} AS prefix_dim, e.query_id, "
        f"CAST(count(p.vec_id) AS BIGINT) AS n_hits "
        f"FROM t_full e LEFT JOIN t_d{d} p "
        f"ON p.query_id = e.query_id AND p.vec_id = e.vec_id "
        f"GROUP BY e.query_id"
        for d in dims
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT prefix_dim, query_id, n_hits,
       round(CAST(n_hits AS DOUBLE) / {float(k)!r}, 6) AS recall
FROM (
  {unions}
)"""
    )


EXTRA_QUERIES["matryoshka_recall"] = q_matryoshka_recall
EXTRA_ORACLES["matryoshka_recall"] = _matryoshka_sql()


def q_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced embedding sampling through the gate
    (analytics/similarity.py cluster_balanced_sample): IVF-style
    broadcast assignment to the deterministic first-16 centroids, then
    4 md5-uniform samples per cell (per-group rank window). The oracle
    replays the assignment argmax (same tie-break), the sample keys and
    the per-cell rank."""
    from audit_star_spark.analytics.similarity import cluster_balanced_sample

    return cluster_balanced_sample(
        load_table(spark, sf_dir, "embeddings"), n_cells=16, per_cell=4
    )


def _cluster_balanced_sql(
    n_cells: int = 16, per_cell: int = 4, salt: str = "cbs"
) -> str:
    return f"""
WITH base AS (
  SELECT vec_id, label, {D_VEC} AS vec FROM embeddings
),
normed AS (
  SELECT vec_id, label, vec, sqrt({d_dot('vec', 'vec')}) AS norm FROM base
),
cents AS (
  SELECT vec_id AS cell_id, vec AS cvec, norm AS cnorm
  FROM normed WHERE vec_id < {n_cells}
),
assigned AS (
  SELECT vec_id, label, cell_id FROM (
    SELECT b.vec_id, b.label, c.cell_id,
           ROW_NUMBER() OVER (
             PARTITION BY b.vec_id
             ORDER BY {d_dot('c.cvec', 'b.vec')} / (c.cnorm * b.norm) DESC,
                      c.cell_id) AS crank
    FROM normed b CROSS JOIN cents c
  ) WHERE crank = 1
),
keyed AS (
  SELECT cell_id, vec_id, label,
         ('0x' || substr(md5(CAST(vec_id AS VARCHAR) || ':{salt}'), 1, 15))
           ::BIGINT AS u
  FROM assigned
)
SELECT cell_id, vec_id, label FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY cell_id
                               ORDER BY u ASC, vec_id) AS rn
  FROM keyed
) WHERE rn <= {per_cell}
"""


EXTRA_QUERIES["cluster_balanced_sample"] = q_cluster_balanced_sample
EXTRA_ORACLES["cluster_balanced_sample"] = _cluster_balanced_sql()


def q_knn_graph_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NN-Descent kNN-graph construction through the gate
    (analytics/knn_graph.py — Dong et al. 2011): deterministic-random
    seed edges, two neighbor-of-neighbor refinement rounds
    (symmetrized edge set, new-pair-only scoring, per-node top-k), and
    the convergence metric — recall of each eval node's exact top-k
    among its graph out-edges. The oracle unrolls the identical seed
    arithmetic and both rounds."""
    from audit_star_spark.analytics.knn_graph import knn_graph_recall

    return knn_graph_recall(
        load_table(spark, sf_dir, "embeddings"), k=8, rounds=2, n_eval=8
    ).select("src", "n_hits", F.round("recall", 6).alias("recall"))


def _knn_graph_sql(k: int = 8, rounds: int = 2, n_eval: int = 8) -> str:
    seed_h = (
        "('0x' || substr(md5(CAST(src AS VARCHAR) || ':' || "
        "CAST(j AS VARCHAR)), 1, 15))::BIGINT"
    )

    def score(tbl: str) -> str:
        return (
            f"SELECT c.src, c.dst, "
            f"{d_dot('s.vec', 'd.vec')} / (s.norm * d.norm) AS cosine "
            f"FROM {tbl} c "
            f"JOIN normed s ON s.vec_id = c.src "
            f"JOIN normed d ON d.vec_id = c.dst"
        )

    def topk(tbl: str) -> str:
        return (
            f"SELECT src, dst, cosine FROM ("
            f"SELECT *, ROW_NUMBER() OVER (PARTITION BY src "
            f"ORDER BY cosine DESC, dst) AS rank FROM {tbl}"
            f") WHERE rank <= {k}"
        )

    parts = [
        f"base AS (SELECT vec_id, {D_VEC} AS vec FROM embeddings)",
        f"normed AS (SELECT vec_id, vec, sqrt({d_dot('vec', 'vec')}) "
        "AS norm FROM base)",
        "nn AS (SELECT count(*) AS n FROM base)",
        f"""seeds AS (
  SELECT DISTINCT src, (src + 1 + {seed_h} % (nn.n - 1)) % nn.n AS dst
  FROM (SELECT vec_id AS src FROM base) CROSS JOIN nn
  CROSS JOIN (SELECT unnest(generate_series(1, {k})) AS j)
)""",
        f"s0 AS ({score('seeds')})",
        f"e0 AS ({topk('s0')})",
    ]
    for t in range(1, rounds + 1):
        p = t - 1
        parts.append(
            f"""und{t} AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e{p}
    UNION ALL SELECT dst AS src, src AS dst FROM e{p}
  )
)"""
        )
        parts.append(
            f"""cand{t} AS (
  SELECT DISTINCT l.src, r.dst
  FROM und{t} l JOIN und{t} r ON l.dst = r.src
  WHERE l.src <> r.dst
  EXCEPT SELECT src, dst FROM e{p}
)"""
        )
        parts.append(f"sc{t} AS ({score(f'cand{t}')})")
        parts.append(
            f"pool{t} AS (SELECT src, dst, cosine FROM e{p} "
            f"UNION ALL SELECT src, dst, cosine FROM sc{t})"
        )
        parts.append(f"e{t} AS ({topk(f'pool{t}')})")
    parts.append(
        f"""exact AS (
  SELECT src, dst FROM (
    SELECT q.vec_id AS src, b.vec_id AS dst,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY {d_dot('q.vec', 'b.vec')} / (q.norm * b.norm) DESC,
                      b.vec_id) AS rank
    FROM normed q JOIN normed b ON b.vec_id <> q.vec_id
    WHERE q.vec_id < {n_eval}
  ) WHERE rank <= {k}
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT e.src, CAST(count(g.dst) AS BIGINT) AS n_hits,
       round(CAST(count(g.dst) AS DOUBLE) / {float(k)!r}, 6) AS recall
FROM exact e
LEFT JOIN (SELECT src, dst FROM e{rounds} WHERE src < {n_eval}) g
  ON g.src = e.src AND g.dst = e.dst
GROUP BY e.src
"""
    )


EXTRA_QUERIES["knn_graph_recall"] = q_knn_graph_recall
EXTRA_ORACLES["knn_graph_recall"] = _knn_graph_sql()


def q_perplexity_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet perplexity binning through the gate (analytics/lm.py
    perplexity_bins — Wenzek et al. 2020): per-language equal-depth
    terciles of self-trained bigram-LM perplexity (head / middle /
    tail), ntile ordered by the 6-dp ROUNDED perplexity + doc_id so a
    last-ulp float difference cannot flip a bin boundary between
    engines. The oracle replays the LM and the same NTILE."""
    from audit_star_spark.analytics.lm import perplexity_bins

    return perplexity_bins(
        load_table(spark, sf_dir, "documents"), n_bins=3, mode="distributed"
    )


def _perplexity_bins_sql(n_bins: int = 3) -> str:
    from audit_star_spark.analytics.lm import perplexity_sql

    return f"""
WITH px AS ({perplexity_sql('documents', 'text')}),
scored AS (
  SELECT d.doc_id, d.lang, round(px.perplexity, 6) AS ppl6
  FROM documents d JOIN px ON px.doc_id = d.doc_id
  WHERE px.avg_nll IS NOT NULL
),
binned AS (
  SELECT lang, ppl6,
         NTILE({n_bins}) OVER (PARTITION BY lang
                               ORDER BY ppl6, doc_id) AS bin
  FROM scored
)
SELECT lang, CAST(bin AS INT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(ppl6) AS ppl_min, max(ppl6) AS ppl_max
FROM binned GROUP BY lang, bin
"""


EXTRA_QUERIES["perplexity_bins"] = q_perplexity_bins
EXTRA_ORACLES["perplexity_bins"] = _perplexity_bins_sql()


def q_ngram_dup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram duplication profile through the gate
    (analytics/text.py ngram_dup_profile): tokens vs distinct types per
    n-gram order 1..3 and the duplicate fraction — the corpus-level
    repetition number dedup passes are judged against. Exact integer
    counts; the fraction is one exact division rounded at 9 dp."""
    from audit_star_spark.analytics.text import ngram_dup_profile

    return ngram_dup_profile(
        load_table(spark, sf_dir, "documents"), max_n=3
    ).select(
        "n", "n_tokens", "n_types",
        F.round("dup_fraction", 9).alias("dup_fraction"),
    )


def _ngram_dup_sql(max_n: int = 3) -> str:
    parts = []
    for n in range(1, max_n + 1):
        if n == 1:
            g = "unnest(toks)"
            src = f"SELECT {g} AS g FROM tl"
        else:
            joined = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n))
            src = (
                f"SELECT {joined} AS g FROM tl, LATERAL "
                f"(SELECT unnest(generate_series(1, len(toks) - {n - 1})) AS i) s "
                f"WHERE len(toks) >= {n}"
            )
        parts.append(
            f"SELECT {n} AS n, CAST(count(*) AS BIGINT) AS n_tokens, "
            f"CAST(count(DISTINCT g) AS BIGINT) AS n_types, "
            f"round(CASE WHEN count(*) > 0 THEN "
            f"(count(*) - count(DISTINCT g)) / CAST(count(*) AS DOUBLE) "
            f"ELSE 0.0 END, 9) AS dup_fraction "
            f"FROM ({src})"
        )
    u = "\nUNION ALL\n".join(parts)
    return f"""
WITH tl AS (SELECT {D_TOKENS} AS toks FROM documents)
{u}
"""


EXTRA_QUERIES["ngram_dup_profile"] = q_ngram_dup_profile
EXTRA_ORACLES["ngram_dup_profile"] = _ngram_dup_sql()


def q_kmeans_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lightweight k-means coreset through the gate
    (analytics/similarity.py kmeans_lightweight_coreset — Bachem et
    al. 2018): sensitivity probabilities q(x) = 1/2N + d^2/(2*sum d^2)
    around the corpus mean, deterministic ES top-64 draw, importance
    weights 1/(m q). The oracle replays the mean fold, the distances,
    the probabilities, the md5 sample keys and the same top-m."""
    from audit_star_spark.analytics.similarity import (
        kmeans_lightweight_coreset,
    )

    r = kmeans_lightweight_coreset(
        load_table(spark, sf_dir, "embeddings"), m=64
    )
    return r.select(
        "vec_id", "label",
        F.round("q", 9).alias("q"),
        F.round("weight", 6).alias("weight"),
    )


def _kmeans_coreset_sql(m: int = 64, salt: str = "lwcs") -> str:
    fold = d_fold(
        "list_sort(list(x))", "CAST(0.0 AS DOUBLE)", "(s, v) -> s + v"
    )
    fold_d2 = d_fold(
        "list_sort(list(d2))", "CAST(0.0 AS DOUBLE)", "(s, v) -> s + v"
    )
    return f"""
WITH base AS (
  SELECT vec_id, label, {D_VEC} AS vec FROM embeddings
),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM base),
dims AS (
  SELECT i, x FROM (
    SELECT unnest(vec) AS x,
           unnest(generate_series(1, len(vec))) AS i
    FROM base
  )
),
mean0 AS (
  SELECT i, {fold} / nn.n AS mu FROM dims CROSS JOIN nn GROUP BY i, nn.n
),
ml AS (
  SELECT list_transform(list_sort(list(struct_pack(i := i, mu := mu))),
                        x -> x.mu) AS ml
  FROM mean0
),
d2s AS (
  SELECT vec_id, label,
         {d_fold("list_transform(list_zip(vec, ml.ml), z -> (z[1] - z[2]) * (z[1] - z[2]))", "CAST(0.0 AS DOUBLE)", "(s, v) -> s + v")} AS d2
  FROM base CROSS JOIN ml
),
tot AS (SELECT {fold_d2} AS s FROM d2s),
scored AS (
  SELECT vec_id, label,
         0.5 / nn.n + 0.5 * d2 / tot.s AS q
  FROM d2s CROSS JOIN tot CROSS JOIN nn
),
keyed AS (
  SELECT *,
    pow((('0x' || substr(md5(CAST(vec_id AS VARCHAR) || ':{salt}'), 1, 15))
          ::BIGINT + 1.0) / 1152921504606846977.0, 1.0 / q) AS k
  FROM scored
)
SELECT vec_id, label, round(q, 9) AS q,
       round(1.0 / ({float(m)!r} * q), 6) AS weight
FROM keyed ORDER BY k DESC, vec_id LIMIT {m}
"""


EXTRA_QUERIES["kmeans_coreset"] = q_kmeans_coreset
EXTRA_ORACLES["kmeans_coreset"] = _kmeans_coreset_sql()


def q_robust_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric median of the embedding corpus through the gate
    (analytics/robust.py — smoothed Weiszfeld, 3 fixed steps from the
    mean): per-dimension mean vs geometric median and the outlier
    ``drag`` between them. +,-,*,/ and sqrt only, so the oracle
    replays the mean start and every iteration (same folds, same
    epsilon floor)."""
    from audit_star_spark.analytics.robust import robust_center_report

    return robust_center_report(
        load_table(spark, sf_dir, "embeddings"), n_iter=3
    ).select(
        "dim",
        F.round("mean", 9).alias("mean"),
        F.round("gmedian", 9).alias("gmedian"),
        F.round("drag", 9).alias("drag"),
    )


def _robust_center_sql(n_iter: int = 3, eps: float = 1e-12) -> str:
    fold = lambda xs: d_fold(  # noqa: E731
        f"list_sort(list({xs}))", "CAST(0.0 AS DOUBLE)", "(s, v) -> s + v"
    )
    parts = [
        f"base AS (SELECT vec_id, {D_VEC} AS vec FROM embeddings)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM base)",
        """dims0 AS (
  SELECT i, x FROM (
    SELECT unnest(vec) AS x,
           unnest(generate_series(1, len(vec))) AS i
    FROM base
  )
)""",
        f"""m0 AS (
  SELECT i, {fold('x')} / nn.n AS m FROM dims0 CROSS JOIN nn GROUP BY i, nn.n
)""",
        """c0 AS (
  SELECT list_transform(list_sort(list(struct_pack(i := i, m := m))),
                        s -> s.m) AS gm
  FROM m0
)""",
    ]
    dist = d_fold(
        "list_transform(list_zip(vec, gm), z -> (z[1] - z[2]) * (z[1] - z[2]))",
        "CAST(0.0 AS DOUBLE)",
        "(s, v) -> s + v",
    )
    for t in range(1, n_iter + 1):
        p = t - 1
        parts.append(
            f"""d{t} AS (
  SELECT vec, greatest(sqrt({dist}), {eps!r}) AS d
  FROM base CROSS JOIN c{p}
)"""
        )
        parts.append(
            f"""t{t} AS (
  SELECT i, xd, 1.0 / d AS w FROM (
    SELECT unnest(list_transform(vec, x -> x / d)) AS xd,
           unnest(generate_series(1, len(vec))) AS i,
           d
    FROM d{t}
  )
)"""
        )
        parts.append(
            f"n{t} AS (SELECT i, {fold('xd')} AS nu FROM t{t} GROUP BY i)"
        )
        parts.append(
            f"e{t} AS (SELECT {fold('w')} AS de FROM t{t} WHERE i = 1)"
        )
        parts.append(
            f"""c{t} AS (
  SELECT list_transform(list_sort(list(struct_pack(i := i, g := g))),
                        s -> s.g) AS gm
  FROM (SELECT n{t}.i, n{t}.nu / e{t}.de AS g FROM n{t} CROSS JOIN e{t})
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(d.i - 1 AS INT) AS dim,
       round(m0s.gm[d.i], 9) AS mean,
       round(c{n_iter}.gm[d.i], 9) AS gmedian,
       round(m0s.gm[d.i] - c{n_iter}.gm[d.i], 9) AS drag
FROM (SELECT unnest(generate_series(1, 64)) AS i) d
CROSS JOIN c0 m0s CROSS JOIN c{n_iter}
"""
    )


EXTRA_QUERIES["robust_center"] = q_robust_center
EXTRA_ORACLES["robust_center"] = _robust_center_sql()


def q_suffix_dup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-array repetition profile through the gate
    (analytics/suffix.py — Manber-Myers prefix doubling over the token
    suffixes): at each span h = 1, 2, 4, 8, 16, how many suffixes share
    their first-h tokens (and in how many duplicated groups) — the
    all-k repetition view fixed-k shingles cannot give. The oracle is
    definitionally INDEPENDENT: it regroups suffixes by their literal
    first-h token slices per h, never running the doubling — the
    doubling ranks and slice equality must coincide exactly."""
    from audit_star_spark.analytics.suffix import suffix_dup_profile

    return suffix_dup_profile(
        load_table(spark, sf_dir, "documents"), max_h=16, mode="distributed"
    )


def _suffix_dup_sql(max_h: int = 16) -> str:
    hs = []
    h = 1
    while h <= max_h:
        hs.append(h)
        h *= 2
    parts = []
    for h in hs:
        parts.append(
            f"""SELECT CAST({h} AS INT) AS h,
       CAST(coalesce(sum(c), 0) AS BIGINT) AS n_dup_suffixes,
       CAST(count(*) AS BIGINT) AS n_dup_groups
FROM (
  SELECT count(*) AS c FROM (
    SELECT array_to_string(
             list_slice(toks, pos, least(pos + {h} - 1, len(toks))), ' ')
           AS key
    FROM suf
  ) GROUP BY key HAVING count(*) > 1
)"""
        )
    u = "\nUNION ALL\n".join(parts)
    return f"""
WITH tl AS (SELECT doc_id, {D_TOKENS} AS toks FROM documents),
suf AS (
  SELECT doc_id, i AS pos, toks
  FROM tl, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) s
)
{u}
"""


EXTRA_QUERIES["suffix_dup_profile"] = q_suffix_dup_profile
EXTRA_ORACLES["suffix_dup_profile"] = _suffix_dup_sql()


def q_longest_repeated_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest repeated token run through the gate
    (analytics/suffix.py longest_repeated_run — the suffix-array
    classic: the answer is the max LCP of suffixes adjacent in suffix
    order). The oracle is definitionally INDEPENDENT: it sorts the
    literal suffixes, takes each adjacent pair's token LCP and the
    same (length desc, run asc) argmax — no prefix doubling anywhere
    in the oracle.

    Cost note (gate-heavy, not weak): ~log2(longest doc) doubling
    rounds, each a handful of small shuffles — at toy scale the wall
    clock is Spark job-scheduling overhead (~26 s at sf0.1), not
    compute; at real scale the same plan is the only known shape that
    avoids both N^2 pairs and a single-partition rank (the mode
    switch + plan lock in tests/test_suffix.py)."""
    from audit_star_spark.analytics.suffix import longest_repeated_run

    return longest_repeated_run(
        load_table(spark, sf_dir, "documents"), mode="distributed"
    )


SQL_LONGEST_RUN = f"""
WITH tl AS (SELECT doc_id, {D_TOKENS} AS toks FROM documents),
strs AS (
  SELECT list_slice(toks, i, len(toks)) AS stoks
  FROM tl, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) s
),
ordered AS (
  SELECT stoks,
         row_number() OVER (ORDER BY array_to_string(stoks, ' ')) AS rn
  FROM strs
),
pairs AS (
  SELECT a.stoks AS x, b.stoks AS y
  FROM ordered a JOIN ordered b ON b.rn = a.rn + 1
),
lcps AS (
  SELECT CASE WHEN list_position(
                list_transform(list_zip(x, y),
                               z -> z[1] IS DISTINCT FROM z[2]), true)
              IS NULL
         THEN least(len(x), len(y))
         ELSE list_position(
                list_transform(list_zip(x, y),
                               z -> z[1] IS DISTINCT FROM z[2]), true) - 1
         END AS l,
         x
  FROM pairs
),
best AS (
  SELECT CAST(l AS INT) AS run_len,
         array_to_string(list_slice(x, 1, l), ' ') AS run
  FROM lcps WHERE l > 0
  ORDER BY l DESC, run ASC LIMIT 1
)
SELECT best.run_len, best.run,
       (SELECT CAST(count(*) AS BIGINT) FROM strs
        WHERE len(stoks) >= best.run_len
          AND array_to_string(list_slice(stoks, 1, best.run_len), ' ')
              = best.run) AS n_occurrences
FROM best
"""


EXTRA_QUERIES["longest_repeated_run"] = q_longest_repeated_run
EXTRA_ORACLES["longest_repeated_run"] = SQL_LONGEST_RUN


# ---------------------------------------------- round-12 rotation candidates
# The 13 round-11 additions are gate-sim + pytest-oracle-locked
# (GATESIM_r11.log: full list OK at sf0.01) but have no hard driver
# CORRECTNESS row yet. Next round, mirror _R11_ROTATE_IN/_OUT above:
# rotate IN dsir_selection, doremi_mixture, winnow_near_dups,
# mp3_l3_samples_census, matryoshka_recall, cluster_balanced_sample,
# knn_graph_recall, perplexity_bins, kmeans_coreset, ngram_dup_profile,
# robust_center, suffix_dup_profile, longest_repeated_run; retire 13
# double-green (r10+r11) entries to EXTRA where the parity lock keeps
# them oracle-checked every pytest run.


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-exponent corpus health check through the gate
    (analytics/text.py zipf_fit): OLS of ln(freq) on ln(rank) over the
    top-100 tokens. Tie permutations inside a frequency level cannot
    change the sums (tied tokens share y), and the top-k boundary
    breaks ties by token in BOTH engines, so the fit is deterministic
    cross-engine."""
    from audit_star_spark.analytics.text import zipf_fit

    return zipf_fit(load_table(spark, sf_dir, "documents"), top_k=100).select(
        "n_tokens", "vocab",
        F.round("zipf_alpha", 9).alias("zipf_alpha"),
        F.round("r2", 9).alias("r2"),
    )


def _zipf_sql(top_k: int = 100) -> str:
    fold = lambda xs: d_fold(  # noqa: E731
        f"list_sort(list({xs}))", "CAST(0.0 AS DOUBLE)", "(s, v) -> s + v"
    )
    return f"""
WITH tok AS (SELECT unnest({D_TOKENS}) AS tok FROM documents),
counts AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
totals AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS vocab
  FROM counts
),
top AS (
  SELECT CAST(c AS DOUBLE) AS c FROM counts
  ORDER BY c DESC, tok LIMIT {top_k}
),
xy AS (
  SELECT ln(CAST(row_number() OVER (ORDER BY c DESC) AS DOUBLE)) AS x,
         ln(c) AS y
  FROM top
),
s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         {fold('x')} AS sx, {fold('y')} AS sy,
         {fold('x * x')} AS sxx, {fold('x * y')} AS sxy,
         {fold('y * y')} AS syy
  FROM xy
)
SELECT totals.n_tokens, totals.vocab,
       round(-(s.n * s.sxy - s.sx * s.sy)
              / (s.n * s.sxx - s.sx * s.sx), 9) AS zipf_alpha,
       round(((s.n * s.sxy - s.sx * s.sy) * (s.n * s.sxy - s.sx * s.sy))
              / ((s.n * s.sxx - s.sx * s.sx)
                 * (s.n * s.syy - s.sy * s.sy)), 9) AS r2
FROM totals CROSS JOIN s
"""


EXTRA_QUERIES["zipf_fit"] = q_zipf_fit
EXTRA_ORACLES["zipf_fit"] = _zipf_sql()


# ----------------------------------------------------- round-12 rotation
# The 14 round-11 additions (gate-sim + pytest-oracle-locked,
# GATESIM_r11.log full list OK at sf0.01, but never driver-certified)
# move into the 50-slot window to earn hard CORRECTNESS_r12 rows; 14
# double-green entries (driver-green in BOTH r10 and r11) retire to
# EXTRA, where tests/test_oracle_parity.py keeps them oracle-locked on
# every pytest run. Window stays 8 audit + 42 analytics.
_R12_ROTATE_IN = [
    "dsir_selection",
    "doremi_mixture",
    "winnow_near_dups",
    "mp3_l3_samples_census",
    "matryoshka_recall",
    "cluster_balanced_sample",
    "knn_graph_recall",
    "perplexity_bins",
    "kmeans_coreset",
    "ngram_dup_profile",
    "robust_center",
    "suffix_dup_profile",
    "longest_repeated_run",
    "zipf_fit",
]
_R12_ROTATE_OUT = [
    "ivf_index_probe",
    "pq_topk_recall",
    "ivfpq_probe_recall",
    "ivfpq_rerank",
    "hll_event_users",
    "kmv_audience_overlap",
    "cms_event_counts",
    "price_quantiles_hdr",
    "weighted_price_quantiles",
    "bloom_prefilter_stats",
    "flac_meta",
    "gif_anim_census",
    "y4m_census",
    "g711_census",
]
for _name in _R12_ROTATE_OUT:
    EXTRA_QUERIES[_name] = ANALYTICS_QUERIES.pop(_name)
    EXTRA_ORACLES[_name] = ANALYTICS_ORACLES.pop(_name)
for _name in _R12_ROTATE_IN:
    ANALYTICS_QUERIES[_name] = EXTRA_QUERIES.pop(_name)
    ANALYTICS_ORACLES[_name] = EXTRA_ORACLES.pop(_name)

if len(ANALYTICS_QUERIES) != 42:  # driver gate window: 8 audit + 42 analytics
    raise RuntimeError(
        "ANALYTICS_QUERIES must stay exactly 42 entries so the driver's "
        f"50-slot correctness window is stable; got {len(ANALYTICS_QUERIES)}"
    )
del _name


# ------------------------------------------------ round-12 additions (EXTRA)
def q_suffix_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-rank-driven exact-substring dedup with removal through
    the gate (analytics/dedup.py suffix_dedup_rewrite): window identity
    from the prefix-doubling rank pair (collision-free, O(1) per
    window) instead of md5 window hashes; same keep-first + span-merge
    + rewrite semantics as substring_dedup_rewrite. The oracle is
    definitionally INDEPENDENT of the doubling: it groups windows by
    the LITERAL k-token slice string — rank-pair equality and literal
    slice equality must coincide exactly."""
    return dedup.suffix_dedup_rewrite(
        load_table(spark, sf_dir, "documents"), min_len=8, mode="distributed"
    )


def _suffix_dedup_sql(k: int = 8) -> str:
    key = f"array_to_string(list_slice(toks, pos + 1, pos + {k}), ' ')"
    return f"""
WITH base AS (
  SELECT doc_id, {D_TOKENS} AS toks FROM documents
),
wins AS (
  SELECT doc_id, unnest(generate_series(0, len(toks) - {k})) AS pos, toks
  FROM base WHERE len(toks) >= {k}
),
keyed AS (
  SELECT doc_id, pos, {key} AS key FROM wins
),
removed AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           ROW_NUMBER() OVER (PARTITION BY key ORDER BY doc_id, pos) AS rn
    FROM keyed
  ) WHERE rn > 1
),
marked AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                OR pos > lag(pos) OVER w + {k} THEN 1 ELSE 0 END AS new_span
  FROM removed
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sp AS (
  SELECT doc_id, pos,
         SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
  FROM marked
),
spans AS (
  SELECT doc_id, span_id, MIN(pos) AS s, MAX(pos) + {k} AS e
  FROM sp GROUP BY 1, 2
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
         CAST(SUM(e - s) AS BIGINT) AS n_removed_tokens,
         list(struct_pack(s := s, e := e)) AS spans
  FROM spans GROUP BY 1
)
SELECT b.doc_id,
       CAST(len(b.toks) AS BIGINT) AS n_tokens,
       COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
       COALESCE(p.n_removed_tokens, 0) AS n_removed_tokens,
       round(COALESCE(p.n_removed_tokens, 0) / CAST(len(b.toks) AS DOUBLE), 6)
         AS removed_fraction,
       -- COALESCE: DuckDB's array_to_string([]) is NULL, Spark's
       -- array_join(empty) is '' — a fully-removed doc must hash ''
       md5(COALESCE(array_to_string(
         CASE WHEN p.spans IS NULL THEN b.toks
              ELSE list_filter(b.toks, (t, i) -> len(list_filter(p.spans,
                     sp -> i - 1 >= sp.s AND i - 1 < sp.e)) = 0) END,
         ' '), '')) AS clean_md5
FROM base b LEFT JOIN per_doc p USING (doc_id)
"""


EXTRA_QUERIES["suffix_dedup_rewrite"] = q_suffix_dedup_rewrite
EXTRA_ORACLES["suffix_dedup_rewrite"] = _suffix_dedup_sql()


def q_c4_line_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 structural line cleaner through the gate (analytics/quality.py
    c4_line_clean — Raffel et al. 2020 §2.2): terminal-punctuation +
    min-words line filter, min-lines / blocklist page drop, rewritten-
    text md5. The synthetic documents carry no line structure, so the
    gate SYNTHESIZES deterministic pages from the token stream (the
    codec-census pattern): line length 4 + doc_id % 4 tokens (so the
    4-word docs exercise the word-count drop), a '.' terminal on lines
    where (doc_id + i) % 3 != 0 (so ~1/3 of lines fail the terminal
    rule), 'lorem ipsum' appended when doc_id % 97 == 0, a '{' line
    when doc_id % 89 == 0 (the page-level blocklist branches), and a
    well-formed line containing 'javascript' when doc_id % 83 == 0
    (it passes word-count + terminal but the §2.2 line-blockword rule
    must drop it). The oracle restates synthesis AND rules in DuckDB."""
    from audit_star_spark.analytics.quality import c4_line_clean

    docs = load_table(spark, sf_dir, "documents")
    line_expr = (
        "array_join(transform(sequence(0, CAST((size(__t) + __l - 1) DIV __l "
        "AS INT) - 1), i -> concat(array_join(slice(__t, i * __l + 1, __l), "
        "' '), CASE WHEN (doc_id + i) % 3 != 0 THEN '.' ELSE '' END)), "
        "'\\n')"
    )
    pages = (
        docs.select("doc_id", F.expr(text.TOKENS_EXPR).alias("__t"))
        .withColumn("__l", (F.lit(4) + F.col("doc_id") % 4).cast("int"))
        .filter(F.size("__t") >= 1)
        .select(
            "doc_id",
            F.concat(
                F.expr(line_expr),
                F.when(F.col("doc_id") % 97 == 0, F.lit("\nlorem ipsum"))
                .otherwise(F.lit("")),
                F.when(F.col("doc_id") % 89 == 0, F.lit("\nx { y"))
                .otherwise(F.lit("")),
                F.when(
                    F.col("doc_id") % 83 == 0,
                    F.lit("\nplease click to enable JavaScript support."),
                ).otherwise(F.lit("")),
            ).alias("page"),
        )
    )
    return c4_line_clean(pages)


SQL_C4_LINE_CLEAN = f"""
WITH tl AS (
  SELECT doc_id, {D_TOKENS} AS t, 4 + doc_id % 4 AS l FROM documents
  WHERE len({D_TOKENS}) >= 1
),
pages AS (
  SELECT doc_id,
         array_to_string(
           list_transform(generate_series(0, CAST((len(t) + l - 1) // l AS INT) - 1),
             i -> array_to_string(list_slice(t, i * l + 1, i * l + l), ' ')
                  || CASE WHEN (doc_id + i) % 3 != 0 THEN '.' ELSE '' END),
           chr(10))
         || CASE WHEN doc_id % 97 = 0 THEN chr(10) || 'lorem ipsum' ELSE '' END
         || CASE WHEN doc_id % 89 = 0 THEN chr(10) || 'x {{ y' ELSE '' END
         || CASE WHEN doc_id % 83 = 0
                 THEN chr(10) || 'please click to enable JavaScript support.'
                 ELSE '' END
         AS page
  FROM tl
),
scored AS (
  SELECT doc_id,
         CAST(len(string_split(page, chr(10))) AS BIGINT) AS n_lines,
         list_filter(string_split(page, chr(10)),
           x -> len(regexp_split_to_array(trim(x), '\\s+')) >= 5
                AND right(rtrim(x), 1) IN ('.', '!', '?', '"')
                AND NOT contains(lower(x), 'javascript')) AS kl,
         (contains(lower(page), 'lorem ipsum') OR contains(lower(page), '{{'))
           AS blocked
  FROM pages
)
SELECT doc_id, n_lines,
       CAST(len(kl) AS BIGINT) AS n_kept_lines,
       (NOT blocked AND len(kl) >= 5) AS kept,
       CASE WHEN blocked THEN 'blocklist'
            WHEN len(kl) < 5 THEN 'too_few_lines' END AS drop_reason,
       CASE WHEN NOT blocked AND len(kl) >= 5
            THEN md5(COALESCE(array_to_string(kl, chr(10)), '')) END
         AS clean_md5
FROM scored
"""


EXTRA_QUERIES["c4_line_clean"] = q_c4_line_clean
EXTRA_ORACLES["c4_line_clean"] = SQL_C4_LINE_CLEAN


def q_incontext_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-Context Pretraining semantic batch ordering through the gate
    (analytics/similarity.py incontext_order — Shi et al. 2024): the
    cluster-major traversal with gapless positions, run on the
    distributed (no-corpus-window) path. The oracle replays the
    broadcast argmax (same tie-break), the 6-dp rounded similarity and
    the (cell, -sim6, vec_id) row numbering."""
    from audit_star_spark.analytics.similarity import incontext_order

    return incontext_order(
        load_table(spark, sf_dir, "embeddings"), n_cells=16,
        mode="distributed",
    )


def _incontext_sql(n_cells: int = 16) -> str:
    return f"""
WITH base AS (
  SELECT vec_id, {D_VEC} AS vec FROM embeddings
),
normed AS (
  SELECT vec_id, vec, sqrt({d_dot('vec', 'vec')}) AS norm FROM base
),
cents AS (
  SELECT vec_id AS cell_id, vec AS cvec, norm AS cnorm
  FROM normed WHERE vec_id < {n_cells}
),
assigned AS (
  SELECT vec_id, cell_id, round(ccos, 6) AS sim6 FROM (
    SELECT b.vec_id, c.cell_id,
           {d_dot('c.cvec', 'b.vec')} / (c.cnorm * b.norm) AS ccos,
           ROW_NUMBER() OVER (
             PARTITION BY b.vec_id
             ORDER BY {d_dot('c.cvec', 'b.vec')} / (c.cnorm * b.norm) DESC,
                      c.cell_id) AS crank
    FROM normed b CROSS JOIN cents c
  ) WHERE crank = 1
)
SELECT vec_id, cell_id, sim6,
       CAST(ROW_NUMBER() OVER (ORDER BY cell_id, -sim6, vec_id) AS BIGINT)
         AS position
FROM assigned
"""


EXTRA_QUERIES["incontext_order"] = q_incontext_order
EXTRA_ORACLES["incontext_order"] = _incontext_sql()


# ---------------------------------------------- round-13 rotation (executed)
# The 4 round-12 additions (suffix_dedup_rewrite,
# suffix_decontaminate_rewrite, c4_line_clean, incontext_order) were
# gate-sim green (GATESIM_r12.log: 196/196 OK + addendum at sf0.01) and
# pytest-oracle-locked but had no hard driver CORRECTNESS row; the
# _R13_ROTATE block at the bottom of this module moves them into the
# 50-slot window and retires 4 double-green (r11+r12) entries to EXTRA.


def q_suffix_decontaminate_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-rank benchmark scrubbing through the gate
    (analytics/dedup.py suffix_decontaminate_rewrite): same probe set
    as decontaminate_rewrite (doc_id % 97 == 0), window identity from
    the prefix-doubling rank pair over the corpus+probe union instead
    of md5 hashes. The oracle is INDEPENDENT of the doubling: it
    groups windows by the literal k-token slice string."""
    docs = load_table(spark, sf_dir, "documents")
    probes = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("probe_id"), "text"
    )
    return dedup.suffix_decontaminate_rewrite(
        docs, probes, min_len=8, mode="distributed"
    )


def _suffix_decontaminate_sql(k: int = 8) -> str:
    key = f"array_to_string(list_slice(toks, pos + 1, pos + {k}), ' ')"
    return f"""
WITH base AS (
  SELECT doc_id, {D_TOKENS} AS toks FROM documents
),
wins AS (
  SELECT doc_id, unnest(generate_series(0, len(toks) - {k})) AS pos, toks
  FROM base WHERE len(toks) >= {k}
),
keyed AS (
  SELECT doc_id, pos, {key} AS key FROM wins
),
probe_k AS (
  SELECT DISTINCT key FROM keyed WHERE doc_id % 97 = 0
),
removed AS (
  SELECT w.doc_id, w.pos FROM keyed w JOIN probe_k USING (key)
),
marked AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                OR pos > lag(pos) OVER w + {k} THEN 1 ELSE 0 END AS new_span
  FROM removed
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sp AS (
  SELECT doc_id, pos,
         SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
  FROM marked
),
spans AS (
  SELECT doc_id, span_id, MIN(pos) AS s, MAX(pos) + {k} AS e
  FROM sp GROUP BY 1, 2
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
         CAST(SUM(e - s) AS BIGINT) AS n_removed_tokens,
         list(struct_pack(s := s, e := e)) AS spans
  FROM spans GROUP BY 1
)
SELECT b.doc_id,
       CAST(len(b.toks) AS BIGINT) AS n_tokens,
       COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
       COALESCE(p.n_removed_tokens, 0) AS n_removed_tokens,
       round(COALESCE(p.n_removed_tokens, 0) / CAST(len(b.toks) AS DOUBLE), 6)
         AS removed_fraction,
       md5(COALESCE(array_to_string(
         CASE WHEN p.spans IS NULL THEN b.toks
              ELSE list_filter(b.toks, (t, i) -> len(list_filter(p.spans,
                     sp -> i - 1 >= sp.s AND i - 1 < sp.e)) = 0) END,
         ' '), '')) AS clean_md5
FROM base b LEFT JOIN per_doc p USING (doc_id)
"""


EXTRA_QUERIES["suffix_decontaminate_rewrite"] = q_suffix_decontaminate_rewrite
EXTRA_ORACLES["suffix_decontaminate_rewrite"] = _suffix_decontaminate_sql()


# ----------------------------------------------------- round-13 rotation
# The 4 round-12 additions (gate-sim + pytest-oracle-locked,
# GATESIM_r12.log 196/196 OK + suffix_decontaminate_rewrite addendum at
# sf0.01, but never driver-certified) move into the 50-slot window to
# earn hard CORRECTNESS_r13 rows; 4 double-green entries (driver-green
# in BOTH r11 and r12) retire to EXTRA, where
# tests/test_oracle_parity.py keeps them oracle-locked on every pytest
# run. Window stays 8 audit + 42 analytics.
_R13_ROTATE_IN = [
    "suffix_dedup_rewrite",
    "suffix_decontaminate_rewrite",
    "c4_line_clean",
    "incontext_order",
]
_R13_ROTATE_OUT = [
    "mp3_l1_census",
    "mp3_l2_census",
    "audio_spectral_census",
    "doc_triangles",
]
for _name in _R13_ROTATE_OUT:
    EXTRA_QUERIES[_name] = ANALYTICS_QUERIES.pop(_name)
    EXTRA_ORACLES[_name] = ANALYTICS_ORACLES.pop(_name)
for _name in _R13_ROTATE_IN:
    ANALYTICS_QUERIES[_name] = EXTRA_QUERIES.pop(_name)
    ANALYTICS_ORACLES[_name] = EXTRA_ORACLES.pop(_name)

if len(ANALYTICS_QUERIES) != 42:  # driver gate window: 8 audit + 42 analytics
    raise RuntimeError(
        "ANALYTICS_QUERIES must stay exactly 42 entries so the driver's "
        f"50-slot correctness window is stable; got {len(ANALYTICS_QUERIES)}"
    )
del _name


# ------------------------------------------------ round-13 additions (EXTRA)
def q_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric n-gram containment near-dup pairs through the gate
    (analytics/dedup.py ngram_containment_pairs — Broder 1997's
    containment): C(A->B) = |A n B| / |A| catches the small-in-big
    inclusion Jaccard misses. The engine generates candidates with the
    asymmetric prefix filter (each doc's sorted-hash prefix probes the
    FULL inverted index); the oracle is definitionally INDEPENDENT of
    that filter — it joins on ANY shared shingle (complete for t > 0),
    so a prefix-completeness bug surfaces as missing rows."""
    return dedup.ngram_containment_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.8
    )


def _ngram_containment_sql(threshold: float = 0.8) -> str:
    return f"""
WITH docs_sh AS (
  SELECT doc_id,
         list_sort(list_distinct(list_transform({D_SHINGLES},
           s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % {dedup.MH_P}))) AS sset
  FROM documents
),
inv AS (SELECT doc_id, unnest(sset) AS sh FROM docs_sh),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
),
v AS (
  SELECT doc_a, doc_b,
         CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE)
           / len(sa.sset) AS c_ab,
         CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE)
           / len(sb.sset) AS c_ba
  FROM cand
  JOIN docs_sh sa ON sa.doc_id = doc_a
  JOIN docs_sh sb ON sb.doc_id = doc_b
)
SELECT doc_a, doc_b,
       c_ab AS containment_a_in_b,
       c_ba AS containment_b_in_a
FROM v WHERE greatest(c_ab, c_ba) >= {threshold}
"""


EXTRA_QUERIES["ngram_containment"] = q_ngram_containment
EXTRA_ORACLES["ngram_containment"] = _ngram_containment_sql()


def q_ngram_containment_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SKEW-GUARDED containment path (max_df stop-shingle cap) —
    the posture a 100 TB run must use. Unlike the exact-path gate,
    whose oracle is candidate-rule-independent (any-shared-shingle
    join), the df filter deliberately trades candidate completeness for
    a bounded join, so no independent oracle can exist: this oracle
    RESTATES the engine's candidate rule exactly (prefix slice probing
    a df<=max_df-filtered index) and certifies that the traded
    semantics are implemented as documented. max_df=5 bites at sf0.01
    (29 shingles carry df>5, max df 7), so the gate exercises the
    guarded code path, not a no-op cap."""
    return dedup.ngram_containment_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.8, max_df=5
    )


def _ngram_containment_capped_sql(threshold: float = 0.8, max_df: int = 5) -> str:
    return f"""
WITH docs_sh AS (
  SELECT doc_id,
         list_sort(list_distinct(list_transform({D_SHINGLES},
           s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % {dedup.MH_P}))) AS sset
  FROM documents
),
inv AS (SELECT doc_id, unnest(sset) AS sh FROM docs_sh),
-- the engine's co-partitioned stop-shingle guard: shingles with document
-- frequency > max_df leave the candidate INDEX only
keep AS (SELECT sh FROM inv GROUP BY sh HAVING count(*) <= {max_df}),
idx AS (SELECT i.doc_id, i.sh FROM inv i JOIN keep USING (sh)),
-- the engine's asymmetric prefix: first len - ceil(round(t*len, 9)) + 1
-- elements of the SORTED full set (prefix sliced from the FULL set,
-- only the probed index is df-filtered)
prefix AS (
  SELECT doc_id,
         unnest(list_slice(sset, 1,
           len(sset) - CAST(ceil(round({threshold} * len(sset), 9)) AS INT) + 1
         )) AS sh
  FROM docs_sh
),
cand AS (
  SELECT DISTINCT least(p.doc_id, i.doc_id) AS doc_a,
                  greatest(p.doc_id, i.doc_id) AS doc_b
  FROM prefix p JOIN idx i ON p.sh = i.sh AND p.doc_id <> i.doc_id
),
v AS (
  SELECT doc_a, doc_b,
         CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE)
           / len(sa.sset) AS c_ab,
         CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE)
           / len(sb.sset) AS c_ba
  FROM cand
  JOIN docs_sh sa ON sa.doc_id = doc_a
  JOIN docs_sh sb ON sb.doc_id = doc_b
)
SELECT doc_a, doc_b,
       c_ab AS containment_a_in_b,
       c_ba AS containment_b_in_a
FROM v WHERE greatest(c_ab, c_ba) >= {threshold}
"""


EXTRA_QUERIES["ngram_containment_capped"] = q_ngram_containment_capped
EXTRA_ORACLES["ngram_containment_capped"] = _ngram_containment_capped_sql()


def q_clip_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAION-style paired image-text alignment census through the gate
    (analytics/similarity.py clip_alignment_census — Schuhmann et al.
    2021's CLIP-score filtering). The synthetic corpus has one
    embedding table, so the gate SYNTHESIZES the paired frame the
    operator contracts on: consecutive ids pair up (even = image side,
    odd = caption side, the label riding with the image) — one
    equi-join of gate plumbing; the OPERATOR itself is join-free (one
    scan, in-row folds, label-domain groupBy). The oracle restates
    pairing, the explicit zero-norm NULL guard, and the census in
    DuckDB."""
    from audit_star_spark.analytics.similarity import (
        VEC_EXPR,
        clip_alignment_census,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    img = emb.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("pair_key"),
        "label",
        F.expr(VEC_EXPR).alias("img_vec"),
    )
    txt = emb.filter(F.col("vec_id") % 2 == 1).select(
        (F.col("vec_id") - 1).alias("pair_key"),
        F.expr(VEC_EXPR).alias("txt_vec"),
    )
    pairs = img.join(txt, "pair_key")
    return clip_alignment_census(pairs, threshold=0.28)


def _clip_alignment_sql(threshold: float = 0.28) -> str:
    ii = d_dot("img_vec", "img_vec")
    tt = d_dot("txt_vec", "txt_vec")
    it = d_dot("img_vec", "txt_vec")
    return f"""
WITH base AS (
  SELECT vec_id, label, {D_VEC} AS vec FROM embeddings
),
pairs AS (
  SELECT a.label AS label, a.vec AS img_vec, b.vec AS txt_vec
  FROM base a JOIN base b ON b.vec_id = a.vec_id + 1
  WHERE a.vec_id % 2 = 0
),
scored AS (
  -- explicit zero-norm NULL guard, mirroring the engine's CASE (never
  -- rides on an engine's division/NaN behavior)
  SELECT label,
         CASE WHEN sqrt({ii}) > 0 AND sqrt({tt}) > 0
              THEN {it} / (sqrt({ii}) * sqrt({tt})) END AS sim
  FROM pairs
)
SELECT label,
       count(*) AS n_pairs,
       count(sim) AS n_scored,
       CAST(sum(CASE WHEN sim >= {threshold} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_aligned,
       round(CAST(sum(CASE WHEN sim >= {threshold} THEN 1 ELSE 0 END)
                  AS BIGINT) / nullif(count(sim), 0), 6) AS frac_aligned6,
       round(avg(sim), 6) AS avg_sim6,
       round(min(sim), 6) AS min_sim6,
       round(max(sim), 6) AS max_sim6
FROM scored GROUP BY label
"""


EXTRA_QUERIES["clip_alignment"] = q_clip_alignment
EXTRA_ORACLES["clip_alignment"] = _clip_alignment_sql()


def q_packed_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence-packing census through the gate
    (analytics/text.py packed_chunk_census — the GPT-3-style loader
    layout): documents concatenate in doc_id order and split into
    512-token training chunks; per chunk, doc count, whole-doc count,
    boundary straddle flags, and the attention-contamination fraction.
    mode='distributed' exercises the prefix_sums two-pass scheme (no
    global running-sum window); the oracle restates the same packing
    with DuckDB's window cumsum — definitionally independent of the
    engine's partition-base mechanics."""
    return text.packed_chunk_census(
        load_table(spark, sf_dir, "documents"), seq_len=512, mode="distributed"
    )


def _packed_chunks_sql(seq_len: int = 512) -> str:
    return f"""
WITH lens AS (
  SELECT doc_id, CAST(len({D_TOKENS}) AS BIGINT) AS n_tokens
  FROM documents WHERE len({D_TOKENS}) > 0
),
off AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM lens
),
spans AS (
  SELECT doc_id, o, o + n_tokens AS e,
         unnest(generate_series(CAST(o // {seq_len} AS BIGINT),
                 CAST((o + n_tokens - 1) // {seq_len} AS BIGINT))) AS chunk_id
  FROM off
),
per AS (
  SELECT chunk_id,
         least(e, (chunk_id + 1) * {seq_len})
           - greatest(o, chunk_id * {seq_len}) AS tok,
         o >= chunk_id * {seq_len} AS starts,
         e <= (chunk_id + 1) * {seq_len} AS ends
  FROM spans
)
SELECT chunk_id,
       count(*) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS chunk_tokens,
       CAST(sum(CASE WHEN starts AND ends THEN 1 ELSE 0 END) AS BIGINT)
         AS n_whole_docs,
       max(CASE WHEN NOT starts THEN 1 ELSE 0 END) AS carry_in,
       max(CASE WHEN NOT ends THEN 1 ELSE 0 END) AS carry_out,
       round(CAST(sum(CASE WHEN NOT (starts AND ends) THEN tok ELSE 0 END)
                  AS DOUBLE) / sum(tok), 9) AS boundary_frac9
FROM per GROUP BY chunk_id
"""


EXTRA_QUERIES["packed_chunks"] = q_packed_chunks
EXTRA_ORACLES["packed_chunks"] = _packed_chunks_sql()


def q_sentence_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 three-sentence-span dedup through the gate
    (analytics/dedup.py sentence_span_dedup — Raffel et al. 2020 §2.2's
    'discarded all but one of any three-sentence span'). The synthetic
    documents carry no sentence structure, so the gate SYNTHESIZES
    deterministic pages: fixed 4-token lines with a '.' terminal —
    FIXED length so token runs shared across documents (the corpus has
    them; longest_repeated_run finds ~100-token runs) align into
    identical sentences and spans. The oracle restates synthesis AND
    rules, grouping spans by the LITERAL 3-sentence string
    (definitionally independent of the engine's md5 span keys)."""
    from audit_star_spark.analytics.dedup import sentence_span_dedup

    docs = load_table(spark, sf_dir, "documents")
    pages = (
        docs.select("doc_id", F.expr(text.TOKENS_EXPR).alias("__t"))
        .filter(F.size("__t") >= 1)
        .select(
            "doc_id",
            F.expr(
                "array_join(transform(sequence(0, "
                "CAST((size(__t) + 3) DIV 4 AS INT) - 1), "
                "i -> concat(array_join(slice(__t, i * 4 + 1, 4), ' '), '.')), "
                "'\\n')"
            ).alias("page"),
        )
    )
    return sentence_span_dedup(pages, span=3)


SQL_SENTENCE_SPAN_DEDUP = f"""
WITH tl AS (
  SELECT doc_id, {D_TOKENS} AS t FROM documents WHERE len({D_TOKENS}) >= 1
),
pages AS (
  SELECT doc_id,
         list_transform(generate_series(0, CAST((len(t) + 3) // 4 AS INT) - 1),
           i -> array_to_string(list_slice(t, i * 4 + 1, i * 4 + 4), ' ') || '.')
           AS sents
  FROM tl
),
spans AS (
  SELECT doc_id, unnest(generate_series(0, len(sents) - 3)) AS pos, sents
  FROM pages WHERE len(sents) >= 3
),
keyed AS (
  SELECT doc_id, pos,
         array_to_string(list_slice(sents, pos + 1, pos + 3), chr(10)) AS key
  FROM spans
),
removed AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           ROW_NUMBER() OVER (PARTITION BY key ORDER BY doc_id, pos) AS rn
    FROM keyed
  ) WHERE rn > 1
),
rem_idx AS (
  SELECT DISTINCT doc_id, idx FROM (
    SELECT doc_id, unnest(generate_series(pos, pos + 2)) AS idx FROM removed
  ) t
),
per_doc AS (
  SELECT doc_id, list_sort(list(idx)) AS ridx,
         CAST(count(*) AS BIGINT) AS n_removed
  FROM rem_idx GROUP BY doc_id
),
nd AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup FROM removed GROUP BY doc_id
)
SELECT p.doc_id,
       CAST(len(p.sents) AS BIGINT) AS n_sentences,
       COALESCE(nd.n_dup, 0) AS n_dup_spans,
       COALESCE(pd.n_removed, 0) AS n_removed_sentences,
       round(COALESCE(pd.n_removed, 0) / CAST(len(p.sents) AS DOUBLE), 6)
         AS removed_fraction,
       md5(COALESCE(
         CASE WHEN pd.ridx IS NULL THEN array_to_string(p.sents, chr(10))
              ELSE array_to_string(list_filter(p.sents,
                     (s, i) -> NOT list_contains(pd.ridx, i - 1)), chr(10))
         END, '')) AS clean_md5
FROM pages p LEFT JOIN nd USING (doc_id) LEFT JOIN per_doc pd USING (doc_id)
"""


EXTRA_QUERIES["sentence_span_dedup"] = q_sentence_span_dedup
EXTRA_ORACLES["sentence_span_dedup"] = SQL_SENTENCE_SPAN_DEDUP


def q_ccnet_disposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet pipeline verdict through the gate (analytics/lm.py
    ccnet_disposition — Wenzek et al. 2020): exact-dedup keep-first +
    langid + per-predicted-language perplexity terciles, one
    disposition per document with pipeline-order precedence
    (duplicate > unknown language > unscorable > bin). Runs the
    mode='distributed' cut (no corpus window). The oracle recomposes
    the three already-certified stage oracles (fingerprint fold, lang
    argmax cascade, bigram-LM perplexity) around a DuckDB NTILE."""
    from audit_star_spark.analytics.lm import ccnet_disposition

    return ccnet_disposition(
        load_table(spark, sf_dir, "documents"), n_bins=3, mode="distributed"
    )


def _ccnet_sql(n_bins: int = 3) -> str:
    from audit_star_spark.analytics.lm import perplexity_sql

    return f"""
WITH lang AS (
  SELECT doc_id, pred_lang FROM ({_lang_sql()}) t
),
fp AS ({SQL_FINGERPRINT}),
dup AS (
  SELECT doc_id,
         doc_id != MIN(doc_id) OVER (PARTITION BY fingerprint) AS is_dup
  FROM fp
),
px AS ({perplexity_sql('documents', 'text')}),
scored AS (
  SELECT l.doc_id, l.pred_lang, round(px.perplexity, 6) AS ppl6
  FROM lang l JOIN px ON px.doc_id = l.doc_id
  WHERE px.avg_nll IS NOT NULL
),
binned AS (
  SELECT doc_id, ppl6,
         NTILE({n_bins}) OVER (PARTITION BY pred_lang
                               ORDER BY ppl6, doc_id) AS bin
  FROM scored
)
SELECT l.doc_id, l.pred_lang, d.is_dup, b.ppl6, CAST(b.bin AS INT) AS bin,
       CASE WHEN d.is_dup THEN 'drop_duplicate'
            WHEN l.pred_lang = 'unknown' THEN 'drop_lang'
            WHEN b.bin IS NULL THEN 'drop_unscorable'
            WHEN b.bin = 1 THEN 'keep_head'
            WHEN b.bin < {n_bins} THEN 'keep_middle'
            ELSE 'drop_tail' END AS disposition
FROM lang l
JOIN dup d ON d.doc_id = l.doc_id
LEFT JOIN binned b ON b.doc_id = l.doc_id
"""


EXTRA_QUERIES["ccnet_disposition"] = q_ccnet_disposition
EXTRA_ORACLES["ccnet_disposition"] = _ccnet_sql()


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining through the gate (analytics/similarity.py
    hard_negatives — the DPR/ANCE contrastive-training recipe): per
    query vector, the top-k most-similar DIFFERENT-label vectors.
    Exact brute-force semantics; the oracle restates the label
    exclusion + cosine ranking in DuckDB."""
    return similarity.hard_negatives(
        load_table(spark, sf_dir, "embeddings"), n_queries=8, k=10
    )


def _hard_negatives_sql(k: int = 10, n_queries: int = 8) -> str:
    return f"""
WITH base AS (
  SELECT vec_id, label, {D_VEC} AS vec FROM embeddings
),
normed AS (
  SELECT vec_id, label, vec, sqrt({d_dot('vec', 'vec')}) AS norm
  FROM base
),
q AS (
  SELECT vec_id AS query_id, label AS query_label, vec AS qvec, norm AS qnorm
  FROM normed WHERE vec_id < {n_queries}
),
scored AS (
  -- NOT isnan: mirrors the engine's _topk_per_query NaN guard
  SELECT * FROM (
    SELECT q.query_id, q.query_label, base.vec_id, base.label AS neg_label,
           {d_dot('q.qvec', 'base.vec')} / (q.qnorm * base.norm) AS cosine
    FROM normed base JOIN q ON base.label <> q.query_label
  ) WHERE NOT isnan(cosine)
)
SELECT query_id, query_label, CAST(rank AS INT) AS rank, vec_id, neg_label,
       cosine
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
)
WHERE rank <= {k}
"""


EXTRA_QUERIES["hard_negatives"] = q_hard_negatives
EXTRA_ORACLES["hard_negatives"] = _hard_negatives_sql()


# ----------------------------------------------------- round-14 rotation
# The 4 round-13 additions (gate-sim + pytest-oracle-locked,
# GATESIM_r13.log 200/200 OK + hard_negatives addendum at sf0.01, but
# never driver-certified) move into the 50-slot window to earn hard
# CORRECTNESS_r14 rows; 4 double-green entries (driver-green in BOTH
# r12 and r13) retire to EXTRA, where tests/test_oracle_parity.py keeps
# them oracle-locked on every pytest run. Window stays 8 audit + 42
# analytics; the retiring 4 are census-family so the window keeps one
# representative per operator family after the dedup/LM/ANN arrivals.
_R14_ROTATE_IN = [
    "ngram_containment",
    "sentence_span_dedup",
    "ccnet_disposition",
    "hard_negatives",
]
_R14_ROTATE_OUT = [
    "mp3_l3_sideinfo_census",
    "mp3_l3_samples_census",
    "warc_reshard_census",
    "audio_resampled_rational",
]
for _name in _R14_ROTATE_OUT:
    EXTRA_QUERIES[_name] = ANALYTICS_QUERIES.pop(_name)
    EXTRA_ORACLES[_name] = ANALYTICS_ORACLES.pop(_name)
for _name in _R14_ROTATE_IN:
    ANALYTICS_QUERIES[_name] = EXTRA_QUERIES.pop(_name)
    ANALYTICS_ORACLES[_name] = EXTRA_ORACLES.pop(_name)

if len(ANALYTICS_QUERIES) != 42:  # driver gate window: 8 audit + 42 analytics
    raise RuntimeError(
        "ANALYTICS_QUERIES must stay exactly 42 entries so the driver's "
        f"50-slot correctness window is stable; got {len(ANALYTICS_QUERIES)}"
    )
del _name


# ---------------------------------------------- round-15 rotation candidates
# The 13 round-14 additions (ngram_containment_capped, clip_alignment,
# packed_chunks, bitext_mine, k_anonymity, embedding_drift, vocab_drift,
# t_closeness, image_phash, unimax_budget, video_scene_cuts,
# maxsim_rerank, texttile_boundaries — registered at the end of this
# module) are gate-sim + pytest-oracle-locked but have
# no hard driver CORRECTNESS row yet. Next round, mirror
# _R14_ROTATE_IN/_OUT above: rotate (a subset of) them in and retire as
# many double-green (r13+r14) window entries to EXTRA; the window must
# stay 8 audit + 42 analytics.


# ------------------------------------------------ margin-based bitext mining
def q_bitext_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext candidate mining through the gate
    (analytics/similarity.py bitext_mine — Artetxe & Schwenk 2019 ratio
    margin, the CCMatrix curation step): label-parity sides, cell-blocked
    candidates, per-side top-k cosine averages as the margin denominator,
    forward-best + mutual flag. The oracle restates the cell assignment,
    the rank-ordered avgk folds, and both argmaxes in DuckDB."""
    return similarity.bitext_mine(
        load_table(spark, sf_dir, "embeddings"), n_cells=8, k=4, threshold=1.05
    )


def _bitext_mine_sql(n_cells: int = 8, k: int = 4, threshold: float = 1.05) -> str:
    avg_fold = d_fold(
        "list(cos ORDER BY r)", "CAST(0.0 AS DOUBLE)", "(s, v) -> s + v"
    )
    return f"""
WITH base AS (
  SELECT vec_id, label % 2 AS side, {D_VEC} AS vec FROM embeddings
),
normed AS (
  SELECT vec_id, side, vec, sqrt({d_dot('vec', 'vec')}) AS norm FROM base
),
cents AS (
  SELECT vec_id AS cell_id, vec AS cvec, norm AS cnorm
  FROM normed WHERE vec_id < {n_cells}
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY ccos DESC, cell_id) AS crank
  FROM (
    SELECT n.vec_id, n.side, n.vec, n.norm, c.cell_id,
           {d_dot('c.cvec', 'n.vec')} / (c.cnorm * n.norm) AS ccos
    FROM normed n CROSS JOIN cents c
  )
),
assigned AS (
  SELECT vec_id, side, vec, norm, cell_id FROM ranked WHERE crank = 1
),
pairs AS (
  -- NOT isnan: mirrors the engine's _topk_per_query NaN guard
  SELECT * FROM (
    SELECT s.vec_id AS src_id, t.vec_id AS tgt_id,
           {d_dot('s.vec', 't.vec')} / (s.norm * t.norm) AS cos
    FROM assigned s JOIN assigned t
      ON s.cell_id = t.cell_id AND s.side = 0 AND t.side = 1
  ) WHERE NOT isnan(cos)
),
fwd_rank AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id
                               ORDER BY cos DESC, tgt_id) AS r
  FROM pairs
),
src_avg AS (
  -- top-k cosines summed in RANK order (unordered float sums diverge)
  SELECT src_id, {avg_fold} / CAST(count(*) AS DOUBLE) AS src_avg
  FROM fwd_rank WHERE r <= {k} GROUP BY src_id
),
bwd_rank AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY tgt_id
                               ORDER BY cos DESC, src_id) AS r
  FROM pairs
),
tgt_avg AS (
  SELECT tgt_id, {avg_fold} / CAST(count(*) AS DOUBLE) AS tgt_avg
  FROM bwd_rank WHERE r <= {k} GROUP BY tgt_id
),
margined AS (
  SELECT p.src_id, p.tgt_id, p.cos,
         p.cos / ((sa.src_avg + ta.tgt_avg) / 2.0) AS margin
  FROM pairs p
  JOIN src_avg sa ON sa.src_id = p.src_id
  JOIN tgt_avg ta ON ta.tgt_id = p.tgt_id
),
best_fwd AS (
  SELECT src_id, tgt_id, cos, margin FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id
                                 ORDER BY margin DESC, tgt_id) AS br
    FROM margined
  ) WHERE br = 1
),
best_bwd AS (
  SELECT tgt_id, bsrc FROM (
    SELECT tgt_id, src_id AS bsrc,
           ROW_NUMBER() OVER (PARTITION BY tgt_id
                              ORDER BY margin DESC, src_id) AS br
    FROM margined
  ) WHERE br = 1
)
SELECT f.src_id, f.tgt_id, round(f.cos, 6) AS cos6,
       round(f.margin, 6) AS margin6, (b.bsrc = f.src_id) AS mutual
FROM best_fwd f JOIN best_bwd b ON b.tgt_id = f.tgt_id
WHERE f.margin >= {threshold}
"""


EXTRA_QUERIES["bitext_mine"] = q_bitext_mine
EXTRA_ORACLES["bitext_mine"] = _bitext_mine_sql()


# ------------------------------------------------- k-anonymity census
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-identification risk census through the gate
    (analytics/privacy.py k_anonymity_census — Sweeney 2002 k-anonymity
    + Machanavajjhala 2007 l-diversity): equivalence classes under the
    (nation, market-segment) quasi-identifiers, sensitive column =
    account balance bucketed to thousands (floor keeps the double
    integral, so the BIGINT cast agrees across the rounds-vs-truncates
    dialect boundary). One row per observed class size."""
    from audit_star_spark.analytics.privacy import k_anonymity_census

    cust = load_table(spark, sf_dir, "customer").withColumn(
        "bal_bucket", F.floor(F.col("c_acctbal") / 1000.0)
    )
    return k_anonymity_census(
        cust, ["c_nationkey", "c_mktsegment"], k=5, sensitive_col="bal_bucket"
    )


def _k_anonymity_sql(k: int = 5) -> str:
    return f"""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS class_size,
         CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
              AS BIGINT) AS l
  FROM customer GROUP BY c_nationkey, c_mktsegment
),
sized AS (
  SELECT class_size,
         CAST(COUNT(*) AS BIGINT) AS n_classes,
         CAST(SUM(class_size) AS BIGINT) AS n_rows,
         MIN(l) AS min_l,
         round(AVG(l), 6) AS avg_l6
  FROM classes GROUP BY class_size
),
total AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total_rows FROM sized)
SELECT s.class_size, s.n_classes, s.n_rows,
       round(s.n_rows / t.total_rows, 6) AS share6,
       (s.class_size < {k}) AS risky,
       s.min_l, s.avg_l6
FROM sized s CROSS JOIN total t
"""


EXTRA_QUERIES["k_anonymity"] = q_k_anonymity
EXTRA_ORACLES["k_anonymity"] = _k_anonymity_sql()


# --------------------------------------------------- embedding drift census
def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-corpus embedding drift through the gate
    (analytics/drift.py embedding_drift): label-parity sides stand in
    for reference/candidate snapshots; per-dimension means/variances
    (two-pass, sorted folds in gate mode), Cohen's-d standardized mean
    difference with an explicit zero-variance CASE, and the diagonal
    Fréchet (FID) term whose sum is the drift dashboard's number."""
    from audit_star_spark.analytics.drift import embedding_drift

    return embedding_drift(load_table(spark, sf_dir, "embeddings"))


def _embedding_drift_sql() -> str:
    fold = lambda xs: d_fold(  # noqa: E731
        f"list_sort(list({xs}))", "CAST(0.0 AS DOUBLE)", "(s, v) -> s + v"
    )
    return f"""
WITH base AS (
  SELECT label % 2 AS side, {D_VEC} AS vec FROM embeddings
),
dims AS (
  SELECT side, k - 1 AS i, vec[k] AS x
  FROM base, LATERAL (SELECT unnest(range(1, len(vec) + 1)) AS k)
),
mean AS (
  SELECT side, i, {fold('x')} / CAST(count(*) AS DOUBLE) AS m,
         CAST(count(*) AS BIGINT) AS n
  FROM dims GROUP BY side, i
),
cen AS (
  SELECT d.side, d.i, (d.x - m.m) * (d.x - m.m) AS v
  FROM dims d JOIN mean m ON m.side = d.side AND m.i = d.i
),
var AS (
  SELECT side, i, {fold('v')} / CAST(count(*) AS DOUBLE) AS var
  FROM cen GROUP BY side, i
),
st AS (
  SELECT m.side, m.i, m.n, m.m, v.var
  FROM mean m JOIN var v ON v.side = m.side AND v.i = m.i
)
SELECT a.i, a.n AS n_a, b.n AS n_b,
       round(a.m, 6) AS mean_a6, round(b.m, 6) AS mean_b6,
       round(a.var, 6) AS var_a6, round(b.var, 6) AS var_b6,
       round(CASE WHEN a.var + b.var > 0
                  THEN (a.m - b.m) / sqrt((a.var + b.var) / 2.0) END,
             6) AS smd6,
       round((a.m - b.m) * (a.m - b.m) + a.var + b.var
             - 2.0 * sqrt(a.var * b.var), 6) AS fid_term6
FROM st a JOIN st b ON a.i = b.i AND a.side = 0 AND b.side = 1
"""


EXTRA_QUERIES["embedding_drift"] = q_embedding_drift
EXTRA_ORACLES["embedding_drift"] = _embedding_drift_sql()


# --------------------------------------------------- vocabulary drift census
def q_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary drift through the gate (analytics/drift.py
    vocab_drift): doc_id-parity sides stand in for reference/candidate
    snapshots; top-k tokens by Jensen-Shannon contribution with
    explicit zero-term CASEs; the oracle restates the unigram rates and
    the js expression verbatim."""
    from audit_star_spark.analytics.drift import vocab_drift

    return vocab_drift(load_table(spark, sf_dir, "documents"), k=100)


def _vocab_drift_sql(k: int = 100) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id % 2 AS side, unnest({D_TOKENS}) AS token FROM documents
),
tf AS (
  SELECT side, token, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks WHERE len(token) > 0 GROUP BY side, token
),
tots AS (
  SELECT CAST(SUM(CASE WHEN side = 0 THEN c END) AS BIGINT) AS ta,
         CAST(SUM(CASE WHEN side = 1 THEN c END) AS BIGINT) AS tb
  FROM tf
),
j AS (
  SELECT COALESCE(a.token, b.token) AS token,
         COALESCE(a.ca, 0) AS c_a, COALESCE(b.cb, 0) AS c_b
  FROM (SELECT token, c AS ca FROM tf WHERE side = 0) a
  FULL OUTER JOIN (SELECT token, c AS cb FROM tf WHERE side = 1) b
    ON a.token = b.token
),
scored AS (
  SELECT token, c_a, c_b,
         c_a / CAST(ta AS DOUBLE) AS p,
         c_b / CAST(tb AS DOUBLE) AS q,
         (c_a / CAST(ta AS DOUBLE) + c_b / CAST(tb AS DOUBLE)) / 2.0 AS m
  FROM j CROSS JOIN tots
),
ranked AS (
  SELECT token, c_a, c_b, p, q,
         (CASE WHEN p > 0 THEN p * ln(p / m) / 2.0 ELSE 0.0 END
          + CASE WHEN q > 0 THEN q * ln(q / m) / 2.0 ELSE 0.0 END) AS js
  FROM scored
)
SELECT token, c_a, c_b, round(p, 6) AS p6, round(q, 6) AS q6,
       round(js, 6) AS js6
FROM ranked ORDER BY js DESC, token LIMIT {k}
"""


EXTRA_QUERIES["vocab_drift"] = q_vocab_drift
EXTRA_ORACLES["vocab_drift"] = _vocab_drift_sql()


# ------------------------------------------------------ t-closeness audit
def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class t-closeness through the gate (analytics/privacy.py
    t_closeness_census — Li, Li & Venkatasubramanian 2007 ordered
    EMD): same quasi identifiers and bucketed-balance sensitive column
    as the k_anonymity gate, one row per equivalence class with its
    EMD to the global balance distribution. Both cumulative sums stay
    integer (counts divided only at the end) and the EMD folds in
    value-rank order, so the oracle's windows and list fold reproduce
    every float bit-for-bit."""
    from audit_star_spark.analytics.privacy import t_closeness_census

    cust = load_table(spark, sf_dir, "customer").withColumn(
        "bal_bucket", F.floor(F.col("c_acctbal") / 1000.0)
    )
    return t_closeness_census(
        cust, ["c_nationkey", "c_mktsegment"], "bal_bucket", t=0.15
    )


def _t_closeness_sql(t: float = 0.15) -> str:
    emd_fold = d_fold(
        "list(term ORDER BY vrank)", "CAST(0.0 AS DOUBLE)", "(s, v) -> s + v"
    )
    return f"""
WITH counts AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS sv,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2, 3
),
g AS (SELECT sv, CAST(SUM(n) AS BIGINT) AS gn FROM counts GROUP BY sv),
tot AS (
  SELECT CAST(SUM(gn) AS BIGINT) AS n_total, CAST(COUNT(*) AS BIGINT) AS m
  FROM g
),
vals AS (
  SELECT sv,
         CAST(SUM(gn) OVER (ORDER BY sv ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS cum_gn,
         CAST(ROW_NUMBER() OVER (ORDER BY sv) AS BIGINT) AS vrank
  FROM g
),
classes AS (
  SELECT c_nationkey, c_mktsegment, CAST(SUM(n) AS BIGINT) AS class_size
  FROM counts GROUP BY 1, 2
),
grid AS (
  SELECT cl.c_nationkey, cl.c_mktsegment, cl.class_size,
         v.sv, v.cum_gn, v.vrank, t.n_total, t.m,
         COALESCE(c.n, 0) AS n_filled
  FROM classes cl CROSS JOIN vals v CROSS JOIN tot t
  LEFT JOIN counts c
    ON c.c_nationkey = cl.c_nationkey
   AND c.c_mktsegment = cl.c_mktsegment
   AND c.sv = v.sv
),
terms AS (
  SELECT c_nationkey, c_mktsegment, class_size, m, vrank,
         CASE WHEN vrank < m THEN
           abs(CAST(SUM(n_filled) OVER (PARTITION BY c_nationkey, c_mktsegment
                     ORDER BY sv ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS DOUBLE) / class_size
               - CAST(cum_gn AS DOUBLE) / n_total)
         ELSE CAST(0.0 AS DOUBLE) END AS term
  FROM grid
),
emd AS (
  SELECT c_nationkey, c_mktsegment,
         MIN(class_size) AS class_size, MIN(m) AS m,
         {emd_fold} AS emd_sum
  FROM terms GROUP BY 1, 2
)
SELECT c_nationkey, c_mktsegment, class_size,
       round(CASE WHEN m > 1 THEN emd_sum / (m - 1)
                  ELSE CAST(0.0 AS DOUBLE) END, 6) AS emd6,
       (round(CASE WHEN m > 1 THEN emd_sum / (m - 1)
                   ELSE CAST(0.0 AS DOUBLE) END, 6) > {t}) AS violates_t
FROM emd
"""


EXTRA_QUERIES["t_closeness"] = q_t_closeness
EXTRA_ORACLES["t_closeness"] = _t_closeness_sql()


# --------------------------------------------- DCT perceptual hash (pHash)
def q_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode -> frequency-domain perceptual hash through the gate
    (analytics/multimodal.py image_phash — the LAION image-dedup
    fingerprint): per doc a 32x32 PGM whose bytes follow a closed form
    (ASCII-safe 32..126 so the UTF-8 binary cast is byte-exact), real
    netpbm decode, then the Q10 FIXED-POINT separable DCT — every
    coefficient an exact int64 — low-frequency 8x8 block thresholded on
    the integer median test 2*coef > c[31]+c[32]. Because the whole
    pipeline is integer, the oracle restates decode -> DCT -> median ->
    hex bit-for-bit with zero float risk; the basis literal in the SQL
    is generated from the SAME PHASH_BASIS table the engine uses."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.expr(
            "CAST(concat('P5\\n32 32\\n255\\n', concat_ws('', "
            "transform(sequence(0, 1023), "
            "i -> char(32 + (doc_id * 11 + i * 7) % 95)))) AS BINARY)"
        ).alias("payload"),
    )
    return multimodal.image_phash(media).select("doc_id", "phash")


def _image_phash_sql() -> str:
    from audit_star_spark.analytics.multimodal import PHASH_BASIS

    b_lit = (
        "["
        + ", ".join(
            "[" + ", ".join(str(v) for v in row) + "]" for row in PHASH_BASIS
        )
        + "]"
    )
    ifold = lambda xs: d_fold(xs, "CAST(0 AS BIGINT)", "(s, v) -> s + v")  # noqa: E731
    # separable integer DCT: pass1 index k = u*32 + y, pass2 index k = u*8 + v
    p1 = ifold(
        "list_transform(generate_series(0, 31), "
        "x -> b[(k // 32) + 1][x + 1] * g[x * 32 + (k % 32) + 1])"
    )
    p2 = ifold(
        "list_transform(generate_series(0, 31), "
        "y -> p[(k // 8) * 32 + y + 1] * b[(k % 8) + 1][y + 1])"
    )
    return f"""
WITH px AS (
  SELECT doc_id,
         list_transform(generate_series(0, 1023),
                        i -> CAST(32 + (doc_id * 11 + i * 7) % 95 AS BIGINT)) AS g,
         {b_lit} AS b
  FROM documents
),
pass1 AS (
  SELECT doc_id, b,
         list_transform(generate_series(0, 255), k -> {p1}) AS p
  FROM px
),
coefs AS (
  SELECT doc_id,
         list_transform(generate_series(0, 63), k -> {p2}) AS c
  FROM pass1
),
med AS (
  SELECT doc_id, c, list_sort(c)[32] + list_sort(c)[33] AS med2 FROM coefs
),
bits AS (
  SELECT doc_id,
         list_transform(c, x -> CASE WHEN 2 * x > med2 THEN 1 ELSE 0 END) AS bit
  FROM med
)
SELECT doc_id,
       array_to_string(list_transform(generate_series(0, 15),
         n -> substr('0123456789abcdef',
                     1 + bit[4*n+1]*8 + bit[4*n+2]*4 + bit[4*n+3]*2 + bit[4*n+4],
                     1)), '') AS phash
FROM bits
"""


EXTRA_QUERIES["image_phash"] = q_image_phash
EXTRA_ORACLES["image_phash"] = _image_phash_sql()


# --------------------------------------------- UniMax budget allocation
def q_unimax_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax token-budget allocation through the gate
    (analytics/text.py unimax_budget — Chung et al. ICLR 2023): the
    epoch-capped waterfill over per-source token counts via its
    capped-prefix closed form. Budget and epoch cap are chosen so the
    testdata exercises BOTH branches (a capped prefix of small sources
    and an equal-share tail). Integer window math until the final
    division, so the oracle matches bit-for-bit."""
    from audit_star_spark.analytics.text import unimax_budget

    return unimax_budget(
        load_table(spark, sf_dir, "documents"),
        budget_tokens=22000,
        max_epochs=0.9,
    )


def _unimax_budget_sql(budget: int = 22000, max_epochs: float = 0.9) -> str:
    return f"""
WITH counts AS (
  SELECT source, CAST(SUM(len({D_TOKENS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
capf AS (
  SELECT source, n_tokens,
         CAST(round(n_tokens * {max_epochs}) AS BIGINT) AS cap
  FROM counts
),
st AS (
  SELECT source, n_tokens, cap,
         CAST(ROW_NUMBER() OVER (ORDER BY cap, source) AS BIGINT) AS r,
         CAST(SUM(cap) OVER (ORDER BY cap, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           - cap AS cum_prev,
         CAST(COUNT(*) OVER () AS BIGINT) AS n_src
  FROM capf
),
st2 AS (
  SELECT *,
         CASE WHEN cap * (n_src - r + 1) + cum_prev < {budget}
              THEN 1 ELSE 0 END AS cond
  FROM st
),
st3 AS (
  SELECT *,
         (MIN(cond) OVER (ORDER BY cap, source
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1) AS capped
  FROM st2
),
st4 AS (
  SELECT *,
         CAST(SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS BIGINT)
           AS n_capped,
         CAST(SUM(CASE WHEN capped THEN cap ELSE 0 END) OVER () AS BIGINT)
           AS capped_tokens
  FROM st3
)
SELECT source, n_tokens, cap,
       round(CASE WHEN capped THEN CAST(cap AS DOUBLE)
                  ELSE ({budget} - capped_tokens)
                       / CAST(n_src - n_capped AS DOUBLE) END, 6) AS alloc6,
       round(CASE WHEN n_tokens > 0 THEN
               (CASE WHEN capped THEN CAST(cap AS DOUBLE)
                     ELSE ({budget} - capped_tokens)
                          / CAST(n_src - n_capped AS DOUBLE) END) / n_tokens
             END, 6) AS epochs6,
       capped
FROM st4
"""


EXTRA_QUERIES["unimax_budget"] = q_unimax_budget
EXTRA_ORACLES["unimax_budget"] = _unimax_budget_sql()


# --------------------------------------------------- video scene cuts
def q_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL container walk + per-frame JPEG decode -> shot-boundary
    census through the gate (analytics/multimodal.py video_scene_cuts)
    over the same synthesized MJPEG AVIs as video_frame_means: tile
    values step +17 per frame, so ordinary transitions jump 17 (below
    the 20.0 threshold) and the mod-256 wraparound produces one hard
    cut of 239 — both classes exercised. Tile-constant q=100 frames
    decode bit-exactly, so the oracle states luma in closed form."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return multimodal.video_scene_cuts(_synth_avi(docs), threshold=20.0)


SQL_VIDEO_SCENE_CUTS = """
WITH f AS (
  SELECT doc_id, unnest(generate_series(0, 1 + doc_id % 3)) AS i
  FROM documents
),
lum AS (
  SELECT doc_id, i, CAST((doc_id * 11 + i * 17) % 256 AS DOUBLE) AS l
  FROM f
),
j AS (
  SELECT doc_id, i,
         abs(l - LAG(l) OVER (PARTITION BY doc_id ORDER BY i)) AS jump
  FROM lum
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(CASE WHEN jump > 20.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
       CAST(MIN(CASE WHEN jump > 20.0 THEN i END) AS BIGINT) AS first_cut_idx,
       round(MAX(jump), 6) AS max_jump6
FROM j GROUP BY doc_id
"""


EXTRA_QUERIES["video_scene_cuts"] = q_video_scene_cuts
EXTRA_ORACLES["video_scene_cuts"] = SQL_VIDEO_SCENE_CUTS


# --------------------------------------------- MaxSim late-interaction rerank
def q_maxsim_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT MaxSim reranking through the gate
    (analytics/similarity.py maxsim_rerank): each embedding splits into
    4 x 16-dim token vectors (the multi-vector model); queries are
    vec_id < 6; first-stage candidates are the deterministic mod-8
    blocking join (bounded per query, the rerank contract). The oracle
    restates slicing, per-token cosine, order-free MAX, the
    tok_idx-ordered fold, and the rounded-score rank verbatim."""
    from audit_star_spark.analytics.similarity import maxsim_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    toks = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    ).select(
        "vec_id",
        F.posexplode(
            F.expr("transform(sequence(0, 3), t -> slice(v, 16 * t + 1, 16))")
        ).alias("tok_idx", "vec"),
    )
    q_tokens = toks.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "tok_idx", "vec"
    )
    d_tokens = toks.select(F.col("vec_id").alias("doc_id"), "tok_idx", "vec")
    ids = emb.select("vec_id", (F.col("vec_id") % 8).alias("key"))
    cand = (
        ids.filter(F.col("vec_id") < 6)
        .select(F.col("vec_id").alias("query_id"), "key")
        .join(ids.select(F.col("vec_id").alias("doc_id"), "key"), "key")
        .select("query_id", "doc_id")
    )
    return maxsim_rerank(q_tokens, d_tokens, cand, k=10)


def _maxsim_rerank_sql(n_queries: int = 6, k: int = 10) -> str:
    fold = d_fold(
        "list(m ORDER BY q_tok)", "CAST(0.0 AS DOUBLE)", "(s, v) -> s + v"
    )
    return f"""
WITH base AS (SELECT vec_id, {D_VEC} AS v FROM embeddings),
toks AS (
  SELECT vec_id, t, list_slice(v, 16 * t + 1, 16 * t + 16) AS vec
  FROM base, LATERAL (SELECT unnest(generate_series(0, 3)) AS t) s
),
normed AS (
  SELECT vec_id, t, vec, sqrt({d_dot('vec', 'vec')}) AS nrm FROM toks
),
qt AS (
  SELECT vec_id AS query_id, t AS q_tok, vec AS qvec, nrm AS qnorm
  FROM normed WHERE vec_id < {n_queries} AND nrm > 0
),
dt AS (
  SELECT vec_id AS doc_id, t AS d_tok, vec AS dvec, nrm AS dnorm
  FROM normed WHERE nrm > 0
),
cand AS (
  SELECT q.vec_id AS query_id, d.vec_id AS doc_id
  FROM embeddings q JOIN embeddings d ON q.vec_id % 8 = d.vec_id % 8
  WHERE q.vec_id < {n_queries}
),
cos AS (
  SELECT c.query_id, c.doc_id, qt.q_tok,
         {d_dot('qt.qvec', 'dt.dvec')} / (qt.qnorm * dt.dnorm) AS cos
  FROM cand c
  JOIN dt ON dt.doc_id = c.doc_id
  JOIN qt ON qt.query_id = c.query_id
),
mx AS (
  SELECT query_id, doc_id, q_tok, MAX(cos) AS m FROM cos GROUP BY 1, 2, 3
),
sc AS (
  SELECT query_id, doc_id, round({fold}, 6) AS score6 FROM mx GROUP BY 1, 2
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score6 DESC, doc_id) AS rank
  FROM sc
)
SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score6
FROM r WHERE rank <= {k}
"""


EXTRA_QUERIES["maxsim_rerank"] = q_maxsim_rerank
EXTRA_ORACLES["maxsim_rerank"] = _maxsim_rerank_sql()


# --------------------------------------------- TextTiling topic boundaries
def q_texttile_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextTiling topic segmentation through the gate
    (analytics/text.py texttile_boundaries — Hearst 1997): block-pair
    lexical-cohesion cosines over 16-token blocks, prefix/suffix-peak
    depth scores, boundaries past the paper's mean - sigma/2 cutoff.
    Every cosine is num/(sqrt(dl)*sqrt(dr)) of INTEGER sums and IEEE
    sqrt is correctly rounded, so gap scores are engine-exact; the
    depth mean/variance folds run in gap order."""
    from audit_star_spark.analytics.text import texttile_boundaries

    return texttile_boundaries(load_table(spark, sf_dir, "documents"), w=16)


def _texttile_sql(w: int = 16) -> str:
    dfold = d_fold(
        "list(depth ORDER BY gap)", "CAST(0.0 AS DOUBLE)", "(s, v) -> s + v"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, p - 1 AS p, t[p] AS tok
  FROM (SELECT doc_id, {D_TOKENS} AS t FROM documents) b,
       LATERAL (SELECT unnest(generate_series(1, len(t))) AS p) s
),
nb AS (
  SELECT doc_id, CAST(COUNT(*) // {w} AS BIGINT) AS nb
  FROM toks GROUP BY doc_id
),
sized AS (
  SELECT t.doc_id, t.p // {w} AS blk, t.tok, n.nb
  FROM toks t JOIN nb n ON n.doc_id = t.doc_id
  WHERE t.p // {w} < n.nb
),
gs AS (
  SELECT doc_id, blk AS gap, 'l' AS side, tok FROM sized WHERE blk <= nb - 2
  UNION ALL
  SELECT doc_id, blk - 1 AS gap, 'r' AS side, tok FROM sized WHERE blk >= 1
),
counts AS (
  SELECT doc_id, gap, side, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM gs GROUP BY 1, 2, 3, 4
),
pt AS (
  SELECT doc_id, gap, tok,
         CAST(SUM(CASE WHEN side = 'l' THEN c ELSE 0 END) AS BIGINT) AS cl,
         CAST(SUM(CASE WHEN side = 'r' THEN c ELSE 0 END) AS BIGINT) AS cr
  FROM counts GROUP BY 1, 2, 3
),
sc AS (
  SELECT doc_id, gap,
         CAST(SUM(cl * cr) AS BIGINT)
           / (sqrt(CAST(SUM(cl * cl) AS BIGINT))
              * sqrt(CAST(SUM(cr * cr) AS BIGINT))) AS s
  FROM pt GROUP BY 1, 2
),
dp AS (
  SELECT doc_id, gap,
         (MAX(s) OVER (PARTITION BY doc_id ORDER BY gap
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - s)
         + (MAX(s) OVER (PARTITION BY doc_id ORDER BY gap
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) - s) AS depth
  FROM sc
),
st1 AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
         {dfold} AS dsum,
         list(depth ORDER BY gap) AS arr
  FROM dp GROUP BY doc_id
),
st2 AS (SELECT doc_id, n_gaps, dsum / n_gaps AS mean, arr FROM st1),
st3 AS (
  SELECT doc_id, n_gaps,
         mean - sqrt(
           list_reduce(
             list_concat([CAST(0.0 AS DOUBLE)],
               list_transform(arr, x -> (x - mean) * (x - mean))),
             (s, v) -> s + v) / n_gaps) / 2.0 AS cutoff
  FROM st2
)
SELECT d.doc_id,
       MIN(s.n_gaps) AS n_gaps,
       CAST(SUM(CASE WHEN d.depth > s.cutoff THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boundaries,
       CAST(MIN(CASE WHEN d.depth > s.cutoff THEN d.gap END) AS BIGINT)
         AS first_boundary,
       round(MIN(s.cutoff), 6) AS cutoff6,
       round(MAX(d.depth), 6) AS max_depth6
FROM dp d JOIN st3 s ON s.doc_id = d.doc_id
GROUP BY d.doc_id
"""


EXTRA_QUERIES["texttile_boundaries"] = q_texttile_boundaries
EXTRA_ORACLES["texttile_boundaries"] = _texttile_sql()
