"""Training-data curation queries: quality filtering, benchmark
decontamination, and keyword extraction over the ``documents`` table.

These extend the documents surface (queries/documents.py) with the
filter-stage operators a large-scale LM data pipeline runs between dedup and
packing. Every rule is expressed in EXACT integer arithmetic (counts and
cross-multiplied rational thresholds — never a rounded ratio), so the DuckDB
differential holds bit-for-bit with no float discipline needed at all.

All row-path expressions are JVM-side Spark SQL (split/filter/aggregate
lambdas through whole-stage codegen); the only shuffles are the final
groupBys/joins. The contamination probe broadcasts the (small) benchmark
gram set — the 100 TB-scale shape, where the training corpus streams and
only the eval fingerprints sit in memory.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import determinism as DET
from ..functions import text as TX
from ..sources.tables import load_table


@contextmanager
def _pinned_parallelism(spark: SparkSession):
    """Scope spark.sql.shuffle.partitions to defaultParallelism (the
    ann_index_audit conf-pin doctrine) around driver-paced loops whose
    per-iteration jobs would otherwise run 200 near-empty tasks per
    shuffle on the plain driver session. Exact-integer paths only."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(spark.sparkContext.defaultParallelism),
    )
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

# --- docs_quality_filter: Gopher/C4-style document quality rules with a
#     violation bitmask. Thresholds are exact rationals compared by
#     cross-multiplication (50*stop_cnt >= n_tokens encodes "stopword
#     fraction >= 2%") — integer-only, so no rounding rule can diverge.

_QF_MIN_TOKENS = 20
_QF_MAX_TOKENS = 100_000
# mean token length in [3, 10]:  3*n <= total_chars <= 10*n
_QF_MIN_MEAN_LEN = 3
_QF_MAX_MEAN_LEN = 10
# stopword fraction >= 2%:       50*stop_cnt >= n
_QF_STOP_DEN = 50
# alphabetic-token fraction >= 80%:  5*alpha_cnt >= 4*n
_QF_ALPHA_NUM, _QF_ALPHA_DEN = 4, 5

_ALPHA_RE = "^[a-z]+$"
# intra-doc repetition (Gopher duplicate-n-gram rule): distinct 3-gram
# fraction < 50% → repetitive:  2*n_distinct_grams < n_grams
_QF_REP_NUM = 2


def docs_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .documents import _spread

    # _spread: the gram-building rules are CPU-heavy per row; a small
    # corpus arrives as one split and would run them on one core (no-op at
    # real scale — see documents._spread)
    docs = _spread(load_table(spark, sf_dir, "documents"), spark)
    toks = TX.tokens(F.col("text"))
    n = F.size(toks).cast("long")
    total_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    stop_cnt = TX.in_list_count(toks, TX.STOPWORDS)
    alpha_cnt = F.size(F.filter(toks, lambda t: t.rlike(_ALPHA_RE))).cast("long")

    # materialize the 3-gram array ONCE in its own projection — size() and
    # size(array_distinct()) both consume it; inlining the shingle
    # expression twice doubles the dominant per-row cost
    staged = docs.select(
        "doc_id",
        "source",
        n.alias("n_tokens"),
        total_chars.alias("total_chars"),
        stop_cnt.alias("stop_cnt"),
        alpha_cnt.alias("alpha_cnt"),
        TX.shingles(toks, 3, distinct=False).alias("g3"),
    )
    base = staged.select(
        "doc_id",
        "source",
        "n_tokens",
        "total_chars",
        "stop_cnt",
        "alpha_cnt",
        F.size("g3").cast("long").alias("n_grams"),
        F.size(F.array_distinct("g3")).cast("long").alias("n_distinct_grams"),
    )
    nt = F.col("n_tokens")
    r_len = (nt < _QF_MIN_TOKENS) | (nt > _QF_MAX_TOKENS)
    r_mean = (F.col("total_chars") < _QF_MIN_MEAN_LEN * nt) | (
        F.col("total_chars") > _QF_MAX_MEAN_LEN * nt
    )
    r_stop = _QF_STOP_DEN * F.col("stop_cnt") < nt
    r_alpha = _QF_ALPHA_DEN * F.col("alpha_cnt") < _QF_ALPHA_NUM * nt
    r_rep = _QF_REP_NUM * F.col("n_distinct_grams") < F.col("n_grams")
    reasons = (
        F.when(r_len, 1).otherwise(0)
        + F.when(r_mean, 2).otherwise(0)
        + F.when(r_stop, 4).otherwise(0)
        + F.when(r_alpha, 8).otherwise(0)
        + F.when(r_rep, 16).otherwise(0)
    ).cast("int")
    return base.withColumn("reasons", reasons).withColumn(
        "keep", F.col("reasons") == 0
    )


_TOKS3 = "toks"
_GRAM3 = " || ' ' || ".join(f"{_TOKS3}[i+{k}]" for k in range(3))
_GRAMS3_RAW = (
    f"CASE WHEN len({_TOKS3}) >= 3 THEN "
    f"list_transform(generate_series(1, len({_TOKS3}) - 2), i -> {_GRAM3}) "
    f"ELSE [array_to_string({_TOKS3}, ' ')] END"
)


DOCS_QUALITY_FILTER_SQL = f"""
WITH t AS (
  SELECT doc_id, source,
         string_split(text, ' ') AS toks
  FROM documents
),
m AS (
  SELECT doc_id, source,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
              AS BIGINT) AS total_chars,
         CAST(len(list_filter(toks,
              x -> list_contains({TX.STOPWORDS!r}, x))) AS BIGINT) AS stop_cnt,
         CAST(len(list_filter(toks,
              x -> regexp_matches(x, '{_ALPHA_RE}'))) AS BIGINT) AS alpha_cnt,
         CAST(len({_GRAMS3_RAW}) AS BIGINT) AS n_grams,
         CAST(len(list_distinct({_GRAMS3_RAW})) AS BIGINT) AS n_distinct_grams
  FROM t
),
scored AS (
  SELECT *,
         CAST((CASE WHEN n_tokens < {_QF_MIN_TOKENS}
                     OR n_tokens > {_QF_MAX_TOKENS} THEN 1 ELSE 0 END)
            + (CASE WHEN total_chars < {_QF_MIN_MEAN_LEN} * n_tokens
                     OR total_chars > {_QF_MAX_MEAN_LEN} * n_tokens
                THEN 2 ELSE 0 END)
            + (CASE WHEN {_QF_STOP_DEN} * stop_cnt < n_tokens
                THEN 4 ELSE 0 END)
            + (CASE WHEN {_QF_ALPHA_DEN} * alpha_cnt
                         < {_QF_ALPHA_NUM} * n_tokens THEN 8 ELSE 0 END)
            + (CASE WHEN {_QF_REP_NUM} * n_distinct_grams < n_grams
                THEN 16 ELSE 0 END)
           AS INT) AS reasons
  FROM m
)
SELECT doc_id, source, n_tokens, total_chars, stop_cnt, alpha_cnt,
       n_grams, n_distinct_grams, reasons, reasons = 0 AS keep
FROM scored
"""


# --- docs_contamination: benchmark decontamination — flag training docs
#     sharing any word 4-gram with the held-out eval slice (source =
#     'src19'). The eval fingerprint set is tiny and BROADCAST; the
#     training corpus is exploded to (doc, gram) and hash-joined — at
#     100 TB the corpus never shuffles for the probe, only the per-doc
#     regroup does. Grams join RAW (no md5): shared-gram counts are
#     computed within each engine, so a digest buys nothing semantically
#     and cost ~0.5s/run at sf0.1; at real scale a fixed-width digest
#     (xxhash64) would shrink the broadcast, an engine-internal choice
#     that leaves the counts identical. (4-grams chosen: 5-grams
#     almost never collide there, 3-grams flag 75% of docs — 4 gives a
#     selective-but-populated differential.)

_EVAL_SOURCE = "src19"
_CONTAM_N = 4


def docs_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .documents import _spread

    docs = load_table(spark, sf_dir, "documents")
    grams = TX.shingles(TX.tokens(F.col("text")), _CONTAM_N, distinct=True)

    def _hashed(side: DataFrame) -> DataFrame:
        # filter BEFORE _spread: the source predicate pushes down to the
        # scan, and the round-robin exchange (which must carry the full
        # text column) only moves each side's own slice. _spread keeps the
        # CPU-heavy shingle+md5 transform off the one split a small corpus
        # scan yields (no-op at real scale).
        return _spread(side, spark).select(
            "doc_id", F.explode(grams).alias("gram")
        )

    eval_grams = (
        _hashed(docs.filter(F.col("source") == _EVAL_SOURCE))
        .select("gram")
        .distinct()
    )
    train = _hashed(docs.filter(F.col("source") != _EVAL_SOURCE))
    return (
        train.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        # plain count, not countDistinct: shingles(distinct=True) already
        # dedups grams within a doc and the broadcast semi-join is 1:1, so
        # the multiset is distinct per doc_id by construction — countDistinct
        # would put the gram back into the partial-aggregate key and shuffle
        # (doc_id, gram) pairs where (doc_id, partial count) suffices
        # (guide §2.3; the oracle keeps COUNT(DISTINCT) so the differential
        # proves the per-doc distinctness assumption)
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
        .withColumn("contaminated", F.lit(True))
    )


_TOKS5 = "string_split(text, ' ')"
_GRAM5 = " || ' ' || ".join(f"{_TOKS5}[i+{k}]" for k in range(_CONTAM_N))
_SHINGLES5 = (
    f"CASE WHEN len({_TOKS5}) >= {_CONTAM_N} THEN "
    f"list_distinct(list_transform("
    f"generate_series(1, len({_TOKS5}) - {_CONTAM_N - 1}), i -> {_GRAM5})) "
    f"ELSE [array_to_string({_TOKS5}, ' ')] END"
)

DOCS_CONTAMINATION_SQL = f"""
WITH g AS (
  SELECT doc_id, source,
         unnest({_SHINGLES5}) AS gram
  FROM documents
),
ev AS (SELECT DISTINCT gram FROM g WHERE source = '{_EVAL_SOURCE}')
SELECT g.doc_id,
       COUNT(DISTINCT g.gram) AS n_shared_grams,
       TRUE AS contaminated
FROM g JOIN ev USING (gram)
WHERE g.source <> '{_EVAL_SOURCE}'
GROUP BY g.doc_id
"""


# --- docs_tf_keywords: per-document keyword extraction by (tf desc, df asc,
#     token asc) — the TF-IDF ordering realized in exact integers (higher
#     tf, then rarer across the corpus), no log() in sight so the rank is
#     engine-independent. Corpus document frequencies are a small vocab
#     aggregate, broadcast back onto the per-doc term counts.

_KEYWORDS_K = 3


def docs_tf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("token")
    )
    # tf feeds BOTH the broadcast df build and the probe side — the
    # broadcast exchange races on its own driver thread, so without a
    # materialization the tokenize+explode+agg scan executes twice (r15
    # profile: two ~0.6s duplicate jobs). Eager checkpoint at the
    # (doc, token) aggregated grain.
    tf = terms.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf")
    ).localCheckpoint(eager=True)
    df = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("token")
    )
    return (
        tf.join(F.broadcast(df), "token")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _KEYWORDS_K)
        .select("doc_id", "rank", "token", "tf", "df")
    )


DOCS_TF_KEYWORDS_SQL = f"""
WITH terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM terms GROUP BY doc_id, token
),
df AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY token
)
SELECT doc_id, rank, token, tf, df
FROM (
  SELECT doc_id, token, tf, df,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY tf DESC, df, token) AS INT) AS rank
  FROM tf JOIN df USING (token)
)
WHERE rank <= {_KEYWORDS_K}
"""


# --- docs_repetition_signals: Gopher-style intra-document repetition
#     measures (Rae et al. 2021 §A1.1: "fraction of characters in the most
#     common n-gram"-family rules, adapted to this corpus's whitespace
#     token streams). All counts are exact integers and every threshold is
#     an exact cross-multiplied rational, so the DuckDB differential holds
#     bit-for-bit. The mode counts are computed per-row with array HOFs
#     (O(distinct × tokens) per doc, JVM codegen, shuffle-free) — the
#     100 TB-correct shape: no explode/groupBy shuffle of the token stream
#     just to find a per-doc mode.

# top token > 20% of tokens:      5*top_token_cnt > n_tokens
_REP_TOK_DEN = 5
# top bigram > 15% of bigrams:    20*top_bigram_cnt > 3*n_bigrams
_REP_BG_NUM, _REP_BG_DEN = 3, 20
# distinct tokens < 40% of tokens: 5*n_distinct < 2*n_tokens
_REP_DIV_NUM, _REP_DIV_DEN = 2, 5


def _mode_count(arr):
    # occurrences of the most frequent element: for each distinct value,
    # count its occurrences in the full array, take the max (0 for empty)
    counts = F.transform(
        F.array_distinct(arr),
        lambda t: F.size(F.filter(arr, lambda x: x == t)).cast("long"),
    )
    return F.coalesce(F.array_max(counts), F.lit(0).cast("long"))


def docs_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .documents import _spread

    docs = _spread(load_table(spark, sf_dir, "documents"), spark)
    toks = TX.tokens(F.col("text"))
    staged = docs.select(
        "doc_id",
        "source",
        toks.alias("toks"),
        TX.shingles(toks, 2, distinct=False).alias("g2"),
    )
    base = staged.select(
        "doc_id",
        "source",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct_tokens"),
        _mode_count(F.col("toks")).alias("top_token_cnt"),
        F.size("g2").cast("long").alias("n_bigrams"),
        _mode_count(F.col("g2")).alias("top_bigram_cnt"),
    )
    r_tok = _REP_TOK_DEN * F.col("top_token_cnt") > F.col("n_tokens")
    r_bg = _REP_BG_DEN * F.col("top_bigram_cnt") > _REP_BG_NUM * F.col("n_bigrams")
    r_div = _REP_DIV_DEN * F.col("n_distinct_tokens") < _REP_DIV_NUM * F.col(
        "n_tokens"
    )
    reasons = (
        F.when(r_tok, 1).otherwise(0)
        + F.when(r_bg, 2).otherwise(0)
        + F.when(r_div, 4).otherwise(0)
    ).cast("int")
    return base.withColumn("reasons", reasons).withColumn(
        "keep", F.col("reasons") == 0
    )


_BG2 = "toks[i] || ' ' || toks[i+1]"
_GRAMS2_RAW = (
    "CASE WHEN len(toks) >= 2 THEN "
    f"list_transform(generate_series(1, len(toks) - 1), i -> {_BG2}) "
    "ELSE [array_to_string(toks, ' ')] END"
)
_MODE = (
    "COALESCE(list_max(list_transform(list_distinct({a}), "
    "t -> CAST(len(list_filter({a}, x -> x = t)) AS BIGINT))), 0)"
)

DOCS_REPETITION_SIGNALS_SQL = f"""
WITH t AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
),
g AS (
  SELECT doc_id, source, toks, {_GRAMS2_RAW} AS g2 FROM t
),
m AS (
  SELECT doc_id, source,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
         CAST({_MODE.format(a="toks")} AS BIGINT) AS top_token_cnt,
         CAST(len(g2) AS BIGINT) AS n_bigrams,
         CAST({_MODE.format(a="g2")} AS BIGINT) AS top_bigram_cnt
  FROM g
),
scored AS (
  SELECT *,
         CAST((CASE WHEN {_REP_TOK_DEN} * top_token_cnt > n_tokens
                THEN 1 ELSE 0 END)
            + (CASE WHEN {_REP_BG_DEN} * top_bigram_cnt
                         > {_REP_BG_NUM} * n_bigrams THEN 2 ELSE 0 END)
            + (CASE WHEN {_REP_DIV_DEN} * n_distinct_tokens
                         < {_REP_DIV_NUM} * n_tokens THEN 4 ELSE 0 END)
           AS INT) AS reasons
  FROM m
)
SELECT doc_id, source, n_tokens, n_distinct_tokens, top_token_cnt,
       n_bigrams, top_bigram_cnt, reasons, reasons = 0 AS keep
FROM scored
"""


# --- docs_curation_pipeline: the WHOLE curation pass as one declarative
#     plan — the chain a training-data build runs per snapshot: drop the
#     held-out eval shard, keep only quality survivors (Gopher rules),
#     collapse exact duplicates to their lowest-id winner, remove
#     benchmark-contaminated docs, and account the surviving corpus per
#     source. Each stage reuses the SAME logic as its standalone gate, so
#     the composition is differentially tested end-to-end; Catalyst fuses
#     the stages into one DAG (semi/anti hash joins on doc_id — no stage
#     materializes an intermediate corpus).


def docs_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    quality_keep = (
        docs_quality_filter(spark, sf_dir).filter(F.col("keep")).select("doc_id")
    )
    contaminated = docs_contamination(spark, sf_dir).select("doc_id")
    dedup_winners = (
        docs.groupBy(F.md5(F.col("text")).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = (
        docs.filter(F.col("source") != _EVAL_SOURCE)
        .join(quality_keep, "doc_id")
        .join(dedup_winners, "doc_id")
        .join(contaminated, "doc_id", "left_anti")
    )
    toks = F.size(TX.tokens(F.col("text"))).cast("long")
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).cast("long").alias("total_tokens"),
    )


DOCS_CURATION_PIPELINE_SQL = f"""
WITH q AS ({DOCS_QUALITY_FILTER_SQL}),
c AS ({DOCS_CONTAMINATION_SQL}),
w AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
kept AS (
  SELECT d.doc_id, d.source,
         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_toks
  FROM documents d
  JOIN q ON q.doc_id = d.doc_id AND q.keep
  JOIN w ON w.doc_id = d.doc_id
  WHERE d.source != '{_EVAL_SOURCE}'
    AND d.doc_id NOT IN (SELECT doc_id FROM c)
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens
FROM kept
GROUP BY source
"""


# --- docs_pii_scrub (TX10, beyond-ref): PII redaction pass — the standard
#     training-data hygiene step (emails / phone numbers stripped before
#     tokenization). The synthetic corpus contains no PII, so the gate
#     INJECTS it deterministically (md5(doc_id)-keyed, the
#     validation_quarantine injected-discrepancy doctrine: both engines
#     derive identical victims and payloads), scrubs with conservative
#     character-class regexes that mean the same thing under Java regex
#     (Spark) and RE2 (DuckDB), and accounts the redactions per source.
#     Per-row and shuffle-free except the final source rollup — at 100 TB
#     the scrub rides the same single scan as the rest of the curation
#     pipeline.

_EMAIL_RE = "[a-z0-9]+@[a-z0-9]+[.][a-z]+"
_PHONE_RE = "555-[0-9]{4}"


def docs_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .documents import _spread

    docs = _spread(load_table(spark, sf_dir, "documents"), spark)
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6),
               16, 10).cast("long")
    email = F.concat(F.lit(" contact user"), (h % 100).cast("string"),
                     F.lit("@example.com"))
    phone = F.concat(F.lit(" call 555-"),
                     F.lpad((h % 10000).cast("string"), 4, "0"))
    injected = F.concat(
        F.col("text"),
        F.when(h % 7 == 0, email).otherwise(F.lit("")),
        F.when(h % 5 == 0, phone).otherwise(F.lit("")),
    )
    staged = docs.select("doc_id", "source", injected.alias("txt"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("txt"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE, "<PHONE>",
    )
    per_doc = staged.select(
        "doc_id",
        "source",
        F.regexp_count(F.col("txt"), F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col("txt"), F.lit(_PHONE_RE)).alias("n_phones"),
        F.length("txt").alias("len_in"),
        F.length(scrubbed).alias("len_out"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("n_emails") > 0, 1).otherwise(0)).cast("long")
        .alias("n_email_docs"),
        F.sum(F.when(F.col("n_phones") > 0, 1).otherwise(0)).cast("long")
        .alias("n_phone_docs"),
        F.sum("n_emails").cast("long").alias("total_emails"),
        F.sum("n_phones").cast("long").alias("total_phones"),
        F.sum("len_in").cast("long").alias("chars_in"),
        F.sum("len_out").cast("long").alias("chars_out"),
    )


DOCS_PII_SCRUB_SQL = f"""
WITH inj AS (
  SELECT doc_id, source,
         text
         || CASE WHEN h % 7 = 0
                 THEN ' contact user' || CAST(h % 100 AS VARCHAR)
                      || '@example.com' ELSE '' END
         || CASE WHEN h % 5 = 0
                 THEN ' call 555-' || lpad(CAST(h % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END AS txt
  FROM (SELECT *,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)
                    AS BIGINT) AS h
        FROM documents)
),
per_doc AS (
  SELECT doc_id, source,
         len(regexp_extract_all(txt, '{_EMAIL_RE}')) AS n_emails,
         len(regexp_extract_all(txt, '{_PHONE_RE}')) AS n_phones,
         length(txt) AS len_in,
         length(regexp_replace(regexp_replace(txt, '{_EMAIL_RE}', '<EMAIL>',
                                              'g'),
                               '{_PHONE_RE}', '<PHONE>', 'g')) AS len_out
  FROM inj
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN n_emails > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_email_docs,
       CAST(SUM(CASE WHEN n_phones > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_phone_docs,
       CAST(SUM(n_emails) AS BIGINT) AS total_emails,
       CAST(SUM(n_phones) AS BIGINT) AS total_phones,
       CAST(SUM(len_in) AS BIGINT) AS chars_in,
       CAST(SUM(len_out) AS BIGINT) AS chars_out
FROM per_doc
GROUP BY source
"""


# --- docs_k_anonymity: privacy-release audit (r15) — k-anonymity AND
#     l-diversity over the quasi-identifier tuple (source, lang, length
#     bucket) with a GENERALIZATION LADDER, the mechanic every
#     Mondrian-style anonymizer applies before a corpus ships: a group
#     of < K docs is re-identifiable, so its QI coarsens one level at a
#     time until the group clears K — level 0 = 64-char length buckets,
#     level 1 = 256-char buckets, level 2 = (source, lang), level 3 =
#     source only, level 4 = suppress. k-anonymity alone is vulnerable
#     to the homogeneity attack (all K rows share the sensitive value),
#     so each level-0 group also carries its l-diversity stats over a
#     deterministic md5-injected 8-class sensitive label (the corpus
#     ships no sensitive attribute — the docs_pii_scrub injection
#     precedent, seeded 'sens:' so it is independent of the PII draw):
#     l_distinct = #distinct sensitive classes in the group,
#     sens_mode_ppm = the modal class share (the recursive
#     (c,l)-diversity ingredient; 1000000 == homogeneous == attackable).
#     l-diversity in turn misses the SKEWNESS attack (a diverse group
#     whose distribution still differs wildly from the corpus leaks
#     information), so each group also carries t_closeness_ppm — the
#     ordered-EMD distance between the group's sensitive-class
#     distribution and the corpus-wide one, computed EXACTLY in integer
#     ppm: the 1-D earth-mover distance over an ordered m-class axis is
#     the mean absolute CDF gap, sum_c |F_g(c) - F_corpus(c)| / (m-1),
#     with every CDF value an integer ppm (cum*1e6 DIV n — identical
#     truncation in both engines). The full privacy-release triad
#     (k-anonymity / l-diversity / t-closeness) on one QI grain.
#     Output = one row per level-0 QI group; levels 0-3 all populated
#     at both gate SFs; K=5. All integers. 100 TB: the finest grain is
#     (QI, sens) — bounded by corpus grouping structure, never by doc
#     count — then four hash aggs on coarser QI grains broadcast back;
#     the corpus CDF is ONE map-side-combined pass yielding 8 longs
#     (bounded collect). Beyond-ref (the LLM-pipeline privacy mandate,
#     TX10's release-audit sibling). Oracle = COUNT(*) OVER window
#     partitions on the DOC grain (incl. per-(QI,sens) counts and the
#     OVER () corpus CDF) + DISTINCT — a different evaluation strategy
#     from the groupBy+broadcast-join ladder.

KANON_K = 5


def docs_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    sens = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("sens:"),
                               F.col("doc_id").cast("string"))), 1, 1
            ),
            16, 10,
        ).cast("long") % 8
    )
    d = load_table(spark, sf_dir, "documents").select(
        "source", "lang",
        F.expr("n_chars DIV 64").alias("len_bucket"),
        sens.alias("sens"),
    )
    gs = d.groupBy("source", "lang", "len_bucket", "sens").agg(
        F.count(F.lit(1)).alias("sc")
    )
    # g0 feeds FOUR consumers (the s1/s2/s3 broadcast builds + the main
    # probe) plus the corpus-CDF collect below — unmaterialized, the
    # documents scan + two-level agg executed once per consumer (r15
    # profile). Eager localCheckpoint at the quasi-identifier group grain
    # (a few hundred rows at any SF: source x lang x len_bucket).
    g0 = gs.groupBy("source", "lang", "len_bucket").agg(
        F.sum("sc").alias("group_size"),
        F.count(F.lit(1)).alias("l_distinct"),
        F.max("sc").alias("max_sens"),
        # the 7 CDF evaluation points of the 8-class ordered axis, as
        # conditional sums in the SAME agg (the r13 fuse-into-one-pass
        # lesson — no per-class crossJoin/dense-fill needed)
        *[
            F.sum(F.when(F.col("sens") <= c, F.col("sc")).otherwise(0))
            .alias(f"cum{c}")
            for c in range(7)
        ],
    ).localCheckpoint(eager=True)
    # corpus-wide CDF: exact integer sums over the checkpointed group
    # frame (sum of per-group conditional counts == the corpus count, so
    # the values are bit-identical to the former full-corpus pass) — 8
    # longs of driver state, no second documents scan
    grow = g0.agg(
        F.sum("group_size").alias("n"),
        *[F.sum(f"cum{c}").alias(f"gcum{c}") for c in range(7)],
    ).collect()[0]
    gn = int(grow["n"])
    gf = [int(grow[f"gcum{c}"]) * 1000000 // gn for c in range(7)]
    t_terms = " + ".join(
        f"abs(cum{c} * 1000000 DIV group_size - {gf[c]})"
        for c in range(7)
    )
    s1 = g0.groupBy(
        "source", "lang", F.expr("len_bucket DIV 4").alias("b256")
    ).agg(F.sum("group_size").alias("size1"))
    s2 = g0.groupBy("source", "lang").agg(
        F.sum("group_size").alias("size2")
    )
    s3 = g0.groupBy("source").agg(F.sum("group_size").alias("size3"))
    k = KANON_K
    return (
        g0.withColumn("b256", F.expr("len_bucket DIV 4"))
        .join(F.broadcast(s1), ["source", "lang", "b256"])
        .join(F.broadcast(s2), ["source", "lang"])
        .join(F.broadcast(s3), ["source"])
        .select(
            "source",
            "lang",
            F.col("len_bucket").cast("long").alias("len_bucket"),
            F.col("group_size").cast("long").alias("group_size"),
            F.when(F.col("group_size") >= k, 0)
            .when(F.col("size1") >= k, 1)
            .when(F.col("size2") >= k, 2)
            .when(F.col("size3") >= k, 3)
            .otherwise(4)
            .cast("long")
            .alias("anon_level"),
            F.col("l_distinct").cast("long").alias("l_distinct"),
            F.expr("max_sens * 1000000 DIV group_size").cast("long")
            .alias("sens_mode_ppm"),
            F.expr(f"({t_terms}) DIV 7").cast("long")
            .alias("t_closeness_ppm"),
        )
    )


_KANON_CUM_COLS = ",\n".join(
    f"         SUM(CASE WHEN sens <= {c} THEN 1 ELSE 0 END)"
    f" OVER (PARTITION BY source, lang, b64) AS cum{c},\n"
    f"         SUM(CASE WHEN sens <= {c} THEN 1 ELSE 0 END)"
    f" OVER () AS gcum{c}"
    for c in range(7)
)
_KANON_T_TERMS = " + ".join(
    f"abs(cum{c} * 1000000 // size0 - gcum{c} * 1000000 // gn)"
    for c in range(7)
)

DOCS_K_ANONYMITY_SQL = f"""
WITH d AS (
  SELECT source, lang, n_chars // 64 AS b64,
         CAST('0x' || substr(md5('sens:' || CAST(doc_id AS VARCHAR)),
                             1, 1) AS BIGINT) % 8 AS sens
  FROM documents
),
per AS (
  SELECT source, lang, b64, sens,
         COUNT(*) OVER (PARTITION BY source, lang, b64) AS size0,
         COUNT(*) OVER (PARTITION BY source, lang, b64 // 4) AS size1,
         COUNT(*) OVER (PARTITION BY source, lang) AS size2,
         COUNT(*) OVER (PARTITION BY source) AS size3,
         COUNT(*) OVER (PARTITION BY source, lang, b64, sens) AS sc,
         COUNT(*) OVER () AS gn,
{_KANON_CUM_COLS}
  FROM d
),
per2 AS (
  SELECT *,
         COUNT(DISTINCT sens) OVER (PARTITION BY source, lang, b64)
           AS l_distinct,
         MAX(sc) OVER (PARTITION BY source, lang, b64) AS max_sens
  FROM per
)
SELECT DISTINCT source, lang,
       CAST(b64 AS BIGINT) AS len_bucket,
       CAST(size0 AS BIGINT) AS group_size,
       CAST(CASE WHEN size0 >= {KANON_K} THEN 0
                 WHEN size1 >= {KANON_K} THEN 1
                 WHEN size2 >= {KANON_K} THEN 2
                 WHEN size3 >= {KANON_K} THEN 3
                 ELSE 4 END AS BIGINT) AS anon_level,
       CAST(l_distinct AS BIGINT) AS l_distinct,
       CAST(max_sens * 1000000 // size0 AS BIGINT) AS sens_mode_ppm,
       CAST(({_KANON_T_TERMS}) // 7 AS BIGINT) AS t_closeness_ppm
FROM per2
"""


# --- docs_bm25_search: BM25-shaped lexical retrieval (the keyword-search
#     counterpart of the vector knn_* family — together they form the
#     hybrid-retrieval pair a data pipeline uses for corpus triage). The
#     reference's closest surface is token-filtered discovery
#     (src/api.ts discover handler); this generalizes it to ranked
#     multi-term scoring.
#
#     Determinism: the classic BM25 idf is ln((N-df+0.5)/(df+0.5)+1) — a
#     transcendental whose last ulp differs between the JVM and DuckDB's
#     libm, so we use the LN-FREE RATIONAL SURROGATE
#     idf = (2N-2df+1)/(2df+1) (the ln argument itself, cross-multiplied;
#     strictly monotone in df, so per-term ordering is preserved). Every
#     per-term component is a chain of IEEE double ops on exact-integer
#     inputs written op-for-op identically in both engines; the per-doc sum
#     over matched terms goes through determinism.dsum (order-free exact
#     quantized sum), and ranking tiebreaks on doc_id.
#
#     100 TB: tf/df are the standard inverted-index aggregates (one shuffle
#     each, map-side combined); the query-term table and the vocab-sized df
#     table broadcast; the corpus is scanned once and never re-shuffled
#     except the final (query_id, doc_id) partial-agg. Top-k is TakeOrdered
#     per query.

_BM25_K = 10
_BM25_QUERIES: list[tuple[int, str]] = [
    (0, "spark"), (0, "join"), (0, "stream"),
    (1, "table"), (1, "scan"), (1, "merge"),
    (2, "slow"), (2, "query"), (2, "window"),
]


def docs_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # dl feeds the stats broadcast AND the scoring join; tf feeds the
    # dfreq broadcast AND the main probe — each broadcast exchange builds
    # on its own driver thread, so left lazy the corpus was tokenized
    # FOUR times per execution (r15 profile: four ~0.5s scan jobs).
    # Eager checkpoints cut that to one tokenize pass per frame; both
    # frames are post-aggregation grain (per-doc / per-(doc,token)), the
    # same bytes a shuffle would materialize at any scale.
    dl = docs.select(
        "doc_id", TX.token_count(F.col("text")).alias("dl")
    ).localCheckpoint(eager=True)
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    terms = docs.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("token"))
    tf = (
        terms.groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfreq = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    qterms = spark.createDataFrame(_BM25_QUERIES, "query_id long, token string")
    m = (
        tf.join(F.broadcast(qterms), "token")
        .join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    dfd = F.col("df").cast("double")
    nd = F.col("n_docs").cast("double")
    # op-for-op mirror of the SQL below — do not refactor one side alone
    sat = (tfd * (F.lit(1.2) + F.lit(1.0))) / (
        tfd + F.lit(1.2) * (F.lit(1.0) - F.lit(0.75) + F.lit(0.75) * dld / F.col("avgdl"))
    )
    idf = (F.lit(2.0) * nd - F.lit(2.0) * dfd + F.lit(1.0)) / (
        F.lit(2.0) * dfd + F.lit(1.0)
    )
    scored = m.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        DET.dsum(idf * sat, "score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _BM25_K)
        .select("query_id", "rank", "doc_id", "n_terms", "score")
    )


_BM25_VALUES = ", ".join(f"({q}, '{t}')" for q, t in _BM25_QUERIES)

_BM25_COMPONENT = (
    "((2.0 * n_docs - 2.0 * df + 1.0) / (2.0 * df + 1.0))"
    " * ((tf * (1.2 + 1.0)) / "
    "(tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))"
)

DOCS_BM25_SEARCH_SQL = f"""
WITH dl AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM terms GROUP BY doc_id, token
),
dfreq AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY token
),
qterms(query_id, token) AS (VALUES {_BM25_VALUES}),
m AS (
  SELECT q.query_id, tf.doc_id,
         CAST(tf.tf AS DOUBLE) AS tf, CAST(dfreq.df AS DOUBLE) AS df,
         CAST(dl.dl AS DOUBLE) AS dl,
         CAST(s.n_docs AS DOUBLE) AS n_docs, s.avgdl AS avgdl
  FROM tf
  JOIN qterms q USING (token)
  JOIN dfreq USING (token)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
),
scored AS (
  SELECT query_id, doc_id, COUNT(*) AS n_terms,
         {{DSUM}}
  FROM m GROUP BY query_id, doc_id
)
SELECT query_id, rank, doc_id, n_terms, score
FROM (
  SELECT query_id, doc_id, n_terms, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id) AS BIGINT)
           AS rank
  FROM scored
)
WHERE rank <= {_BM25_K}
""".replace("{DSUM}", DET.sql_dsum(_BM25_COMPONENT, "score"))


# --- docs_mixture_weights: per-source sampling weights for training-data
#     mixing — the "how much of each corpus shard goes into the run"
#     step downstream of curation (temperature-scaled sampling à la
#     multilingual LM training: w_s ∝ n_tokens^α with α = 1/2 flattens
#     the head sources and boosts the tail vs proportional sampling).
#
#     Determinism: n_tokens^0.5 is a single correctly-rounded IEEE sqrt
#     (identical in both engines), immediately floor-quantized to integer
#     micro-units; normalization happens entirely in integer space
#     (exact sums, integer division to ppm), so the output is bit-exact
#     with no float-sum discipline needed. Spark `div` on DECIMAL(38,0)
#     and DuckDB HUGEINT `//` agree for the non-negative operands here;
#     the decimal/hugeint widening keeps the ppm scale-up overflow-safe
#     at 100 TB token counts (sqrt(1e15)·1e6·1e6 > int64).
#
#     Scale: one groupBy(source) over the corpus (map-side combined), a
#     scalar total broadcast back — the output is sources-sized.

def docs_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(TX.token_count(F.col("text"))).cast("long").alias("n_tokens"),
    )
    q = per_src.withColumn(
        "sqrt_tokens_micro",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * F.lit(1e6)).cast("long"),
    )
    totals = q.agg(
        F.sum("sqrt_tokens_micro").cast("long").alias("total_q"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )
    return (
        q.crossJoin(F.broadcast(totals))
        .withColumn(
            "weight_ppm",
            F.expr(
                "CAST(sqrt_tokens_micro AS DECIMAL(38,0)) * 1000000 div total_q"
            ).cast("long"),
        )
        .withColumn(
            "prop_ppm",
            F.expr(
                "CAST(n_tokens AS DECIMAL(38,0)) * 1000000 div total_tokens"
            ).cast("long"),
        )
        .select(
            "source", "n_docs", "n_tokens", "sqrt_tokens_micro",
            "weight_ppm", "prop_ppm",
        )
    )


DOCS_MIXTURE_WEIGHTS_SQL = """
WITH per_src AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
q AS (
  SELECT source, n_docs, n_tokens,
         CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT)
           AS sqrt_tokens_micro
  FROM per_src
),
totals AS (
  SELECT CAST(SUM(sqrt_tokens_micro) AS BIGINT) AS total_q,
         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
  FROM q
)
SELECT source, n_docs, n_tokens, sqrt_tokens_micro,
       CAST((CAST(sqrt_tokens_micro AS HUGEINT) * 1000000) // total_q
            AS BIGINT) AS weight_ppm,
       CAST((CAST(n_tokens AS HUGEINT) * 1000000) // total_tokens
            AS BIGINT) AS prop_ppm
FROM q CROSS JOIN totals
"""


# --- docs_training_mix: TX12+TX11 capstone — MATERIALIZE the temperature-
#     mixed training set the mixture-weights op only rates. Per source,
#     the α=1/2 weight (sqrt-token share in exact ppm, same arithmetic as
#     docs_mixture_weights) buys n_pick = max(1, weight_ppm·B div 1e6)
#     slots of a fixed budget B; the slots are filled in the md5-keyed
#     reproducible shuffle order (same key discipline as
#     docs_shuffle_shards, its own salt), so the materialized mix is a
#     pure function of the corpus. One agg + one broadcast of the ~20-row
#     quota table + one per-source rank window — no corpus×corpus work.

MIX_BUDGET = 200
_MIX_SALT = "training-mix-r5"


def docs_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.sum(TX.token_count(F.col("text"))).cast("long").alias("n_tokens")
    )
    q = per_src.withColumn(
        "q_micro",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * F.lit(1e6)).cast("long"),
    )
    totals = q.agg(F.sum("q_micro").cast("long").alias("total_q"))
    quota = (
        q.crossJoin(F.broadcast(totals))
        .withColumn(
            "weight_ppm",
            F.expr("CAST(q_micro AS DECIMAL(38,0)) * 1000000 div total_q").cast(
                "long"
            ),
        )
        .withColumn(
            "n_pick",
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(f"weight_ppm * {MIX_BUDGET} div 1000000"),
            ),
        )
        .select("source", "n_pick")
    )
    keyed = docs.select(
        "source",
        "doc_id",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_MIX_SALT))).alias(
            "mix_key"
        ),
    )
    w = Window.partitionBy("source").orderBy(F.asc("mix_key"), F.asc("doc_id"))
    ranked = keyed.withColumn("pick_rank", F.row_number().over(w).cast("long"))
    return (
        ranked.join(F.broadcast(quota), "source")
        .filter(F.col("pick_rank") <= F.col("n_pick"))
        .select("source", "pick_rank", "doc_id", "n_pick")
    )


DOCS_TRAINING_MIX_SQL = f"""
WITH per_src AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
q AS (
  SELECT source,
         CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS q_micro
  FROM per_src
),
totals AS (SELECT CAST(SUM(q_micro) AS BIGINT) AS total_q FROM q),
quota AS (
  SELECT source,
         GREATEST(1, CAST((CAST(q_micro AS HUGEINT) * 1000000) // total_q
                          AS BIGINT) * {MIX_BUDGET} // 1000000) AS n_pick
  FROM q CROSS JOIN totals
),
ranked AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR) || '{_MIX_SALT}'), doc_id
         ) AS pick_rank
  FROM documents
)
SELECT r.source, CAST(r.pick_rank AS BIGINT) AS pick_rank, r.doc_id,
       CAST(q.n_pick AS BIGINT) AS n_pick
FROM ranked r JOIN quota q USING (source)
WHERE r.pick_rank <= q.n_pick
"""


# --- customer_name_neardup: entity-resolution / fuzzy-match — FastSS
#     edit-distance blocking. Candidates = pairs sharing ANY deletion-
#     neighborhood variant (the name itself + each single-character
#     deletion: 19 variants for the fixture's fixed 18-char names), an
#     equi-join on the variant string; exact verification keeps
#     levenshtein <= 1. The fourth lossless-candidate-generation gate
#     (after LSH, PPJoin, interval buckets): the DuckDB oracle finds the
#     same pairs by a COMPLETELY different route — for zero-padded
#     numeric names, edit distance <= 1 == hamming <= 1 == the keys
#     differ by d*10^p WITH NO CARRY ((k div 10^p) mod 10 + d <= 9), an
#     integer candidate join with no string ops at all. 100 TB: the
#     variant join is the only shuffle, expansion factor = name length;
#     at real scale variants would hash (xxhash64) instead of shipping
#     raw strings (the dup-gram index lesson).

_NAME_LEN = 18


def _name_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FastSS blocking + exact levenshtein<=1 verify — the matched-pair
    stage shared by the neardup stats gate and the entity-clusters gate."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), F.col("c_name").alias("name")
    )
    variants = F.array(
        F.col("name"),
        *[
            F.concat(
                F.substring("name", 1, i - 1),
                F.substring("name", i + 1, _NAME_LEN),
            )
            for i in range(1, _NAME_LEN + 1)
        ],
    )
    va = cust.select("k", "name", F.explode(variants).alias("v"))
    a = va.select(F.col("k").alias("ka"), F.col("name").alias("na"), "v")
    b = va.select(F.col("k").alias("kb"), F.col("name").alias("nb"), "v")
    return (
        a.join(b, "v")
        .filter(F.col("ka") < F.col("kb"))
        .filter(F.levenshtein("na", "nb") <= 1)
        .select("ka", "kb")
        .distinct()
    )


def customer_name_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _name_match_pairs(spark, sf_dir)
    return (
        pairs.groupBy(F.expr("ka DIV 100").alias("block"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("ka").alias("n_left"),
        )
        .select("block", "n_pairs", "n_left")
    )


CUSTOMER_NAME_NEARDUP_SQL = """
WITH ks AS (SELECT c_custkey AS k FROM customer),
cand AS (
  -- numeric characterization: zero-padded names are edit-distance<=1
  -- exactly when keys differ by d*10^p with no decimal carry
  SELECT a.k AS ka, a.k + d.d * CAST(POWER(10, p.p) AS BIGINT) AS kb
  FROM ks a,
       (SELECT unnest(generate_series(1, 9)) AS d) d,
       (SELECT unnest(generate_series(0, 8)) AS p) p
  WHERE ((a.k // CAST(POWER(10, p.p) AS BIGINT)) % 10) + d.d <= 9
),
pairs AS (
  SELECT c.ka, c.kb FROM cand c JOIN ks b ON c.kb = b.k
)
SELECT ka // 100 AS block,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT ka) AS BIGINT) AS n_left
FROM pairs
GROUP BY 1
"""


# --- docs_fold_assignment: deterministic k-fold train/val splits — the
#     md5-keyed fold id every training pipeline needs to be reproducible
#     across runs AND cluster sizes (same property as the shuffle/mix
#     gates). Output = per (source, fold) counts plus each fold's
#     deviation from the expected uniform share in ppm, so the gate
#     pins both the assignment and its balance.

_N_FOLDS = 5


def docs_fold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fold = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long") % _N_FOLDS
    )
    per = docs.select("source", fold.alias("fold")).groupBy(
        "source", "fold"
    ).agg(F.count(F.lit(1)).alias("n"))
    return per.withColumn(
        "dev_ppm",
        F.expr(
            f"abs(CAST(n * {_N_FOLDS} * 1000000 AS BIGINT) "
            "DIV SUM(n) OVER (PARTITION BY source) - 1000000)"
        ),
    )


DOCS_FOLD_ASSIGNMENT_SQL = f"""
WITH per AS (
  SELECT source,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)
           % {_N_FOLDS} AS fold,
         COUNT(*) AS n
  FROM documents GROUP BY 1, 2
)
SELECT source, fold, CAST(n AS BIGINT) AS n,
       abs(CAST(n * {_N_FOLDS} * 1000000 AS BIGINT)
             // CAST(SUM(n) OVER (PARTITION BY source) AS BIGINT)
           - 1000000) AS dev_ppm
FROM per
"""


# --- docs_length_buckets: length-bucketed batching — group documents
#     into power-of-two token-length buckets and assign deterministic
#     batch ids inside each bucket (md5-keyed order, batch = rank DIV
#     batch_size), the padding-efficiency move every LM data loader
#     makes. Reports per-bucket doc counts, batch counts, and the
#     padding waste the bucketing saves: tokens padded to the bucket
#     ceiling vs to the corpus max, in exact integer tokens.

_BATCH_SIZE = 32


def docs_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(TX.tokens(F.col("text")))
    base = docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.expr(
            "CAST(power(2, ceil(log2(GREATEST(size(split(text, ' ')), 1))) ) "
            "AS BIGINT)"
        ).alias("bucket_ceiling"),
    )
    w = Window.partitionBy("bucket_ceiling").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    batched = base.withColumn(
        "batch_id", F.expr(f"(row_number() OVER (PARTITION BY bucket_ceiling "
                           f"ORDER BY md5(CAST(doc_id AS STRING)), doc_id) - 1)"
                           f" DIV {_BATCH_SIZE}")
    )
    gmax = base.agg(F.max("n_tokens").alias("m")).collect()[0]["m"]  # scalar
    return batched.groupBy("bucket_ceiling").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("batch_id").alias("n_batches"),
        F.sum("n_tokens").alias("sum_tokens"),
        (F.sum(F.col("bucket_ceiling") - F.col("n_tokens"))).alias(
            "pad_bucketed"
        ),
        F.sum(F.lit(int(gmax)) - F.col("n_tokens")).alias("pad_global"),
    )


DOCS_LENGTH_BUCKETS_SQL = f"""
WITH base AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(power(2, ceil(log2(GREATEST(len(string_split(text, ' ')), 1))))
              AS BIGINT) AS bucket_ceiling
  FROM documents
),
gmax AS (SELECT MAX(n_tokens) AS m FROM base),
batched AS (
  SELECT *,
         (ROW_NUMBER() OVER (PARTITION BY bucket_ceiling
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1)
           // {_BATCH_SIZE} AS batch_id
  FROM base
)
SELECT bucket_ceiling,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT batch_id) AS BIGINT) AS n_batches,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(SUM(bucket_ceiling - n_tokens) AS BIGINT) AS pad_bucketed,
       CAST(SUM(gmax.m - n_tokens) AS BIGINT) AS pad_global
FROM batched, gmax
GROUP BY bucket_ceiling, gmax.m
"""


# --- docs_vocab_divergence: vocabulary divergence between sources —
#     the corpus-mixing diagnostic: pairwise L1 distance (2x total
#     variation) between per-source token distributions, entirely in
#     integer ppm (each source's token mass normalized to ppm BEFORE
#     the |p_a - p_b| sum, full outer over the union vocabulary so
#     exclusive tokens count their whole mass). Pairs = the 3
#     lexicographically first sources (deterministic at every SF).
#     L1 of ppm vectors is exact integer arithmetic end-to-end — no
#     log, no float (the JS/KL variants need ln and are left to
#     sketch-land; L1 bounds both).

_VOCABDIV_SOURCES = 3


def docs_vocab_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(TX.tokens(F.col("text"))).alias("tok")
    )
    srcs = [
        r[0]
        for r in toks.select("source").distinct().orderBy("source")
        .limit(_VOCABDIV_SOURCES).collect()  # 3 names, driver-sized
    ]
    counts = (
        toks.filter(F.col("source").isin(srcs))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("source")
    ppm = counts.withColumn(
        "ppm",
        F.expr("CAST(n * 1000000 AS BIGINT) DIV SUM(n) OVER (PARTITION BY source)"),
    )
    pairs = [(a, b) for i, a in enumerate(srcs) for b in srcs[i + 1:]]
    outs = []
    for sa, sb in pairs:
        a = ppm.filter(F.col("source") == sa).select(
            "tok", F.col("ppm").alias("pa")
        )
        b = ppm.filter(F.col("source") == sb).select(
            "tok", F.col("ppm").alias("pb")
        )
        l1 = (
            a.join(b, "tok", "full_outer")
            .select(
                F.abs(
                    F.coalesce("pa", F.lit(0)) - F.coalesce("pb", F.lit(0))
                ).alias("d"),
                F.lit(1).alias("one"),
            )
            .agg(
                F.sum("d").alias("l1_ppm"),
                F.count(F.lit(1)).alias("n_union_vocab"),
            )
            .select(
                F.lit(sa).alias("src_a"),
                F.lit(sb).alias("src_b"),
                F.col("l1_ppm").cast("long").alias("l1_ppm"),
                F.col("n_union_vocab").cast("long").alias("n_union_vocab"),
            )
        )
        outs.append(l1)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


DOCS_VOCAB_DIVERGENCE_SQL = f"""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
),
srcs AS (
  SELECT source, ROW_NUMBER() OVER (ORDER BY source) AS sr
  FROM (SELECT DISTINCT source FROM toks)
  QUALIFY sr <= {_VOCABDIV_SOURCES}
),
ppm AS (
  SELECT t.source, t.tok,
         CAST(COUNT(*) * 1000000 AS BIGINT)
           // CAST(SUM(COUNT(*)) OVER (PARTITION BY t.source) AS BIGINT)
           AS ppm
  FROM toks t JOIN srcs s ON t.source = s.source
  GROUP BY 1, 2
),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b
  FROM srcs a JOIN srcs b ON a.sr < b.sr
),
joined AS (
  SELECT p.src_a, p.src_b, v.tok,
         COALESCE(MAX(CASE WHEN v.source = p.src_a THEN v.ppm END), 0) AS pa,
         COALESCE(MAX(CASE WHEN v.source = p.src_b THEN v.ppm END), 0) AS pb
  FROM pairs p JOIN ppm v ON v.source IN (p.src_a, p.src_b)
  GROUP BY 1, 2, 3
)
SELECT src_a, src_b,
       CAST(SUM(abs(pa - pb)) AS BIGINT) AS l1_ppm,
       CAST(COUNT(*) AS BIGINT) AS n_union_vocab
FROM joined
GROUP BY 1, 2
"""


# --- docs_robust_scaled: robust-scaler feature normalization — the
#     preprocessing twin of the median/MAD outlier rule: each doc's
#     length normalized per source as (n_chars - med) * 1e6 DIV mad
#     (integer "robust z-score" in ppm; med/mad are nearest-rank with
#     (value, doc_id) tiebreaks, mad floored at 1 so the division is
#     total). Emits only the tails (|scaled| > 2e6 ≈ beyond 2 robust
#     sigmas) so the gate output stays small while pinning the full
#     normalization arithmetic.


def docs_robust_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("x")
    )

    def nr_med(df, val, alias):
        w = Window.partitionBy("source").orderBy(val, "doc_id")
        r = df.withColumn("vr", F.row_number().over(w)).withColumn(
            "k", F.count(F.lit(1)).over(Window.partitionBy("source"))
        )
        return r.filter(
            F.col("vr") == F.expr("CAST(ceil(k / 2) AS BIGINT)")
        ).select("source", F.col(val).alias(alias))

    med = nr_med(docs, "x", "med")
    dev = docs.join(F.broadcast(med), "source").withColumn(
        "dev", F.abs(F.col("x") - F.col("med"))
    )
    mad = nr_med(dev.withColumnRenamed("dev", "x2").withColumnRenamed("x", "x_orig").withColumnRenamed("x2", "x"), "x", "mad_raw")
    mad = mad.select("source", F.greatest(F.col("mad_raw"), F.lit(1)).alias("mad"))
    return (
        dev.join(F.broadcast(mad), "source")
        .withColumn("scaled_ppm", F.expr("(x - med) * 1000000 DIV mad"))
        .filter(F.abs(F.col("scaled_ppm")) > 2_000_000)
        .select("doc_id", "source", "x", "med", "mad", "scaled_ppm")
    )


DOCS_ROBUST_SCALED_SQL = """
WITH docs AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS x FROM documents
),
medr AS (
  SELECT source, x AS med FROM (
    SELECT source, x,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY x, doc_id) AS vr,
           COUNT(*) OVER (PARTITION BY source) AS k
    FROM docs
  ) WHERE vr = CAST(ceil(k / 2) AS BIGINT)
),
dev AS (
  SELECT d.doc_id, d.source, d.x, m.med, abs(d.x - m.med) AS dv
  FROM docs d JOIN medr m USING (source)
),
madr AS (
  SELECT source, GREATEST(dv, 1) AS mad FROM (
    SELECT source, dv,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY dv, doc_id) AS vr,
           COUNT(*) OVER (PARTITION BY source) AS k
    FROM dev
  ) WHERE vr = CAST(ceil(k / 2) AS BIGINT)
)
SELECT d.doc_id, d.source, d.x, d.med, ma.mad,
       (d.x - d.med) * 1000000 // ma.mad AS scaled_ppm
FROM dev d JOIN madr ma USING (source)
WHERE abs((d.x - d.med) * 1000000 // ma.mad) > 2000000
"""


# --- docs_novelty_curve: corpus novelty profiling — for documents in
#     doc_id order, what fraction of each doc's distinct 3-grams was
#     never seen in ANY earlier doc (the dedup-ROI curve: a corpus
#     whose novelty collapses is one deduplication will shrink). The
#     first-seen trick again (one min-agg per gram — no quadratic
#     "seen so far" state): a gram is novel exactly in the doc that
#     owns its min doc_id. Reported per 100-doc bucket in exact ppm so
#     the curve's shape is gate-pinned.


def docs_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(TX.shingles(TX.tokens(F.col("text")), 3, distinct=True)).alias(
            "g"
        ),
    )
    owner = grams.groupBy("g").agg(F.min("doc_id").alias("owner"))
    flagged = grams.join(owner, "g").select(
        "doc_id", (F.col("doc_id") == F.col("owner")).cast("long").alias("novel")
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("novel").alias("n_novel"),
    )
    return (
        per_doc.groupBy(F.expr("doc_id DIV 100").alias("doc_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_grams").alias("n_grams"),
            F.sum("n_novel").alias("n_novel"),
        )
        .withColumn(
            "novelty_ppm",
            F.expr("CAST(n_novel * 1000000 AS BIGINT) DIV n_grams"),
        )
    )


DOCS_NOVELTY_CURVE_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(CASE WHEN len(t) >= 3 THEN
             list_distinct(list_transform(generate_series(1, len(t) - 2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
           ELSE [array_to_string(t, ' ')] END) AS g
  FROM toks
),
owner AS (SELECT g, MIN(doc_id) AS owner FROM grams GROUP BY 1),
per_doc AS (
  SELECT gr.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN gr.doc_id = o.owner THEN 1 ELSE 0 END)
              AS BIGINT) AS n_novel
  FROM grams gr JOIN owner o USING (g)
  GROUP BY 1
)
SELECT doc_id // 100 AS doc_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_grams) AS BIGINT) AS n_grams,
       CAST(SUM(n_novel) AS BIGINT) AS n_novel,
       CAST(SUM(n_novel) * 1000000 AS BIGINT) // CAST(SUM(n_grams) AS BIGINT)
         AS novelty_ppm
FROM per_doc
GROUP BY 1
"""


# --- docs_bpe_merges: BPE tokenizer MERGE TRAINING at corpus scale — the
#     missing piece between token counting (TX3, which consumes a
#     tokenizer) and the training mix: learning the tokenizer itself
#     (Sennrich et al. 2016). The classic algorithm is inherently
#     iterative: count adjacent symbol pairs, merge the most frequent,
#     repeat. Its scale shape is exactly what this gate encodes: ONE
#     corpus scan builds the word-frequency table, and every iteration
#     after that touches only vocabulary-sized state (the word → symbol
#     array frame), never the corpus again — the reason real tokenizer
#     training over TB-scale corpora is cheap after the first pass.
#
#     Semantics pinned by the differential (both engines, exactly):
#     - pair counts are weighted by word frequency and count OVERLAPPING
#       occurrences ("aaa" contributes (a,a) twice) — the Sennrich
#       counting rule;
#     - winner = (count DESC, pair-string ASC) unique tiebreak;
#     - the merge itself is GREEDY LEFT-TO-RIGHT NON-OVERLAPPING within
#       each word ("aaaa" + (a,a) -> [aa, aa], "aaa" -> [aa, a]), run as
#       a left fold: Spark F.aggregate over the symbol array vs the
#       oracle's per-word recursive-CTE automaton — closed-form HOF fold
#       and literal sequential automaton pin each other (the
#       events_sequence_match differential pattern);
#     - realized merges per iteration = symbols_before - symbols_after
#       <= proposed pair count (overlaps collapse), both emitted.
#
#     Driver state per iteration is ONE collected row (the argmax pair) —
#     the kmeans_train k-row re-broadcast doctrine; the output frame is
#     assembled from K such scalars plus per-iteration corpus-level
#     symbol counts, each computed distributed.

BPE_ITERS = 5


def _bpe_merge_fold(a: str, b: str):
    """Closure factory (CLAUDE.md HOF rule) for the greedy left-to-right
    non-overlapping pair merge as a left fold: if the accumulator's last
    symbol is `a` and the incoming symbol is `b`, replace the last symbol
    with the merged token, else append. Non-overlap falls out because the
    merged symbol `ab` never equals `a` (symbols are non-empty)."""
    merged = a + b

    def step(acc, x):
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b))
        )
        return F.when(
            hit,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return step


def _bpe_words(
    spark: SparkSession, sf_dir: str, doc_filter: str | None = None
) -> DataFrame:
    """Corpus word-frequency table with initial character symbol arrays —
    the one corpus-scale scan both BPE training and encode start from.
    ``doc_filter`` (SQL predicate over documents columns) restricts the
    corpus — the vocab-coverage profiler trains on a split."""
    docs = load_table(spark, sf_dir, "documents")
    if doc_filter:
        docs = docs.filter(doc_filter)
    return (
        docs.select(F.explode(TX.tokens(F.col("text"))).alias("word"))
        # Empty tokens (double/leading spaces) diverge cross-engine:
        # Spark sequence(1,0) is descending [1,0] -> ['',''] syms while
        # DuckDB generate_series(1,0) is [] (ADVICE r6). Guard both sides.
        .filter(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "word",
            "cnt",
            F.expr(
                "transform(sequence(1, length(word)),"
                " i -> substring(word, i, 1))"
            ).alias("syms"),
        )
        .persist()
    )


# Memoized training per (sf_dir, doc_filter): the merge-rule list is a
# deterministic, DRIVER-SIZED artifact of an immutable fixture directory
# (the kmeans clamped-collect doctrine), and training costs K+1 driver
# round-trips of scheduler latency — the BPE-family entries (merges /
# encode / vocab-coverage / tokenizer-suite) re-learn the SAME rules, so
# a full sim paid that cost four times (r11 verdict task 8, the
# full-sim tail shave). Per-process only: concurrent pytest/driver_sim
# processes each train once; a caller that already built the words
# frame passes it through so a memo MISS costs no extra scan.
_BPE_TRAIN_MEMO: dict[tuple[str, str | None], list[tuple]] = {}


def _bpe_train_cached(
    spark: SparkSession,
    sf_dir: str,
    doc_filter: str | None = None,
    words: DataFrame | None = None,
) -> list[tuple]:
    key = (sf_dir, doc_filter)
    got = _BPE_TRAIN_MEMO.get(key)
    if got is None:
        w = (
            words
            if words is not None
            else _bpe_words(spark, sf_dir, doc_filter)
        )
        got = _BPE_TRAIN_MEMO[key] = _bpe_train(w)
    return got


# Word-frequency tables are vocabulary-sized (Heaps' law), never
# corpus-sized — but clamp the collect anyway so a pathological corpus
# fails loudly instead of OOMing the driver (the kmeans clamped-collect
# doctrine). 2^18 distinct words ≈ a GPT-2-class vocab upper bound.
_BPE_VOCAB_CLAMP = 1 << 18


def _bpe_train(words: DataFrame) -> list[tuple]:
    """Run BPE_ITERS merge-learning iterations over the word-frequency
    table; returns [(iteration, a, b, merged, pair_cnt, syms_after)] —
    driver state is one merge rule + one count per iteration, bounded.

    r15: ONE distributed aggregation total. The corpus-scale work is
    building the word-frequency table (done upstream in _bpe_words);
    merge learning itself runs DRIVER-SIDE over the collected
    vocabulary — the architecture real tokenizer trainers use (an
    in-memory word-count dict): the table is vocabulary-sized at any
    corpus scale, so the K-iteration argmax loop is pure Python over
    clamped bounded state instead of K+1 driver round-trips of
    scheduler latency (the prior shape; it dominated every BPE-family
    window slot at ~0.7s per vocab-sized Spark job). Pair counting,
    the greedy left-to-right merge fold, and the (count DESC,
    'a b' string ASC) tie-break replicate the previous Spark-side
    semantics exactly (ASCII corpus: Python str order == UTF8 binary
    order); tests/test_bpe.py pins the learned rule list."""
    vocab = [
        (r["word"], int(r["cnt"]), list(r["syms"]))
        for r in words.select("word", "cnt", "syms").collect()
    ]
    if len(vocab) > _BPE_VOCAB_CLAMP:
        raise ValueError(
            f"BPE vocabulary {len(vocab)} exceeds the driver clamp "
            f"{_BPE_VOCAB_CLAMP}; raise deliberately or pre-prune"
        )
    rows: list[tuple] = []
    for it in range(1, BPE_ITERS + 1):
        pc: dict[tuple[str, str], int] = {}
        for _, cnt, syms in vocab:
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                pc[k] = pc.get(k, 0) + cnt
        # argmax with the Spark orderBy(desc(pc), asc(concat(a,' ',b)))
        # tie-break; symbols never contain spaces, so the key is exact
        (a, b), top_pc = min(
            pc.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        merged = a + b
        syms_after = 0
        for w in range(len(vocab)):
            word, cnt, syms = vocab[w]
            # the _bpe_merge_fold greedy left-to-right semantics: a
            # freshly merged symbol never re-merges with a following b
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = merged
                else:
                    out.append(s)
            vocab[w] = (word, cnt, out)
            syms_after += cnt * len(out)
        rows.append((it, a, b, merged, int(top_pc), int(syms_after)))
    return rows


def docs_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    with _pinned_parallelism(spark):
        rows = _bpe_train_cached(spark, sf_dir)
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("iteration", LongType()),
            StructField("left_sym", StringType()),
            StructField("right_sym", StringType()),
            StructField("merged", StringType()),
            StructField("pair_cnt", LongType()),
            StructField("corpus_syms_after", LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _bpe_chain_sql(iters: int, doc_where: str = "") -> str:
    """The shared training-chain CTE prefix (w0..w{iters}, m1..m{iters}):
    per iteration, pair counts + argmax as plain aggregates, then the
    greedy merge as a per-word RECURSIVE-CTE automaton walking symbol
    positions — the literal sequential semantics the Spark fold's closed
    form must reproduce. Every chained iteration CTE is AS MATERIALIZED
    (DuckDB inlines non-recursive CTEs; an inlined chain re-evaluates the
    whole upstream pipeline once per recursion LEVEL — measured ~10x per
    added iteration, CLAUDE.md r6 lesson 1)."""
    parts = [
        f"""WITH RECURSIVE w0 AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
         list_transform(generate_series(1, len(word)), i -> word[i]) AS syms
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents
        {doc_where})
  WHERE len(word) >= 1
  GROUP BY 1
)"""
    ]
    for i in range(1, iters + 1):
        p, w_in, w_out = f"p{i}", f"w{i - 1}", f"w{i}"
        parts.append(
            f""",
{p} AS MATERIALIZED (
  SELECT pair, CAST(SUM(cnt) AS BIGINT) AS pc
  FROM (SELECT cnt,
               unnest(list_transform(generate_series(1, len(syms) - 1),
                      j -> syms[j] || ' ' || syms[j + 1])) AS pair
        FROM {w_in} WHERE len(syms) >= 2)
  GROUP BY 1
),
m{i} AS MATERIALIZED (
  SELECT string_split(pair, ' ')[1] AS a, string_split(pair, ' ')[2] AS b, pc
  FROM {p} ORDER BY pc DESC, pair LIMIT 1
),
step{i}(word, pos, acc) AS (
  SELECT word, 0, CAST([] AS VARCHAR[]) FROM {w_in}
  UNION ALL
  SELECT s.word, s.pos + 1,
         CASE WHEN len(s.acc) > 0 AND s.acc[-1] = m.a
                   AND w.syms[s.pos + 1] = m.b
              THEN list_slice(s.acc, 1, len(s.acc) - 1) || [m.a || m.b]
              ELSE s.acc || [w.syms[s.pos + 1]] END
  FROM step{i} s JOIN {w_in} w USING (word) CROSS JOIN m{i} m
  WHERE s.pos < len(w.syms)
),
{w_out} AS MATERIALIZED (
  SELECT s.word, w.cnt, s.acc AS syms
  FROM step{i} s JOIN {w_in} w USING (word)
  WHERE s.pos = len(w.syms)
)"""
        )
    return "".join(parts)


def _bpe_oracle_sql(iters: int) -> str:
    sel = "\nUNION ALL\n".join(
        f"""SELECT CAST({i} AS BIGINT) AS iteration, m{i}.a AS left_sym,
       m{i}.b AS right_sym, m{i}.a || m{i}.b AS merged,
       m{i}.pc AS pair_cnt,
       (SELECT CAST(SUM(cnt * len(syms)) AS BIGINT) FROM w{i})
         AS corpus_syms_after
FROM m{i}"""
        for i in range(1, iters + 1)
    )
    return _bpe_chain_sql(iters) + "\n" + sel


DOCS_BPE_MERGES_SQL = _bpe_oracle_sql(BPE_ITERS)


# --- docs_bpe_encode: distributed BPE ENCODE with the trained merges —
#     closing the tokenizer loop (r6 verdict task 4): docs_bpe_merges
#     LEARNS the merge table but nothing applied it at corpus scale;
#     every real pre-training pipeline needs the encode pass (token
#     counts for mixture weights, packing, and billing live downstream
#     of it). Two-level shape: the merge list (K rules, collected — the
#     same bounded driver state the trainer already holds) is baked into
#     a chain of K greedy left-to-right F.aggregate folds applied ONCE
#     per DISTINCT corpus word (vocabulary-sized work), then per-doc
#     counts come from a broadcast hash join of the per-(doc, word)
#     occurrence table against the encoded vocabulary — the corpus-scale
#     pass never runs the fold per occurrence. At 100 TB: one corpus
#     scan for training word-freq, one for doc words; vocab broadcast.
#
#     Differential (genuinely different derivations): Spark RE-ENCODES
#     w0 from the broadcast rule list (encode semantics); the oracle
#     reads the TRAINING chain's final word states w{K} (train-time
#     segmentation) — agreement proves encode(rules) == training final
#     state, the property BPE relies on (Sennrich 2016 §3: applying
#     learned operations in order reproduces training segmentation).
#     Reference parity: token accounting analog of the reference's
#     word-level stats (src/api.ts text metrics); beyond-ref surface.

def docs_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pin + eager checkpoint around the WHOLE gate (r15): the per-doc
    # groupBys otherwise run 200 near-empty tasks each on the plain
    # driver session; every value is integer-exact, so partitioning
    # cannot perturb results. words released in finally.
    words = _bpe_words(spark, sf_dir)
    try:
        with _pinned_parallelism(spark):
            rules = [
                (r[1], r[2])
                for r in _bpe_train_cached(spark, sf_dir, words=words)
            ]
            docs = load_table(spark, sf_dir, "documents")
            dw = (
                docs.select(
                    "doc_id",
                    F.explode(TX.tokens(F.col("text"))).alias("word"),
                )
                # empty-token guard, mirrored in dw
                .filter(F.length("word") >= 1)
                .groupBy("doc_id", "word")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            enc = words.select("word", "syms")
            # K merge rules, applied in learned priority order
            for a, b in rules:
                enc = enc.select(
                    "word",
                    F.aggregate(
                        "syms",
                        F.array().cast("array<string>"),
                        _bpe_merge_fold(a, b),
                    ).alias("syms"),
                )
            enc = enc.select(
                "word",
                F.length("word").cast("long").alias("w_chars"),
                F.size("syms").cast("long").alias("w_bpe"),
            )
            return (
                dw.join(F.broadcast(enc), "word")
                .groupBy("doc_id")
                .agg(
                    F.sum("n").cast("long").alias("n_words"),
                    F.sum(F.col("n") * F.col("w_chars"))
                    .cast("long").alias("n_chars"),
                    F.sum(F.col("n") * F.col("w_bpe"))
                    .cast("long").alias("n_bpe_tokens"),
                )
                .select(
                    "doc_id",
                    "n_words",
                    "n_chars",
                    "n_bpe_tokens",
                    F.expr("n_bpe_tokens * 1000000 DIV n_chars").alias(
                        "compression_ppm"
                    ),
                )
                .localCheckpoint(eager=True)
            )
    finally:
        words.unpersist()


def _bpe_encode_oracle_sql(iters: int) -> str:
    return (
        _bpe_chain_sql(iters)
        + f""",
dw AS MATERIALIZED (
  SELECT doc_id, word
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents)
  WHERE len(word) >= 1
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(word)) AS BIGINT) AS n_chars,
       CAST(SUM(len(w.syms)) AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(len(w.syms)) * 1000000 // SUM(len(word)) AS BIGINT)
         AS compression_ppm
FROM dw JOIN w{iters} w USING (word)
GROUP BY doc_id
"""
    )


DOCS_BPE_ENCODE_SQL = _bpe_encode_oracle_sql(BPE_ITERS)


# --- docs_bpe_vocab_coverage: the tokenizer-arc capstone (r7 verdict
#     task 7) — "will this tokenizer hurt on this corpus?": train the
#     BPE merges on a deterministic 4/5 split (doc_id % 5 != 4), then
#     profile the HELD-OUT fifth per source. Per source, all integers:
#       n_docs / n_words / n_chars  — held-out volume;
#       n_tokens                    — BPE symbols after the trained folds;
#       oov_ppm                     — symbols that are single characters
#                                     NEVER SEEN in training (BPE's true
#                                     OOV: multi-char symbols can only
#                                     come from trained rules, so only
#                                     unseen chars are out-of-vocab);
#       merged_ppm                  — symbols of length >= 2 (how much the
#                                     learned vocab actually fires here);
#       bytes_per_token_milli       — n_chars*1000 DIV n_tokens.
#     100 TB: training is the existing vocab-bounded chain; encode runs
#     once per DISTINCT held-out word (vocab-sized); the char vocab and
#     encoded per-word stats broadcast into one corpus-scale join; the
#     per-source rollup is a plain hash agg. Driver state = K merge
#     rules (the docs_bpe_encode shape — plan_audit skip-set member for
#     the same reason: training collects one argmax row per iteration).
#
#     Oracle: the SAME split's training chain (m1..mK, w0 restricted to
#     the train docs) + a SECOND recursive automaton chain h0..hK that
#     applies each learned rule to the held-out word table — encode
#     semantics derived the literal sequential way, then the char-vocab
#     anti-join and the identical ppm arithmetic. Reference analog: the
#     per-source text metrics of src/api.ts; beyond-ref surface.

# md5-based split: doc_id % k would ALIAS with the fixture's modular
# source assignment (only 4 of 19 sources would ever be held out);
# the hash split covers every source (~19% held out), identical
# expression in both engines (the LSH-band md5 precedent)
BPE_HELDOUT_PRED = (
    "substring(md5(CAST(doc_id AS STRING)), 1, 1) IN ('0', '1', '2')"
)


def docs_bpe_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    train_words = _bpe_words(
        spark, sf_dir, doc_filter=f"NOT ({BPE_HELDOUT_PRED})"
    )
    try:
        with _pinned_parallelism(spark):
            return _bpe_vocab_coverage_body(spark, sf_dir, train_words)
    finally:
        train_words.unpersist()


def _bpe_vocab_coverage_body(
    spark: SparkSession, sf_dir: str, train_words: DataFrame
) -> DataFrame:
    # pin + eager checkpoint around the whole gate (the docs_bpe_encode
    # rationale, r15): per-source groupBys over integer-exact values
    rules = [
        (r[1], r[2])
        for r in _bpe_train_cached(
            spark, sf_dir,
            doc_filter=f"NOT ({BPE_HELDOUT_PRED})",
            words=train_words,
        )
    ]
    # trained character vocabulary: every distinct char of the train
    # corpus (w0 symbols are single chars) — tiny, broadcast
    train_chars = (
        train_words.select(F.explode("syms").alias("tc")).distinct()
    )
    held = load_table(spark, sf_dir, "documents").filter(BPE_HELDOUT_PRED)
    dw = (
        held.select(
            "source",
            "doc_id",
            F.explode(TX.tokens(F.col("text"))).alias("word"),
        )
        .filter(F.length("word") >= 1)
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # encode each DISTINCT held-out word with the trained folds
    enc = dw.select("word").distinct().select(
        "word",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
    )
    for a, b in rules:
        enc = enc.select(
            "word",
            F.aggregate(
                "syms", F.array().cast("array<string>"), _bpe_merge_fold(a, b)
            ).alias("syms"),
        )
    sym = enc.select("word", F.explode("syms").alias("sym"))
    per_word = (
        sym.join(F.broadcast(train_chars), sym.sym == F.col("tc"), "left")
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("w_tokens"),
            F.sum(
                (F.length("sym") >= 2).cast("long")
            ).alias("w_merged"),
            F.sum(
                ((F.length("sym") == 1) & F.col("tc").isNull()).cast("long")
            ).alias("w_oov"),
        )
        .withColumn("w_chars", F.length("word").cast("long"))
    )
    per_doc_words = dw.join(F.broadcast(per_word), "word")
    n_docs = held.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return (
        per_doc_words.groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_words"),
            F.sum(F.col("n") * F.col("w_chars")).cast("long").alias("n_chars"),
            F.sum(F.col("n") * F.col("w_tokens")).cast("long").alias(
                "n_tokens"
            ),
            F.sum(F.col("n") * F.col("w_oov")).cast("long").alias("oov_syms"),
            F.sum(F.col("n") * F.col("w_merged")).cast("long").alias(
                "merged_syms"
            ),
        )
        .join(n_docs, "source")
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            "n_words",
            "n_chars",
            "n_tokens",
            F.expr("oov_syms * 1000000 DIV n_tokens").alias("oov_ppm"),
            F.expr("merged_syms * 1000000 DIV n_tokens").alias("merged_ppm"),
            F.expr("n_chars * 1000 DIV n_tokens").alias(
                "bytes_per_token_milli"
            ),
        )
        .localCheckpoint(eager=True)
    )


def _bpe_vocab_coverage_sql(iters: int) -> str:
    # train chain restricted to the training split; then apply each
    # learned rule to the held-out word table via the same recursive
    # automaton (h0..h{iters}); every CTE a recursive member references
    # is MATERIALIZED (CLAUDE.md recursive-oracle doctrine)
    parts = [
        _bpe_chain_sql(
            iters, doc_where=f"WHERE NOT ({BPE_HELDOUT_PRED})"
        ),
        f""",
h0 AS MATERIALIZED (
  SELECT word,
         list_transform(generate_series(1, len(word)), i -> word[i]) AS syms
  FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS word
        FROM documents WHERE {BPE_HELDOUT_PRED})
  WHERE len(word) >= 1
)""",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
hstep{i}(word, pos, acc) AS (
  SELECT word, 0, CAST([] AS VARCHAR[]) FROM h{i - 1}
  UNION ALL
  SELECT s.word, s.pos + 1,
         CASE WHEN len(s.acc) > 0 AND s.acc[-1] = m.a
                   AND h.syms[s.pos + 1] = m.b
              THEN list_slice(s.acc, 1, len(s.acc) - 1) || [m.a || m.b]
              ELSE s.acc || [h.syms[s.pos + 1]] END
  FROM hstep{i} s JOIN h{i - 1} h USING (word) CROSS JOIN m{i} m
  WHERE s.pos < len(h.syms)
),
h{i} AS MATERIALIZED (
  SELECT s.word, s.acc AS syms
  FROM hstep{i} s JOIN h{i - 1} h USING (word)
  WHERE s.pos = len(h.syms)
)"""
        )
    parts.append(
        f""",
tchars AS MATERIALIZED (
  SELECT DISTINCT unnest(syms) AS tc FROM w0
),
per_word AS MATERIALIZED (
  -- unnest + left-join the char vocab (lambdas can't hold subqueries)
  SELECT s.word, s.w_chars,
         CAST(COUNT(*) AS BIGINT) AS w_tokens,
         CAST(SUM(CASE WHEN len(s.sym) >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS w_merged,
         CAST(SUM(CASE WHEN len(s.sym) = 1 AND t.tc IS NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS w_oov
  FROM (SELECT h.word, CAST(len(h.word) AS BIGINT) AS w_chars,
               unnest(h.syms) AS sym
        FROM h{iters} h) s
  LEFT JOIN tchars t ON t.tc = s.sym
  GROUP BY 1, 2
),
dw AS MATERIALIZED (
  SELECT source, word, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT source, unnest(string_split(text, ' ')) AS word
        FROM documents WHERE {BPE_HELDOUT_PRED})
  WHERE len(word) >= 1
  GROUP BY 1, 2
),
nd AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents WHERE {BPE_HELDOUT_PRED} GROUP BY 1
)
SELECT d.source,
       nd.n_docs,
       CAST(SUM(d.n) AS BIGINT) AS n_words,
       CAST(SUM(d.n * p.w_chars) AS BIGINT) AS n_chars,
       CAST(SUM(d.n * p.w_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(d.n * p.w_oov) * 1000000
            // SUM(d.n * p.w_tokens) AS BIGINT) AS oov_ppm,
       CAST(SUM(d.n * p.w_merged) * 1000000
            // SUM(d.n * p.w_tokens) AS BIGINT) AS merged_ppm,
       CAST(SUM(d.n * p.w_chars) * 1000
            // SUM(d.n * p.w_tokens) AS BIGINT) AS bytes_per_token_milli
FROM dw d
JOIN per_word p USING (word)
JOIN nd ON nd.source = d.source
GROUP BY 1, 2
"""
    )
    return "".join(parts)


DOCS_BPE_VOCAB_COVERAGE_SQL = _bpe_vocab_coverage_sql(BPE_ITERS)


# --- docs_decontam_spans: SURGICAL (span-level) decontamination — the
#     upgrade of TX7's drop-the-document rule to the modern excise-the-
#     span practice (benchmark canaries / targeted n-gram removal):
#     instead of flagging a contaminated doc, locate every POSITION where
#     an eval 4-gram occurs, merge overlapping/adjacent coverage
#     intervals [pos, pos+3] into maximal spans, and account exactly for
#     what excision removes (spans, tokens, ppm of the doc).
#
#     Spark = the dup_ngram_spans island machinery: per doc, position-
#     ordered hits, a span opens when pos exceeds the running max end + 1
#     (cummax window), one groupBy to spans, one to docs. Oracle = the
#     anti-join anchor characterization (a span opens at a hit with NO
#     hit in the preceding overlap window) + tokens_removed recomputed as
#     COUNT(DISTINCT covered position) from a generate_series explode —
#     interval islands vs position-set union pin each other.
#
#     Scale: train grams join a broadcast eval fingerprint set (eval is
#     benchmark-sized); the span windows are partitioned by doc_id. One
#     corpus explode, no corpus×corpus work.

def docs_decontam_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .documents import _spread

    docs = load_table(spark, sf_dir, "documents")
    grams_distinct = TX.shingles(TX.tokens(F.col("text")), _CONTAM_N, distinct=True)
    eval_grams = (
        _spread(docs.filter(F.col("source") == _EVAL_SOURCE), spark)
        .select(F.explode(grams_distinct).alias("gram"))
        .distinct()
    )
    toks = TX.tokens(F.col("text"))
    # bind the token array ONCE per row (t) before the per-position lambda:
    # a split() referenced inside a HOF lambda re-evaluates per element
    # (O(tokens²) per doc — the shingles() lesson, functions/text.py)
    pos_grams = (
        _spread(docs.filter(F.col("source") != _EVAL_SOURCE), spark)
        .filter(F.size(toks) >= _CONTAM_N)
        .select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            F.explode(
                F.expr(
                    f"transform(array({_TOKS_EXPR}), t ->"
                    f" transform(sequence(1, size(t) - {_CONTAM_N - 1}),"
                    " i -> struct(CAST(i AS BIGINT) AS pos,"
                    f" concat_ws(' ', slice(t, i, {_CONTAM_N})) AS gram)))[0]"
                )
            ).alias("pg"),
        )
        .select("doc_id", "n_tokens", F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram"))
    )
    hits = pos_grams.join(F.broadcast(eval_grams), "gram").select(
        "doc_id", "n_tokens", "pos", (F.col("pos") + _CONTAM_N - 1).alias("end")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_max_end = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = (
        hits.withColumn(
            "new_span",
            (prev_max_end.isNull() | (F.col("pos") > prev_max_end + 1)).cast("long"),
        )
        .withColumn(
            "span_id",
            F.sum("new_span").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("doc_id", "n_tokens", "span_id")
        .agg(
            F.min("pos").alias("span_start"),
            F.max("end").alias("span_end"),
        )
    )
    return (
        spans.groupBy("doc_id", "n_tokens")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.col("span_end") - F.col("span_start") + 1).alias("tokens_removed"),
        )
        .select(
            "doc_id",
            "n_spans",
            "tokens_removed",
            "n_tokens",
            F.expr("tokens_removed * 1000000 div n_tokens").alias("removed_ppm"),
        )
    )


_TOKS_EXPR = "split(text, ' ')"


_POS_GRAM4 = " || ' ' || ".join(f"t[i+{k}]" for k in range(_CONTAM_N))

DOCS_DECONTAM_SPANS_SQL = f"""
WITH ev AS MATERIALIZED (
  SELECT DISTINCT unnest({_SHINGLES5}) AS gram
  FROM documents WHERE source = '{_EVAL_SOURCE}'
),
pos_hits AS MATERIALIZED (
  SELECT doc_id, n_tokens, CAST(pg.pos AS BIGINT) AS pos
  FROM (
    SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
           unnest(list_transform(generate_series(1, len(t) - {_CONTAM_N - 1}),
                                 i -> {{'pos': i, 'gram': {_POS_GRAM4}}})) AS pg
    FROM (SELECT doc_id, string_split(text, ' ') AS t
          FROM documents
          WHERE source <> '{_EVAL_SOURCE}'
            AND len(string_split(text, ' ')) >= {_CONTAM_N})
  ), ev
  WHERE pg.gram = ev.gram
),
anchors AS (
  SELECT h.doc_id, COUNT(*) AS n_spans
  FROM pos_hits h
  WHERE NOT EXISTS (
    SELECT 1 FROM pos_hits p
    WHERE p.doc_id = h.doc_id
      AND p.pos < h.pos AND p.pos >= h.pos - {_CONTAM_N}
  )
  GROUP BY h.doc_id
),
covered AS (
  SELECT doc_id, CAST(COUNT(DISTINCT cp) AS BIGINT) AS tokens_removed
  FROM (SELECT doc_id, unnest(generate_series(pos, pos + {_CONTAM_N - 1})) AS cp
        FROM pos_hits)
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(a.n_spans AS BIGINT) AS n_spans,
       c.tokens_removed,
       d.n_tokens,
       CAST(c.tokens_removed * 1000000 // d.n_tokens AS BIGINT) AS removed_ppm
FROM (SELECT DISTINCT doc_id, n_tokens FROM pos_hits) d
JOIN anchors a USING (doc_id)
JOIN covered c USING (doc_id)
"""


# --- customer_entity_clusters: the full ENTITY-RESOLUTION pipeline —
#     block (FastSS deletion variants) → match (exact levenshtein<=1
#     verify) → CLUSTER (connected components over the match pairs) →
#     per-entity cluster assignment with cluster sizes. The compose-the-
#     proven-pieces gate: the pair stage is customer_name_neardup's
#     (lossless-blocking differential), the clustering is the
#     docs_dup_clusters label-propagation operator; its oracle reuses the
#     numeric no-carry pair characterization AND the recursive-CTE
#     transitive closure — so both composition layers stay independently
#     derived end-to-end.
#
#     Scale: the variant equi-join is the blocking bound (name-length ×
#     corpus rows); components iterate node-sized label state (the
#     docs_dup_clusters design); the size window partitions by cluster.

_NAME_PAIRS_SQL = """
  SELECT c.ka, c.kb FROM (
    SELECT a.k AS ka, a.k + d.d * CAST(POWER(10, p.p) AS BIGINT) AS kb
    FROM (SELECT c_custkey AS k FROM customer) a,
         (SELECT unnest(generate_series(1, 9)) AS d) d,
         (SELECT unnest(generate_series(0, 8)) AS p) p
    WHERE ((a.k // CAST(POWER(10, p.p) AS BIGINT)) % 10) + d.d <= 9
  ) c JOIN (SELECT c_custkey AS k FROM customer) b ON c.kb = b.k
"""


def customer_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clusters import connected_components

    pairs = _name_match_pairs(spark, sf_dir)
    comp = connected_components(pairs, a="ka", b="kb")
    w = Window.partitionBy("cluster_id")
    return comp.select(
        F.col("doc_id").alias("custkey"),
        "cluster_id",
    ).withColumn("cluster_size", F.count(F.lit(1)).over(w))


def _entity_clusters_sql() -> str:
    from ..operators.clusters import components_sql

    return f"""
SELECT c.doc_id AS custkey, c.cluster_id,
       CAST(COUNT(*) OVER (PARTITION BY c.cluster_id) AS BIGINT)
         AS cluster_size
FROM ({components_sql(_NAME_PAIRS_SQL, a="ka", b="kb")}) c
"""


CUSTOMER_ENTITY_CLUSTERS_SQL = _entity_clusters_sql()


# --- docs_compaction_plan: SMALL-FILE COMPACTION PLANNING — the
#     lakehouse OPTIMIZE / Iceberg rewrite_data_files planner (reference
#     analog: ClickHouse's background merges keep part counts bounded,
#     clickhouse/init/001_create_tables.sql MergeTree tables; at 100 TB
#     on object storage the same job is explicit). Each document stands
#     in for a data file (n_chars = bytes); within a partition (source),
#     files are packed into output bins of ~COMPACT_TARGET bytes by
#     OFFSET BINNING: bin = (cumulative bytes before me) DIV target —
#     the exact rule Spark's own scan packing
#     (spark.sql.files.maxPartitionBytes) applies to file splits, chosen
#     over sequential greedy first-fit because it is a pure window
#     cumsum: deterministic, one shuffle on the partition key, and
#     identical no matter how many executors plan in parallel. Output
#     per bin: file count, bytes, id span, fill ppm (can exceed 1e6 when
#     one oversized file straddles a boundary — such a bin is emitted
#     as-is, matching OPTIMIZE's "never split a file" contract).
#     Oracle: assigns files to bins by RANGE JOIN against generated bin
#     boundaries [b*T, (b+1)*T) instead of integer division.

COMPACT_TARGET = 1500


def docs_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.coalesce(F.sum("n_chars").over(w), F.lit(0)).alias("off"),
    ).withColumn("bin_id", F.expr(f"off DIV {COMPACT_TARGET}"))
    return (
        binned.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("file_count"),
            F.sum("n_chars").alias("bytes"),
            F.min("doc_id").alias("doc_lo"),
            F.max("doc_id").alias("doc_hi"),
        )
        .select(
            "source",
            F.col("bin_id").cast("long").alias("bin_id"),
            F.col("file_count").cast("long").alias("file_count"),
            F.col("bytes").cast("long").alias("bytes"),
            F.col("doc_lo").cast("long").alias("doc_lo"),
            F.col("doc_hi").cast("long").alias("doc_hi"),
            F.expr(f"bytes * 1000000 DIV {COMPACT_TARGET}")
            .cast("long")
            .alias("fill_ppm"),
        )
    )


DOCS_COMPACTION_PLAN_SQL = f"""
WITH files AS (
  SELECT doc_id, source, n_chars,
         COALESCE(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS off
  FROM documents
),
spans AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS total FROM documents
  GROUP BY 1
),
bins AS (
  SELECT source,
         unnest(generate_series(0, total // {COMPACT_TARGET})) AS bin_id
  FROM spans
),
assigned AS (
  SELECT f.doc_id, f.source, f.n_chars, b.bin_id
  FROM files f
  JOIN bins b
    ON b.source = f.source
   AND f.off >= b.bin_id * {COMPACT_TARGET}
   AND f.off < (b.bin_id + 1) * {COMPACT_TARGET}
)
SELECT source,
       CAST(bin_id AS BIGINT) AS bin_id,
       CAST(COUNT(*) AS BIGINT) AS file_count,
       CAST(SUM(n_chars) AS BIGINT) AS bytes,
       CAST(MIN(doc_id) AS BIGINT) AS doc_lo,
       CAST(MAX(doc_id) AS BIGINT) AS doc_hi,
       CAST(SUM(n_chars) * 1000000 // {COMPACT_TARGET} AS BIGINT) AS fill_ppm
FROM assigned
GROUP BY 1, 2
"""


# --- docs_tokenizer_suite: fused tokenizer-arc audit (r9 rotation, r8
#     verdict task 3) — EXECUTES three corpus-signal families verbatim,
#     labeled (family, k, metric, value):
#       simhash     — docs_simhash (DD5; this suite takes its window
#                     slot, a strict-superset swap — the standalone
#                     entry stays oracle-checked in the tail);
#       vocabgrowth — docs_vocab_growth (Heaps'-law curve over nested
#                     md5 doc buckets, VG_BUCKETS-bounded windows);
#       bpecov      — docs_bpe_vocab_coverage (the tokenizer capstone:
#                     BPE merges trained on the 4/5 split, held-out
#                     fifth profiled per source — OOV/merged ppm,
#                     bytes-per-token).
#     The paths overlap from a thread pool in the one SparkSession
#     (the ann_index_audit/streaming_state_suite lesson): the BPE path is
#     driver-paced (per-iteration argmax collects), so the lazy scan
#     paths execute under it for free. r10 refit (r9 verdict task 2): the
#     four word-grain paths (simhash, vocabgrowth, goodturing, overlap)
#     execute their frame cores off ONE persisted tokenization
#     (tokenized_docs_frame) instead of re-scanning and re-tokenizing the
#     corpus per path; only bpecov keeps its own scan (character-grain
#     symbols over a train/held-out doc split — a genuinely different
#     grain). Eager checkpoint at build = plan_audit's eager skip set.
#     All values are BIGINT-as-STRING.


def docs_tokenizer_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from concurrent.futures import ThreadPoolExecutor

    from .documents import (
        _spread,
        count_of_counts_frame,
        simhash_frame,
        source_overlap_frame,
        tokenized_docs_frame,
        vocab_growth_frame,
    )

    docs = _spread(load_table(spark, sf_dir, "documents"), spark)
    tokd = tokenized_docs_frame(docs).persist()
    released: list = [tokd]

    def _sh() -> DataFrame:
        return simhash_frame(tokd).selectExpr(
            "'simhash' AS family",
            "CAST(doc_id AS STRING) AS k",
            "stack(1, 'simhash', CAST(simhash AS STRING))"
            " AS (metric, value)",
        )

    def _vg() -> DataFrame:
        return vocab_growth_frame(tokd).selectExpr(
            "'vocabgrowth' AS family",
            "source || '/' || CAST(bucket AS STRING) AS k",
            "stack(6, 'bucket_tokens', CAST(bucket_tokens AS STRING),"
            " 'new_words', CAST(new_words AS STRING),"
            " 'cum_tokens', CAST(cum_tokens AS STRING),"
            " 'cum_vocab', CAST(cum_vocab AS STRING),"
            " 'new_word_ppm', CAST(new_word_ppm AS STRING),"
            " 'vocab_per_mtok', CAST(vocab_per_mtok AS STRING))"
            " AS (metric, value)",
        )

    def _cov() -> DataFrame:
        return docs_bpe_vocab_coverage(spark, sf_dir).selectExpr(
            "'bpecov' AS family",
            "source AS k",
            "stack(7, 'n_docs', CAST(n_docs AS STRING),"
            " 'n_words', CAST(n_words AS STRING),"
            " 'n_chars', CAST(n_chars AS STRING),"
            " 'n_tokens', CAST(n_tokens AS STRING),"
            " 'oov_ppm', CAST(oov_ppm AS STRING),"
            " 'merged_ppm', CAST(merged_ppm AS STRING),"
            " 'bytes_per_token_milli', CAST(bytes_per_token_milli"
            " AS STRING)) AS (metric, value)",
        )

    # r9 growth 2: the Good-Turing count-of-counts (the frequency
    # SPECTRUM companion of the vocab-growth curve) as a 4th pooled path
    def _gt() -> DataFrame:
        return count_of_counts_frame(tokd).selectExpr(
            "'goodturing' AS family",
            "source || '/' || CAST(r AS STRING) AS k",
            "stack(3, 'n_r', CAST(n_r AS STRING),"
            " 'n_r1', CAST(n_r1 AS STRING),"
            " 'r_star_milli', CAST(r_star_milli AS STRING))"
            " AS (metric, value)",
        )

    # r9 growth 3: the cross-source 3-gram overlap matrix (between-source
    # leakage diagnostic) as a 5th pooled path
    def _ov() -> DataFrame:
        return source_overlap_frame(tokd, _cache_out=released).selectExpr(
            "'overlap' AS family",
            "src_a || '/' || src_b AS k",
            "stack(4, 'shared_grams', CAST(shared_grams AS STRING),"
            " 'grams_a', CAST(grams_a AS STRING),"
            " 'grams_b', CAST(grams_b AS STRING),"
            " 'containment_ppm', CAST(containment_ppm AS STRING))"
            " AS (metric, value)",
        )

    # conf pin hoisted AROUND the pool (the ann_index_audit doctrine): the
    # word-grain groupBys key on vocabulary-sized groups and a plain
    # driver session's 200 shuffle partitions would run them as near-empty
    # task storms. Every value is integer-exact, so partitioning cannot
    # perturb results.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(spark.sparkContext.defaultParallelism),
    )
    try:
        with ThreadPoolExecutor(max_workers=5) as pool:
            # the BPE path is driver-paced and scans its own grain: start
            # it first, then materialize the shared tokenization under it
            # so the four word-grain paths never race an unbuilt cache
            fut_cov = pool.submit(
                lambda: _cov().localCheckpoint(eager=True)
            )
            tokd.count()
            futs = [
                pool.submit(lambda f=f: f().localCheckpoint(eager=True))
                for f in (_sh, _vg, _gt, _ov)
            ]
            sh, vg, gt, ov = (f.result() for f in futs)
            cov = fut_cov.result()
    finally:
        # all paths eagerly checkpointed: release the shared subtrees (the
        # session-cache-pressure doctrine, commit 35904bc); in finally so
        # a failed pool path releases them too
        for df in released:
            df.unpersist()
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return (
        sh.unionByName(vg)
        .unionByName(cov)
        .unionByName(gt)
        .unionByName(ov)
    )


def _docs_tokenizer_suite_sql() -> str:
    from .documents import (
        DOCS_COUNT_OF_COUNTS_SQL,
        DOCS_SIMHASH_SQL,
        DOCS_SOURCE_OVERLAP_SQL,
        DOCS_VOCAB_GROWTH_SQL,
    )

    return f"""
SELECT 'simhash' AS family, CAST(s.doc_id AS VARCHAR) AS k,
       'simhash' AS metric, CAST(s.simhash AS VARCHAR) AS value
FROM ({DOCS_SIMHASH_SQL}) s
UNION ALL
SELECT 'vocabgrowth' AS family,
       g.source || '/' || CAST(g.bucket AS VARCHAR) AS k,
       m.metric,
       CASE m.metric WHEN 'bucket_tokens' THEN CAST(g.bucket_tokens AS VARCHAR)
                     WHEN 'new_words' THEN CAST(g.new_words AS VARCHAR)
                     WHEN 'cum_tokens' THEN CAST(g.cum_tokens AS VARCHAR)
                     WHEN 'cum_vocab' THEN CAST(g.cum_vocab AS VARCHAR)
                     WHEN 'new_word_ppm' THEN CAST(g.new_word_ppm AS VARCHAR)
                     ELSE CAST(g.vocab_per_mtok AS VARCHAR) END AS value
FROM ({DOCS_VOCAB_GROWTH_SQL}) g,
     (SELECT unnest(['bucket_tokens','new_words','cum_tokens','cum_vocab',
                     'new_word_ppm','vocab_per_mtok']) AS metric) m
UNION ALL
SELECT 'bpecov' AS family, c.source AS k, m.metric,
       CASE m.metric WHEN 'n_docs' THEN CAST(c.n_docs AS VARCHAR)
                     WHEN 'n_words' THEN CAST(c.n_words AS VARCHAR)
                     WHEN 'n_chars' THEN CAST(c.n_chars AS VARCHAR)
                     WHEN 'n_tokens' THEN CAST(c.n_tokens AS VARCHAR)
                     WHEN 'oov_ppm' THEN CAST(c.oov_ppm AS VARCHAR)
                     WHEN 'merged_ppm' THEN CAST(c.merged_ppm AS VARCHAR)
                     ELSE CAST(c.bytes_per_token_milli AS VARCHAR)
       END AS value
FROM ({DOCS_BPE_VOCAB_COVERAGE_SQL}) c,
     (SELECT unnest(['n_docs','n_words','n_chars','n_tokens','oov_ppm',
                     'merged_ppm','bytes_per_token_milli']) AS metric) m
UNION ALL
SELECT 'goodturing' AS family,
       t.source || '/' || CAST(t.r AS VARCHAR) AS k, m.metric,
       CASE m.metric WHEN 'n_r' THEN CAST(t.n_r AS VARCHAR)
                     WHEN 'n_r1' THEN CAST(t.n_r1 AS VARCHAR)
                     ELSE CAST(t.r_star_milli AS VARCHAR) END AS value
FROM ({DOCS_COUNT_OF_COUNTS_SQL}) t,
     (SELECT unnest(['n_r','n_r1','r_star_milli']) AS metric) m
UNION ALL
SELECT 'overlap' AS family, o.src_a || '/' || o.src_b AS k, m.metric,
       CASE m.metric WHEN 'shared_grams' THEN CAST(o.shared_grams AS VARCHAR)
                     WHEN 'grams_a' THEN CAST(o.grams_a AS VARCHAR)
                     WHEN 'grams_b' THEN CAST(o.grams_b AS VARCHAR)
                     ELSE CAST(o.containment_ppm AS VARCHAR) END AS value
FROM ({DOCS_SOURCE_OVERLAP_SQL}) o,
     (SELECT unnest(['shared_grams','grams_a','grams_b',
                     'containment_ppm']) AS metric) m
"""


# --- docs_dsir_selection: data selection via hashed n-gram importance
#     scoring (r15) — the DSIR recipe (Xie et al. 2023, "Data Selection
#     for Language Models via Importance Resampling"): featurize every
#     doc into HASHED BIGRAM buckets, estimate a target-domain
#     distribution (here lang='en', the curated-domain stand-in) and a
#     raw-pool distribution over the same buckets, and score each doc
#     by how target-like its features are; the top-K scored docs are
#     the selected training subset. DIVERGENCE (documented in
#     DIVERGENCES.md): exact DSIR scores with summed LOG likelihood
#     ratios — ln() is cross-engine-unsafe here, so the score is the
#     integer-exact linear surrogate sum(t_ppm - r_ppm) over the doc's
#     bigram occurrences (Laplace-smoothed ppm per bucket); same
#     feature hash, same distributions, monotone-comparable ranking
#     signal. All integers. 100 TB: the two distributions live on a
#     4096-bucket grain — broadcast; per-doc scoring is a map-side
#     broadcast join + one per-doc agg (no corpus-scale shuffle beyond
#     the doc grain); the selection cut is a VALUE THRESHOLD from a
#     bounded top-K collect (the late-r7 segmentation doctrine — no
#     global rank window), tie-broken on doc_id so the K-th slot is
#     unique. Oracle = the same pipeline via list_transform bigrams +
#     window ranks in DuckDB (rank strategy differs from the Spark
#     threshold cut on purpose).

DSIR_BUCKETS = 4096
DSIR_TARGET_LANG = "en"
DSIR_SELECT_K = 100


def docs_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # guard size >= 2 explicitly: Spark's sequence(1, 0) is the
    # DESCENDING [1, 0] (DuckDB generate_series(1, 0) is empty) — a
    # single-token doc would otherwise explode phantom indices
    bigram = F.expr(
        "CASE WHEN size(toks) >= 2 THEN"
        " transform(sequence(1, size(toks) - 1),"
        " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
        " ELSE CAST(array() AS array<string>) END"
    )
    # r15 optimization (guide §2.3/§2.5): (1) repartition the one-split
    # corpus scan BEFORE the tokenize+md5 projection — the raw upload is
    # one row group = one task, so the whole per-bigram hash pass ran
    # serially (0.63 s single-task job at sf0.1); the 0.6 MB text shuffle
    # is free next to 32x the hash throughput. (2) persist the frame
    # AGGREGATED to (doc, bucket, cnt) grain instead of one row per
    # bigram occurrence: both consumers only need counts, so the cached
    # frame (and the scored-side shuffle) shrinks by the per-doc bigram
    # multiplicity. Exact-integer identical: sum over occurrences of
    # (t_ppm - r_ppm) == sum over buckets of cnt * (t_ppm - r_ppm).
    db = (
        docs.repartition(
            docs.sparkSession.sparkContext.defaultParallelism, "doc_id"
        )
        .select(
            "doc_id", "source",
            (F.col("lang") == DSIR_TARGET_LANG).alias("is_target"),
            TX.tokens(F.col("text")).alias("toks"),
        )
        .select(
            "doc_id", "source", "is_target",
            F.explode(bigram).alias("g"),
        )
        .select(
            "doc_id", "source", "is_target",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("dsir:"), F.col("g"))), 1, 8
                    ),
                    16, 10,
                ).cast("long") % DSIR_BUCKETS
            ).alias("b"),
        )
        .groupBy("doc_id", "source", "is_target", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    caches: list[DataFrame] = [db]
    try:
        # no pre-count: the r10 materialize-before-fan-out rule targets
        # CONCURRENT consumers racing a cold cache. Here every consumer is
        # a strictly sequential driver action — tots.collect() below is the
        # first, and its own job fills db's persist cache before the
        # broadcast build / probe ever read it — so a count() is one whole
        # serial job round-trip of pure overhead (r15 profile: the dsir
        # chain is 4 back-to-back 52-task jobs; this drops one of them)
        # the two distributions in ONE pass: conditional sums per bucket
        dist = db.groupBy("b").agg(
            F.sum(F.when(F.col("is_target"), F.col("c")).otherwise(0)).alias("tc"),
            F.sum(F.when(F.col("is_target"), 0).otherwise(F.col("c"))).alias("rc"),
        )
        tots = dist.agg(
            F.sum("tc").alias("tt"), F.sum("rc").alias("rt")
        ).collect()[0]  # bounded: two longs
        tt, rt = int(tots["tt"]), int(tots["rt"])
        bt = DSIR_BUCKETS
        ppm = dist.select(
            "b",
            F.expr(f"(tc + 1) * 1000000 DIV ({tt} + {bt})").alias("t_ppm"),
            F.expr(f"(rc + 1) * 1000000 DIV ({rt} + {bt})").alias("r_ppm"),
        )
        scored = (
            db.join(F.broadcast(ppm), "b")
            .groupBy("doc_id", "source")
            .agg(
                F.sum("c").alias("n_feats"),
                F.sum(
                    F.col("c") * (F.col("t_ppm") - F.col("r_ppm"))
                ).alias("score"),
            )
        ).persist()
        caches.append(scored)
        # the selection cut: K-th (score DESC, doc_id ASC) row collected
        # as a VALUE threshold — bounded K rows of driver state, no
        # global rank window
        kth = scored.orderBy(
            F.desc("score"), F.asc("doc_id")
        ).limit(DSIR_SELECT_K).collect()[-1]
        ks, kd = int(kth["score"]), int(kth["doc_id"])
        out = scored.select(
            "doc_id",
            "source",
            F.col("n_feats").cast("long").alias("n_feats"),
            F.col("score").cast("long").alias("score"),
            F.when(
                (F.col("score") > ks)
                | ((F.col("score") == ks) & (F.col("doc_id") <= kd)),
                1,
            ).otherwise(0).cast("long").alias("selected"),
        ).localCheckpoint(eager=True)
        return out
    finally:
        for df in caches:
            df.unpersist()


DOCS_DSIR_SELECTION_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, lang = '{DSIR_TARGET_LANG}' AS is_target,
         string_split(text, ' ') AS t
  FROM documents
),
feats AS MATERIALIZED (
  SELECT doc_id, source, is_target,
         CAST('0x' || substr(md5('dsir:' || g), 1, 8) AS BIGINT)
           % {DSIR_BUCKETS} AS b
  FROM (
    SELECT doc_id, source, is_target,
           unnest(list_transform(
             generate_series(1, greatest(len(t) - 1, 0)),
             i -> t[i] || ' ' || t[i + 1])) AS g
    FROM toks
  )
),
dist AS MATERIALIZED (
  SELECT b,
         SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS tc,
         SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS rc
  FROM feats GROUP BY 1
),
tot AS (SELECT SUM(tc) AS tt, SUM(rc) AS rt FROM dist),
ppm AS (
  SELECT b,
         (tc + 1) * 1000000 // ((SELECT tt FROM tot) + {DSIR_BUCKETS})
           AS t_ppm,
         (rc + 1) * 1000000 // ((SELECT rt FROM tot) + {DSIR_BUCKETS})
           AS r_ppm
  FROM dist
),
scored AS (
  SELECT f.doc_id, f.source,
         COUNT(*) AS n_feats,
         SUM(p.t_ppm - p.r_ppm) AS score
  FROM feats f JOIN ppm p ON f.b = p.b
  GROUP BY 1, 2
),
rk AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rn
  FROM scored
)
SELECT doc_id, source,
       CAST(n_feats AS BIGINT) AS n_feats,
       CAST(score AS BIGINT) AS score,
       CAST(CASE WHEN rn <= {DSIR_SELECT_K} THEN 1 ELSE 0 END AS BIGINT)
         AS selected
FROM rk
"""


# --- customer_snm_pairs: sorted-neighborhood blocking (r15) — the
#     classic third candidate-generation strategy for entity resolution
#     (after FastSS variant-join and LSH): sort records by a blocking
#     key, slide a window of w ranks, emit in-window pairs, verify
#     exactly. Multi-pass (Hernandez-Stolfo): pass 'fwd' sorts by the
#     name itself (catches low-digit edits), pass 'rev' sorts by the
#     REVERSED name (catches high-digit edits — the complementary key
#     every multi-pass SNM deployment adds). Unlike FastSS, SNM is
#     deliberately LOSSY — the gate therefore audits its recall against
#     the complete levenshtein<=1 truth set (_name_match_pairs, the
#     lossless FastSS stage), the docs_pair_recall_audit doctrine
#     applied to ER blocking. 100 TB: ranks are computed per BOUNDED
#     block (fwd: first-6-digit prefix == 1000-key ranges; rev:
#     last-3-digit prefix == 1000 blocks), never one global window —
#     the distributed-SNM partition trick, boundary pairs across blocks
#     forgone by design (<= w per boundary, reflected in the measured
#     recall); candidate join is an exploded-offset EQUI-join on
#     (block, rank + off), w x one side, no range join. All integers.
#     Oracle = same passes via ROW_NUMBER + offset joins, truth via the
#     numeric no-carry characterization (no string ops — independent).

SNM_W = 3


def customer_snm_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pin + eager checkpoint: the gate chains 5 driver-paced actions
    # (two persists+counts, a leftsemi count) whose groupBys otherwise
    # run 200 near-empty tasks each on the plain driver session; all
    # values are exact integers, so partitioning cannot perturb results
    with _pinned_parallelism(spark):
        return _customer_snm_pairs_body(spark, sf_dir)


def _customer_snm_pairs_body(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), F.col("c_name").alias("name")
    )
    passes = {
        # block expr, sort-key expr (unique per record in each pass)
        "fwd": (F.substring("name", 10, 6), F.col("name")),
        "rev": (
            F.substring(F.reverse(F.col("name")), 1, 3),
            F.reverse(F.col("name")),
        ),
    }
    pair_frames = []
    for pname, (blk, key) in passes.items():
        r = cust.select(
            "k", "name", blk.alias("blk"),
            F.row_number().over(
                Window.partitionBy(blk).orderBy(key)
            ).alias("rnk"),
        )
        a = r.select(
            "k", "name", "blk", "rnk",
            F.explode(
                F.array(*[F.lit(o) for o in range(1, SNM_W + 1)])
            ).alias("o"),
        ).select(
            F.col("k").alias("ka"), F.col("name").alias("na"),
            "blk", (F.col("rnk") + F.col("o")).alias("rnk"),
        )
        b = r.select(
            F.col("k").alias("kb"), F.col("name").alias("nb"),
            "blk", "rnk",
        )
        pair_frames.append(
            a.join(b, ["blk", "rnk"])
            .select(
                F.lit(pname).alias("pass"),
                F.least("ka", "kb").alias("ka"),
                F.greatest("ka", "kb").alias("kb"),
                (F.levenshtein("na", "nb") <= 1).alias("ok"),
            )
        )
    cand = pair_frames[0].unionByName(pair_frames[1]).persist()
    try:
        per_pass = cand.groupBy("pass").agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("metric"),
        )
        uni = cand.select("ka", "kb", "ok").distinct().agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("metric"),
        ).select(F.lit("union").alias("pass"), "n_pairs", "metric")
        n_verified = cand.filter("ok").select("ka", "kb").distinct()
        truth = _name_match_pairs(spark, sf_dir).persist()
        try:
            t_cnt = truth.count()  # bounded: one long (pair-set size)
            got = n_verified.join(
                truth, ["ka", "kb"], "leftsemi"
            ).count()
            trow = spark.range(1).select(
                F.lit("truth").alias("pass"),
                F.lit(t_cnt).cast("long").alias("n_pairs"),
                F.lit(got * 1000000 // max(t_cnt, 1)).cast("long")
                .alias("metric"),
            )
            return (
                per_pass.select(
                    "pass",
                    F.col("n_pairs").cast("long").alias("n_pairs"),
                    F.col("metric").cast("long").alias("metric"),
                )
                .unionByName(uni.select(
                    "pass",
                    F.col("n_pairs").cast("long").alias("n_pairs"),
                    F.col("metric").cast("long").alias("metric"),
                ))
                .unionByName(trow)
                .localCheckpoint(eager=True)
            )
        finally:
            truth.unpersist()
    finally:
        cand.unpersist()


CUSTOMER_SNM_PAIRS_SQL = f"""
WITH cust AS (
  SELECT c_custkey AS k, c_name AS name FROM customer
),
rf AS (
  SELECT k, name, substr(name, 10, 6) AS blk,
         ROW_NUMBER() OVER (PARTITION BY substr(name, 10, 6)
                            ORDER BY name) AS rnk
  FROM cust
),
rr AS (
  SELECT k, name, substr(reverse(name), 1, 3) AS blk,
         ROW_NUMBER() OVER (PARTITION BY substr(reverse(name), 1, 3)
                            ORDER BY reverse(name)) AS rnk
  FROM cust
),
offs AS (SELECT unnest(generate_series(1, {SNM_W})) AS o),
cand AS MATERIALIZED (
  SELECT 'fwd' AS pass, LEAST(a.k, b.k) AS ka, GREATEST(a.k, b.k) AS kb,
         levenshtein(a.name, b.name) <= 1 AS ok
  FROM rf a JOIN offs ON TRUE JOIN rf b
    ON a.blk = b.blk AND b.rnk = a.rnk + offs.o
  UNION ALL
  SELECT 'rev', LEAST(a.k, b.k), GREATEST(a.k, b.k),
         levenshtein(a.name, b.name) <= 1
  FROM rr a JOIN offs ON TRUE JOIN rr b
    ON a.blk = b.blk AND b.rnk = a.rnk + offs.o
),
truth AS MATERIALIZED (
  -- numeric no-carry characterization of levenshtein<=1 on
  -- zero-padded names (the customer_name_neardup oracle route)
  SELECT a.k AS ka, a.k + d.d * CAST(POWER(10, p.p) AS BIGINT) AS kb
  FROM (SELECT k FROM cust) a,
       (SELECT unnest(generate_series(1, 9)) AS d) d,
       (SELECT unnest(generate_series(0, 8)) AS p) p
  WHERE ((a.k // CAST(POWER(10, p.p) AS BIGINT)) % 10) + d.d <= 9
    AND a.k + d.d * CAST(POWER(10, p.p) AS BIGINT) IN (SELECT k FROM cust)
),
uv AS (SELECT DISTINCT ka, kb FROM cand WHERE ok)
SELECT pass, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS metric
FROM cand GROUP BY 1
UNION ALL
SELECT 'union', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT)
FROM (SELECT DISTINCT ka, kb, ok FROM cand)
UNION ALL
SELECT 'truth',
       CAST((SELECT COUNT(*) FROM truth) AS BIGINT),
       CAST((SELECT COUNT(*) FROM uv JOIN truth USING (ka, kb))
            * 1000000 // GREATEST((SELECT COUNT(*) FROM truth), 1)
            AS BIGINT)
"""
