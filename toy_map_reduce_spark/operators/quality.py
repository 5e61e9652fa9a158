"""Training-data quality operators (X tier): repetition signals, composite
keep/drop filtering, n-gram eval-set decontamination, and PII detection —
the filter stages that sit between raw crawl and tokenizer in an LLM data
pipeline (C4/Gopher-style heuristics, re-expressed as exact relational
queries).

All pure JVM column expressions + one broadcast anti-pattern-free join;
zero Python UDFs. Each operator takes the whole documents table and is a
single groupBy/join composition, so the 100 TB plan is the sf0.01 plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from toy_map_reduce_spark.operators.textstats import STOPWORDS
from toy_map_reduce_spark.registry import register
from toy_map_reduce_spark.tables import load

# Decontamination shingle width: wide enough that a match means shared
# provenance, narrow enough to catch partial quoting. (Real pipelines use
# 8-13 token grams; the synthetic fixture corpus has 10-99-token docs, so 5
# keeps the operator observable at test scale.)
DECONTAM_N = 5

# Composite-filter thresholds (C4/Gopher-style). A doc is kept iff ALL hold.
MIN_TOKENS = 20
MAX_TOKENS = 10_000
MIN_TTR = 0.25          # type-token ratio floor: repetitive docs fail
MIN_STOPWORD_FRAC = 0.01  # natural text contains function words
MAX_TOP_BIGRAM_FRAC = 0.20  # Gopher: one dominant 2-gram = boilerplate


def _bigrams(toks):
    """token array → array of 'w1 w2' bigram strings (JVM-side)."""
    return F.expr(
        "transform(sequence(0, size({t}) - 2), i -> concat({t}[i], ' ', {t}[i+1]))".format(
            t=toks
        )
    )


_REPETITION_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bigram
  FROM t WHERE len(toks) >= 2
),
cnt AS (
  SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram
),
top AS (
  SELECT doc_id, MAX(c) AS max_c, SUM(c) AS total FROM cnt GROUP BY doc_id
)
SELECT t.doc_id,
       round(CAST(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS DOUBLE), 6) AS dup_token_frac,
       round(CAST(top.max_c AS DOUBLE) / top.total, 6) AS top_bigram_frac
FROM t JOIN top ON t.doc_id = top.doc_id
"""


@register("text_repetition", "X", oracle=_REPETITION_ORACLE,
          doc="Gopher-style repetition signals per doc: duplicate-token "
              "fraction and most-frequent-bigram fraction — the boilerplate "
              "detectors that gate crawl data before training")
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bigram count explodes to ~n_tokens rows per doc, then collapses
    map-side: both aggregations key on doc_id, so the whole computation is
    one shuffle and no per-doc data ever exceeds the doc's own length."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    docs = docs.where(F.size("toks") >= 2)
    bg = docs.select("doc_id", F.explode(_bigrams("toks")).alias("bigram"))
    cnt = bg.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("c"))
    top = cnt.groupBy("doc_id").agg(
        F.max("c").alias("max_c"), F.sum("c").alias("total")
    )
    sig = docs.select(
        "doc_id",
        F.round(
            1.0 - F.size(F.array_distinct("toks")).cast("double") / F.size("toks"), 6
        ).alias("dup_token_frac"),
    )
    return sig.join(top, "doc_id").select(
        "doc_id",
        "dup_token_frac",
        F.round(F.col("max_c").cast("double") / F.col("total"), 6).alias(
            "top_bigram_frac"
        ),
    )


_STOP_LIST_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

# Shared CTE block (t/bg/topbg/sig) — single source for quality_filter's
# oracle AND the end-to-end pipeline_full oracle, so the signal formulas
# can never drift between the standalone filter and the composed pipeline.
_SIG_CTES = f"""t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bigram
  FROM t WHERE len(toks) >= 2
),
topbg AS (
  SELECT doc_id, MAX(c) AS max_c, SUM(c) AS total
  FROM (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram)
  GROUP BY doc_id
),
sig AS (
  SELECT t.doc_id,
         len(toks) AS n_tokens,
         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
         CAST(len(list_filter(toks, x -> list_contains({_STOP_LIST_SQL}, x))) AS DOUBLE) / len(toks) AS stop_frac,
         COALESCE(CAST(topbg.max_c AS DOUBLE) / topbg.total, 0.0) AS top_bigram_frac
  FROM t LEFT JOIN topbg ON t.doc_id = topbg.doc_id
)"""

_KEEP_PRED = (
    f"(n_tokens >= {MIN_TOKENS} AND n_tokens <= {MAX_TOKENS}"
    f" AND ttr >= {MIN_TTR} AND stop_frac >= {MIN_STOPWORD_FRAC}"
    f" AND top_bigram_frac <= {MAX_TOP_BIGRAM_FRAC})"
)

_QUALITY_FILTER_ORACLE = f"""
WITH {_SIG_CTES}
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       round(ttr, 6) AS ttr,
       round(stop_frac, 6) AS stop_frac,
       round(top_bigram_frac, 6) AS top_bigram_frac,
       {_KEEP_PRED} AS keep
FROM sig
"""


@register("quality_filter", "X", oracle=_QUALITY_FILTER_ORACLE,
          doc="Composite C4/Gopher-style keep/drop filter: token-count "
              "bounds, type-token-ratio floor, stopword-fraction floor, "
              "top-bigram-fraction ceiling — every signal surfaced next to "
              "the verdict so filter rates are auditable")
def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production shape: compute ALL signals in one pass, emit the
    boolean verdict alongside them (an unauditable filter is a silent data
    bug at 100 TB — you want per-signal fail rates from the same query).
    One shuffle (the bigram count), everything else map-side."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    bg = docs.where(F.size("toks") >= 2).select(
        "doc_id", F.explode(_bigrams("toks")).alias("bigram")
    )
    topbg = (
        bg.groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_c"), F.sum("c").alias("total"))
    )
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    sig = docs.join(topbg, "doc_id", "left").select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        (F.size(F.array_distinct("toks")).cast("double") / F.size("toks")).alias("ttr"),
        (
            F.size(F.filter("toks", lambda x: F.array_contains(stop_arr, x))).cast(
                "double"
            )
            / F.size("toks")
        ).alias("stop_frac"),
        F.coalesce(
            F.col("max_c").cast("double") / F.col("total"), F.lit(0.0)
        ).alias("top_bigram_frac"),
    )
    return sig.select(
        "doc_id",
        "n_tokens",
        F.round("ttr", 6).alias("ttr"),
        F.round("stop_frac", 6).alias("stop_frac"),
        F.round("top_bigram_frac", 6).alias("top_bigram_frac"),
        (
            (F.col("n_tokens") >= MIN_TOKENS)
            & (F.col("n_tokens") <= MAX_TOKENS)
            & (F.col("ttr") >= MIN_TTR)
            & (F.col("stop_frac") >= MIN_STOPWORD_FRAC)
            & (F.col("top_bigram_frac") <= MAX_TOP_BIGRAM_FRAC)
        ).alias("keep"),
    )


_DECONTAM_NGRAM_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(toks) - {DECONTAM_N - 2}),
                i -> list_aggregate(toks[i : i + {DECONTAM_N - 1}], 'string_agg', ' '))) AS gram
  FROM t WHERE len(toks) >= {DECONTAM_N}
),
eval_grams AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 20 = 0),
train AS (SELECT * FROM grams WHERE doc_id % 20 <> 0)
SELECT train.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_ngrams
FROM train JOIN eval_grams ON train.gram = eval_grams.gram
GROUP BY train.doc_id
"""


def ngram_decontaminate(docs: DataFrame, n: int = DECONTAM_N) -> DataFrame:
    """Train docs sharing at least one n-gram with the eval split
    (doc_id % 20 = 0), with the shared-gram count. The eval gram set is
    small by definition (eval sets are curated, not crawled), so it
    BROADCASTS and the contamination check is a map-side semi-join —
    the only formulation that works when the train side is 100 TB."""
    toks = docs.select("doc_id", F.split("text", " ").alias("toks")).where(
        F.size("toks") >= n
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(toks) - {n}), "
                f"i -> array_join(slice(toks, i + 1, {n}), ' '))"
            )
        ).alias("gram"),
    ).distinct()
    eval_grams = (
        grams.where(F.col("doc_id") % 20 == 0).select("gram").distinct()
    )
    train = grams.where(F.col("doc_id") % 20 != 0)
    return (
        train.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


@register("decontaminate_ngram", "X", oracle=_DECONTAM_NGRAM_ORACLE,
          doc="N-gram eval-set decontamination: flag train docs sharing any "
              "5-gram with the eval split (doc_id % 20 = 0) via a broadcast "
              "join on the (small, curated) eval gram set — catches partial "
              "quoting that exact-hash decontamination misses")
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_decontaminate(load(spark, sf_dir, "documents"))


# PII patterns shared verbatim by both engines (RE2-compatible subset:
# works identically in Spark's java.util.regex and DuckDB's RE2).
PII_PATTERNS = {
    "n_emails": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "n_phones": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
    "n_ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "n_ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}


def pii_counts(docs: DataFrame) -> DataFrame:
    """Per-doc PII hit counts, JVM-side regexp_count only — the scan that
    decides redaction (text_redact is the act-on-it stage)."""
    cols = [
        F.regexp_count("text", F.lit(pat)).cast("long").alias(name)
        for name, pat in PII_PATTERNS.items()
    ]
    out = docs.select("doc_id", *cols)
    total = sum(F.col(n) for n in PII_PATTERNS)
    return out.withColumn("n_pii_total", total.cast("long"))


_PII_ORACLE = (
    "SELECT doc_id, "
    + ", ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS {name}"
        for name, pat in PII_PATTERNS.items()
    )
    + ", CAST("
    + " + ".join(
        f"len(regexp_extract_all(text, '{pat}'))" for pat in PII_PATTERNS.values()
    )
    + " AS BIGINT) AS n_pii_total FROM documents"
)


@register("text_pii_detect", "X", oracle=_PII_ORACLE,
          doc="PII detection scan: per-doc email/phone/IPv4/SSN hit counts "
              "via shared RE2-compatible patterns (the audit stage ahead of "
              "text_redact); crafted-corpus pytest pins the pattern "
              "semantics")
def text_pii_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pii_counts(load(spark, sf_dir, "documents"))


_PIPELINE_FULL_ORACLE = f"""
WITH {_SIG_CTES},
kept AS (SELECT doc_id FROM sig WHERE {_KEEP_PRED}),
norm AS (
  SELECT d.doc_id,
         sha256(regexp_replace(trim(lower(d.text)), '\\s+', ' ', 'g')) AS h
  FROM documents d JOIN kept ON d.doc_id = kept.doc_id
),
surv AS (SELECT MIN(doc_id) AS doc_id FROM norm GROUP BY h),
grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(toks) - {DECONTAM_N - 2}),
                i -> list_aggregate(toks[i : i + {DECONTAM_N - 1}], 'string_agg', ' '))) AS gram
  FROM t WHERE len(toks) >= {DECONTAM_N}
),
eval_grams AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 20 = 0),
contaminated AS (
  SELECT DISTINCT g.doc_id FROM grams g JOIN eval_grams e ON g.gram = e.gram
  WHERE g.doc_id % 20 <> 0
),
clean AS (
  SELECT s.doc_id FROM surv s
  WHERE s.doc_id % 20 <> 0
    AND s.doc_id NOT IN (SELECT doc_id FROM contaminated)
),
final AS (
  SELECT c.doc_id,
         CASE WHEN {{fp}} % 100 < 80 THEN 'train'
              WHEN {{fp}} % 100 < 90 THEN 'val'
              ELSE 'test' END AS split,
         len(string_split(d.text, ' ')) AS n_tokens
  FROM clean c JOIN documents d ON c.doc_id = d.doc_id
)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
FROM final
GROUP BY split
"""


# pipeline's fingerprint expression, retargeted at the d alias — the split
# assignment must hash the same bytes as dataset_split does
from toy_map_reduce_spark.operators.pipeline import _FP_SQL as _FP  # noqa: E402


@register("pipeline_full", "X",
          oracle=_PIPELINE_FULL_ORACLE.format(fp=_FP.replace("text", "d.text")),
          doc="The flagship end-to-end training-data pipeline as ONE query: "
              "quality filter → exact dedup (min-id survivor) → eval-split "
              "exclusion + 5-gram decontamination → fingerprint 80/10/10 "
              "split → per-split doc/token counts. Every stage composes the "
              "standalone operators' exact logic; the oracle chains the same "
              "CTEs")
def pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition is the point: each stage is the same DataFrame logic as
    its standalone operator (shared code, shared thresholds), and the whole
    chain is ONE Catalyst plan — the optimizer sees through the stages,
    prunes columns end-to-end, and the only shuffles are the four keyed
    aggregations. At 100 TB this runs as a single job, not four."""
    from toy_map_reduce_spark.operators.dedup import _norm_text
    from toy_map_reduce_spark.operators.pipeline import _fingerprint

    docs = load(spark, sf_dir, "documents")

    kept = quality_filter(spark, sf_dir).where(F.col("keep")).select("doc_id")
    surv = (
        docs.join(kept, "doc_id")
        .select("doc_id", F.sha2(_norm_text(F.col("text")), 256).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    contaminated = ngram_decontaminate(docs).select("doc_id")
    clean = (
        surv.where(F.col("doc_id") % 20 != 0)
        .join(contaminated, "doc_id", "left_anti")
    )
    bucket = _fingerprint() % 100
    final = docs.join(clean, "doc_id").select(
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    return final.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
    )


_UNIGRAM_LOGPROB_ORACLE = """
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
),
tok AS (
  SELECT doc_id, unnest(toks) AS tok FROM t
),
vocab AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY tok
),
total AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM vocab)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       round(SUM(-log2(CAST(c AS DOUBLE) / n)) / COUNT(*), 6) AS avg_bits
FROM tok JOIN vocab USING (tok), total
GROUP BY doc_id
"""


@register("text_unigram_logprob", "X", oracle=_UNIGRAM_LOGPROB_ORACLE,
          doc="Unigram-LM surprisal per document: corpus unigram "
              "frequencies → per-token -log2 p → per-doc mean bits/token. "
              "The cheapest perplexity proxy for quality bucketing — low "
              "bits = repetitive boilerplate, high bits = rare-token noise")
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two aggregates and one join, all keyed on the token: the vocab
    count is partial+final (a hot token like 'the' never concentrates in
    one task), the corpus total is a broadcast scalar, and the
    token→count join is a shuffle join on the same key the vocab agg just
    produced — AQE's skew-join splitting covers the hot-token probe side
    at crawl scale. A real pipeline would snapshot the vocab once and
    broadcast the top-K entries; the dataflow here is that pipeline's
    first iteration."""
    tok = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(F.col("text"), " ", -1)).alias("tok"))
    )
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    bits = -F.log2(F.col("c").cast("double") / F.col("n"))
    return (
        tok.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum(bits) / F.count(F.lit(1)), 6).alias("avg_bits"),
        )
    )


_BIGRAM_LOGPROB_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS w1,
         unnest(list_transform(range(1, len(toks)), i -> toks[i + 1])) AS w2
  FROM t WHERE len(toks) >= 2
),
uni AS (
  SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bg GROUP BY w1
),
pair AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY w1, w2
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       round(SUM(-log2(CAST(c12 AS DOUBLE) / c1)) / COUNT(*), 6) AS avg_bits
FROM bg JOIN pair USING (w1, w2) JOIN uni USING (w1)
GROUP BY doc_id
"""


@register("text_bigram_logprob", "X", oracle=_BIGRAM_LOGPROB_ORACLE,
          doc="Bigram-LM conditional surprisal per document: corpus "
              "p(w2|w1) = c(w1w2)/c(w1), per-doc mean -log2 bits — the "
              "next step up from text_unigram_logprob's context-free "
              "proxy, sharper at separating fluent text from shuffled "
              "tokens")
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unigram caveats apply doubled: both count tables come from
    partial+final aggregates, and the two probe joins are keyed on
    (w1, w2) / (w1) where AQE skew-splitting covers the hot-prefix side.
    Note c(w1) here counts w1 as a bigram PREFIX (not raw frequency), so
    the conditional distribution sums to 1 per prefix by construction —
    the detail that makes the bits comparable across docs."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " ", -1).alias("t")
    ).where(F.size("t") >= 2)
    bg = toks.select(
        "doc_id",
        F.posexplode(F.slice(F.col("t"), 1, F.size("t") - 1)).alias("i", "w1"),
        F.col("t").alias("t"),
    ).select(
        "doc_id", "w1", F.element_at("t", F.col("i") + 2).alias("w2")
    )
    uni = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    pair = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    bits = -F.log2(F.col("c12").cast("double") / F.col("c1"))
    return (
        bg.join(pair, ["w1", "w2"])
        .join(uni, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum(bits) / F.count(F.lit(1)), 6).alias("avg_bits"),
        )
    )


BLOCKLIST = ("error", "fail", "slow")

_BLOCKLIST_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang,
         len(list_intersect(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' '),
                            {list(BLOCKLIST)})) AS n_terms_hit,
         len(list_filter(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' '),
                         t -> list_contains({list(BLOCKLIST)}, t))) AS n_hits
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_hits = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
       CAST(SUM(n_hits) AS BIGINT) AS total_hits,
       CAST(SUM(n_terms_hit) AS BIGINT) AS total_distinct_terms_hit
FROM scored
GROUP BY lang
"""


@register("text_blocklist_filter", "X", oracle=_BLOCKLIST_ORACLE,
          doc="Blocklist safety filter: per-doc token matches against a "
              "broadcast term list (total hits + distinct terms hit), "
              "per-language clean/flagged counts — the list-based content "
              "filter stage that runs beside the heuristic quality_filter")
def text_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The blocklist is a literal array expression — at real scale a
    10⁵-term list still broadcasts as one array (or a broadcast-joined
    lookup table for multi-word phrases), so the scan stays one pass
    with zero shuffle before the final per-language aggregate.
    array_intersect counts DISTINCT terms hit; the filter-count gives
    total occurrences — both signals real safety pipelines log for
    audit."""
    from toy_map_reduce_spark.functions.text import norm_text

    docs = load(spark, sf_dir, "documents")
    toks = F.split(norm_text(F.col("text")), " ")
    bl = F.array(*[F.lit(t) for t in BLOCKLIST])
    scored = docs.select(
        "lang",
        F.size(F.array_intersect(toks, bl)).alias("n_terms_hit"),
        F.size(F.filter(toks, lambda t: F.array_contains(bl, t))).alias("n_hits"),
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("n_hits") == 0, 1).otherwise(0)).cast("bigint").alias("n_clean"),
        F.sum("n_hits").cast("bigint").alias("total_hits"),
        F.sum("n_terms_hit").cast("bigint").alias("total_distinct_terms_hit"),
    )


# Inline SFT-conversation corpus with planted format violations: conv 1
# is clean; conv 2 starts with assistant; conv 3 repeats a role; conv 4
# has an empty turn; conv 5 has an unknown role. Kept byte-identical
# between builder and oracle.
_CHAT_ROWS = [
    (1, 0, "user", "hi"), (1, 1, "assistant", "hello"),
    (1, 2, "user", "thanks"), (1, 3, "assistant", "welcome"),
    (2, 0, "assistant", "unprompted"), (2, 1, "user", "ok"),
    (3, 0, "user", "a"), (3, 1, "user", "b"), (3, 2, "assistant", "c"),
    (4, 0, "user", "q"), (4, 1, "assistant", ""),
    (5, 0, "user", "x"), (5, 1, "bot", "y"),
]

_CHAT_VALUES = ", ".join(
    f"({c}, {t}, '{r}', '{m}')" for c, t, r, m in _CHAT_ROWS
)

_CHAT_FORMAT_ORACLE = f"""
WITH turns(conv_id, turn_idx, role, content) AS (VALUES {_CHAT_VALUES}),
lagged AS (
  SELECT conv_id, turn_idx, role, content,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx NULLS FIRST) AS prev_role
  FROM turns
)
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       MIN(CASE WHEN turn_idx = 0 THEN role END) = 'user' AS starts_with_user,
       CAST(SUM(CASE WHEN role = prev_role THEN 1 ELSE 0 END) AS BIGINT)
         AS n_role_repeats,
       CAST(SUM(CASE WHEN content = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
       CAST(SUM(CASE WHEN role NOT IN ('user', 'assistant') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_bad_role,
       MIN(CASE WHEN turn_idx = 0 THEN role END) = 'user'
         AND SUM(CASE WHEN role = prev_role THEN 1 ELSE 0 END) = 0
         AND SUM(CASE WHEN content = '' THEN 1 ELSE 0 END) = 0
         AND SUM(CASE WHEN role NOT IN ('user', 'assistant') THEN 1 ELSE 0 END) = 0
         AS is_valid
FROM lagged GROUP BY conv_id
"""


@register("quality_chat_format", "X", oracle=_CHAT_FORMAT_ORACLE,
          doc="SFT chat-format validation (inline corpus): per "
              "conversation — starts with user, strict role alternation, "
              "no empty turns, only known roles — each violation counted "
              "separately so the gate is auditable, one verdict row per "
              "conversation")
def quality_chat_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The companion gate to tokenize_chat_template: validate BEFORE
    flattening (a malformed conversation silently trains the model on
    role soup). One lag window per conversation (turns are short by
    construction) then a single per-conv aggregate; same auditable
    per-signal shape as quality_filter."""
    from pyspark.sql import Window

    turns = spark.createDataFrame(
        _CHAT_ROWS, ["conv_id", "turn_idx", "role", "content"]
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lagged = turns.withColumn("prev_role", F.lag("role").over(w))
    first_user = F.min(F.when(F.col("turn_idx") == 0, F.col("role"))) == "user"
    repeats = F.sum(F.when(F.col("role") == F.col("prev_role"), 1).otherwise(0))
    empties = F.sum(F.when(F.col("content") == "", 1).otherwise(0))
    bad_roles = F.sum(
        F.when(~F.col("role").isin("user", "assistant"), 1).otherwise(0)
    )
    return lagged.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        first_user.alias("starts_with_user"),
        repeats.cast("long").alias("n_role_repeats"),
        empties.cast("long").alias("n_empty"),
        bad_roles.cast("long").alias("n_bad_role"),
        (
            first_user & (repeats == 0) & (empties == 0) & (bad_roles == 0)
        ).alias("is_valid"),
    )


_ABLATION_ORACLE = f"""
WITH {_SIG_CTES},
r AS (
  SELECT doc_id,
         CAST(n_tokens AS BIGINT) AS n_tokens,
         round(ttr, 6) AS ttr,
         round(stop_frac, 6) AS stop_frac,
         round(top_bigram_frac, 6) AS top_bigram_frac
  FROM sig
),
flags AS (
  SELECT doc_id,
         NOT (n_tokens >= {MIN_TOKENS} AND n_tokens <= {MAX_TOKENS}) AS f_tokens,
         ttr < {MIN_TTR} AS f_ttr,
         stop_frac < {MIN_STOPWORD_FRAC} AS f_stop,
         top_bigram_frac > {MAX_TOP_BIGRAM_FRAC} AS f_bigram
  FROM r
),
counted AS (
  SELECT doc_id, f_tokens, f_ttr, f_stop, f_bigram,
         CAST(f_tokens AS INT) + CAST(f_ttr AS INT)
           + CAST(f_stop AS INT) + CAST(f_bigram AS INT) AS n_failed
  FROM flags
)
SELECT s.signal,
       CAST(SUM(CASE WHEN s.fail THEN 1 ELSE 0 END) AS BIGINT) AS n_fail,
       CAST(SUM(CASE WHEN s.fail AND c.n_failed = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unique_fail
FROM counted c,
     LATERAL (SELECT unnest(['tokens', 'ttr', 'stopwords', 'top_bigram']) AS signal,
                     unnest([c.f_tokens, c.f_ttr, c.f_stop, c.f_bigram]) AS fail) s
GROUP BY s.signal
ORDER BY s.signal
"""


@register("quality_filter_ablation", "X", oracle=_ABLATION_ORACLE,
          doc="Filter ablation report: per quality signal, how many docs "
              "fail it at all and how many it uniquely removes (no other "
              "signal fires) — the marginal-contribution view that tells "
              "a curation team which thresholds actually bite")
def quality_filter_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built ON TOP of quality_filter's output (same builder, same
    rounded signal columns, same thresholds — single source of truth),
    so the ablation can never disagree with the filter it explains.
    Unique-fail is the number a threshold review needs: a signal with
    n_fail high but n_unique_fail 0 is redundant with the others."""
    q = quality_filter(spark, sf_dir)
    flags = q.select(
        "doc_id",
        (~F.col("n_tokens").between(MIN_TOKENS, MAX_TOKENS)).alias("f_tokens"),
        (F.col("ttr") < MIN_TTR).alias("f_ttr"),
        (F.col("stop_frac") < MIN_STOPWORD_FRAC).alias("f_stop"),
        (F.col("top_bigram_frac") > MAX_TOP_BIGRAM_FRAC).alias("f_bigram"),
    )
    counted = flags.select(
        "*",
        (
            F.col("f_tokens").cast("int") + F.col("f_ttr").cast("int")
            + F.col("f_stop").cast("int") + F.col("f_bigram").cast("int")
        ).alias("n_failed"),
    )
    pairs = F.array(
        F.struct(F.lit("tokens").alias("signal"), F.col("f_tokens").alias("fail")),
        F.struct(F.lit("ttr").alias("signal"), F.col("f_ttr").alias("fail")),
        F.struct(F.lit("stopwords").alias("signal"), F.col("f_stop").alias("fail")),
        F.struct(F.lit("top_bigram").alias("signal"), F.col("f_bigram").alias("fail")),
    )
    exploded = counted.select("n_failed", F.explode(pairs).alias("s"))
    return (
        exploded.groupBy(F.col("s.signal").alias("signal"))
        .agg(
            F.sum(F.when(F.col("s.fail"), 1).otherwise(0)).cast("long").alias("n_fail"),
            F.sum(F.when(F.col("s.fail") & (F.col("n_failed") == 1), 1).otherwise(0))
            .cast("long")
            .alias("n_unique_fail"),
        )
        .orderBy("signal")
    )


# --- hashed-feature linear quality model ------------------------------------
#
# The "model-scored quality" stage of a training pipeline (the fasttext-
# style classifier step), reduced to its Spark-shaped essence: per-token
# pseudo-weights derived from a portable deterministic token code, mean-
# pooled per document, squashed through a sigmoid. The weights are a stand-
# in for a trained linear model's hashed-feature weights — the POINT is the
# execution shape (model scoring as one scan, no UDF), not the model.
QUALITY_SIGMOID_K = 10.0

_MODEL_SCORE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents
),
w AS (
  SELECT doc_id, lang,
         ((length(tok) * 131 + ascii(substr(tok, 1, 1))) % 1001 - 500) / 1000.0 AS wt
  FROM toks WHERE tok <> ''
),
scored AS (
  SELECT doc_id, lang,
         1.0 / (1.0 + exp(-{QUALITY_SIGMOID_K} * AVG(wt))) AS score
  FROM w GROUP BY doc_id, lang
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       round(AVG(score), 6) AS mean_score,
       CAST(SUM(CASE WHEN score > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
FROM scored GROUP BY lang
"""


@register("quality_model_score", "X", oracle=_MODEL_SCORE_ORACLE,
          doc="Linear quality-model scoring as a scan: deterministic hashed "
              "per-token weights mean-pooled per doc, sigmoid squash, "
              "per-language pass rates — the execution shape of the "
              "classifier-filter stage (one pass, zero UDFs, weights "
              "resolved map-side)")
def quality_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At 100 TB the real version broadcasts a vocab→weight map and this
    plan is unchanged: explode tokens, map-side weight lookup, one
    partial+final groupBy per doc, one per-lang rollup. Everything is
    JVM column arithmetic; the sigmoid is exp()/arithmetic, identical
    IEEE cross-engine, and only the final averages are rounded."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    wt = (
        (F.length("tok") * 131 + F.ascii(F.substring("tok", 1, 1))) % 1001 - 500
    ) / 1000.0
    scored = toks.select("doc_id", "lang", wt.alias("wt")).groupBy(
        "doc_id", "lang"
    ).agg(
        (1.0 / (1.0 + F.exp(-QUALITY_SIGMOID_K * F.avg("wt")))).alias("score")
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg("score"), 6).alias("mean_score"),
        F.sum(F.when(F.col("score") > 0.5, 1).otherwise(0)).cast("long").alias("n_pass"),
    )
