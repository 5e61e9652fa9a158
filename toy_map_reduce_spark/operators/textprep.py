"""Text-preparation operators (X tier): readability scoring, HTML
stripping, chat-template flattening, and URL extraction — the transform
stages that sit between raw crawl/chat logs and the tokenizer in an LLM
data pipeline, each as pure JVM column expressions with exact DuckDB twins.

Like the reference's tokenizer UDF (``UserDefinedFunctions.scala:12-16``,
split-on-spaces), every operator here is per-row and embarrassingly
parallel: zero shuffles except the final small aggregations, so the 100 TB
plan is a pure map over the scan with predicate/column pruning intact.

The HTML / chat / URL corpora are inline literal tables (same pattern as
join_theta_tier's tier table): the synthetic documents fixture is plain
prose, so these operators carry their own representative rows in both the
Spark builder and the VALUES clause of the oracle — identical bytes on
both sides, no filesystem dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from toy_map_reduce_spark.registry import register
from toy_map_reduce_spark.tables import load

# The Flesch score is computed as ONE exact integer-rational division
# (r9): numerator x1000 is an exact BIGINT (206835*s*w - 1015*w*w -
# 84600*sy*s), so both engines divide the identical pair of exact
# integers and produce the bit-identical double. The former three-term
# float form (206.835 - 1.015*w/s - 84.6*sy/w) drifted an ulp between
# engines and flipped round(,4) on docs whose true score sits exactly on
# a half-boundary (28.19375 et al — 5 docs at sf0.1, PARITY_r9).
_READABILITY_ORACLE = """
WITH m AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS sentences,
         CAST(greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS BIGINT) AS syllables
  FROM documents
)
SELECT doc_id, words, sentences, syllables,
       round(CAST(206835 * sentences * words - 1015 * words * words
                  - 84600 * syllables * sentences AS DOUBLE)
             / CAST(1000 * sentences * words AS DOUBLE), 4) AS flesch
FROM m
"""


@register("text_readability", "X", oracle=_READABILITY_ORACLE,
          doc="Flesch reading-ease per document: words / sentence-marker "
              "runs / vowel-group syllable estimate — the classic "
              "readability quality signal, all regex-countable")
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syllables ≈ maximal vowel-group runs (the standard cheap estimator);
    all three counts are regexp_extract_all sizes, one map pass, no
    shuffle at all — the scan parallelism IS the operator parallelism."""
    docs = load(spark, sf_dir, "documents")
    words = F.size(F.split("text", " "))
    sentences = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit("[.!?]+"), F.lit(0))), F.lit(1)
    )
    syllables = F.greatest(
        F.size(F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), F.lit(0))),
        F.lit(1),
    )
    m = docs.select(
        "doc_id",
        words.cast("long").alias("words"),
        sentences.cast("long").alias("sentences"),
        syllables.cast("long").alias("syllables"),
    )
    # one exact integer-rational division (see _READABILITY_ORACLE note):
    # the x1000 numerator is an exact BIGINT, so the double quotient is
    # bit-identical cross-engine and round(,4) can't flip on an ulp
    w, s, sy = F.col("words"), F.col("sentences"), F.col("syllables")
    num = (F.lit(206835) * s * w - F.lit(1015) * w * w - F.lit(84600) * sy * s)
    return m.select(
        "doc_id", "words", "sentences", "syllables",
        F.round(
            num.cast("double") / (F.lit(1000) * s * w).cast("double"), 4
        ).alias("flesch"),
    )


# Inline HTML corpus: one row per realistic crawl snippet (tags, nesting,
# entities, attributes). Kept byte-identical between builder and oracle.
_HTML_ROWS = [
    (1, "<html><head><title>Spark at Scale</title></head>"
        "<body><h1>Intro</h1><p>Shuffles &amp; joins matter.</p></body></html>"),
    (2, "<div class=\"post\"><a href=\"https://example.com\">A &lt;link&gt;</a>"
        " and <b>bold</b> text</div>"),
    (3, "<p>No title here</p><p>Second paragraph with trailing space </p>"),
    (4, "plain text, zero markup"),
]

_HTML_VALUES = ", ".join(
    "({}, '{}')".format(i, t.replace("'", "''")) for i, t in _HTML_ROWS
)

_HTML_STRIP_ORACLE = f"""
WITH raw(page_id, html) AS (VALUES {_HTML_VALUES}),
s AS (
  SELECT page_id,
         trim(regexp_replace(
           replace(replace(replace(regexp_replace(html, '<[^>]*>', ' ', 'g'),
                   '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
           ' +', ' ', 'g')) AS body,
         regexp_extract(html, '<title>([^<]*)</title>', 1) AS title
  FROM raw
)
SELECT page_id, title, body, len(string_split(body, ' ')) AS n_words
FROM s
"""


@register("text_html_strip", "X", oracle=_HTML_STRIP_ORACLE,
          doc="HTML → text extraction: tag strip, entity decode, "
              "whitespace collapse, <title> capture — the first transform "
              "applied to every crawled page before quality filtering")
def text_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure regexp_replace chain (patterns restricted to the dialect
    intersection of Java regex and RE2: no backrefs, no lookarounds) —
    per-row map, zero shuffle; at crawl scale this runs at scan speed."""
    raw = spark.createDataFrame(_HTML_ROWS, "page_id int, html string")
    detagged = F.regexp_replace("html", "<[^>]*>", " ")
    decoded = F.replace(
        F.replace(
            F.replace(detagged, F.lit("&amp;"), F.lit("&")),
            F.lit("&lt;"), F.lit("<"),
        ),
        F.lit("&gt;"), F.lit(">"),
    )
    body = F.trim(F.regexp_replace(decoded, " +", " "))
    s = raw.select(
        "page_id",
        F.regexp_extract("html", "<title>([^<]*)</title>", 1).alias("title"),
        body.alias("body"),
    )
    return s.select(
        "page_id", "title", "body",
        F.size(F.split("body", " ")).alias("n_words"),
    )


# Inline chat corpus: (conv_id, turn, role, content) — two conversations,
# multi-turn, out-of-order rows to make the ORDER BY turn semantics real.
_CHAT_ROWS = [
    (1, 2, "assistant", "Use a broadcast join for the small side."),
    (1, 1, "user", "How do I join a tiny dim table at scale?"),
    (1, 3, "user", "And if both sides are large?"),
    (1, 4, "assistant", "Shuffle on the join key and let AQE handle skew."),
    (2, 1, "user", "Summarize MinHash in one line."),
    (2, 2, "assistant", "Hash shingles, keep per-band minima, bucket-join the bands."),
]

_CHAT_VALUES = ", ".join(
    "({}, {}, '{}', '{}')".format(c, t, r, x.replace("'", "''"))
    for c, t, r, x in _CHAT_ROWS
)

_CHAT_TEMPLATE_ORACLE = f"""
WITH turns(conv_id, turn, role, content) AS (VALUES {_CHAT_VALUES})
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       string_agg('<|' || role || '|>' || content, '' ORDER BY turn) AS rendered,
       CAST(len(string_split(string_agg(content, ' ' ORDER BY turn), ' ')) AS INT) AS n_tokens
FROM turns
GROUP BY conv_id
"""


@register("tokenize_chat_template", "X", oracle=_CHAT_TEMPLATE_ORACLE,
          doc="Chat-template flattening: multi-turn conversations rendered "
              "to a single '<|role|>content' training string in turn order, "
              "with whitespace token counts — the SFT-data serialization "
              "step")
def tokenize_chat_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order is imposed by array_sort over (turn, …) structs AFTER the
    per-conversation collect — deterministic regardless of shuffle
    arrival order (collect_list alone is not). One shuffle on conv_id;
    per-conversation state is bounded by turns-per-chat, never corpus
    size."""
    turns = spark.createDataFrame(
        _CHAT_ROWS, "conv_id int, turn int, role string, content string"
    )
    sorted_turns = F.array_sort(
        F.collect_list(F.struct("turn", "role", "content"))
    )
    grouped = turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        sorted_turns.alias("ts"),
    )
    rendered = F.array_join(
        F.transform("ts", lambda t: F.concat(
            F.lit("<|"), t["role"], F.lit("|>"), t["content"]
        )),
        "",
    )
    token_text = F.array_join(F.transform("ts", lambda t: t["content"]), " ")
    return grouped.select(
        "conv_id",
        "n_turns",
        rendered.alias("rendered"),
        F.size(F.split(token_text, " ")).alias("n_tokens"),
    )


# Inline link corpus: pages with zero-to-many URLs embedded in prose.
_LINK_ROWS = [
    (1, "See https://spark.apache.org/docs and https://duckdb.org for more"),
    (2, "Mirrors: https://spark.apache.org/downloads plus http://example.com/a/b"),
    (3, "no links in this one"),
    (4, "dup domain https://duckdb.org/why and text after"),
]

_LINK_VALUES = ", ".join(
    "({}, '{}')".format(i, t.replace("'", "''")) for i, t in _LINK_ROWS
)

_URL_EXTRACT_ORACLE = f"""
WITH pages(page_id, text) AS (VALUES {_LINK_VALUES}),
urls AS (
  SELECT page_id,
         unnest(regexp_extract_all(text, 'https?://[A-Za-z0-9./_-]+')) AS url
  FROM pages
)
SELECT regexp_extract(url, 'https?://([^/]+)', 1) AS domain,
       CAST(COUNT(*) AS BIGINT) AS n_links,
       CAST(COUNT(DISTINCT page_id) AS BIGINT) AS n_pages,
       MIN(url) AS sample_url
FROM urls
GROUP BY domain
"""


@register("text_url_extract", "X", oracle=_URL_EXTRACT_ORACLE,
          doc="URL harvesting: regexp-extract all links, explode, group by "
              "domain with link/page counts — the outlink analysis behind "
              "crawl frontier seeding and domain-level quality scores")
def text_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode produces links-per-page rows (bounded small), then one
    map-side-combined groupBy on domain; at crawl scale domain skew is
    real (a few CDNs dominate) — counts are partial-aggregated so the hot
    domain costs one combiner row per task, not a hot partition."""
    pages = spark.createDataFrame(_LINK_ROWS, "page_id int, text string")
    urls = pages.select(
        "page_id",
        F.explode(
            F.regexp_extract_all("text", F.lit("https?://[A-Za-z0-9./_-]+"), F.lit(0))
        ).alias("url"),
    )
    return (
        urls.select(
            F.regexp_extract("url", "https?://([^/]+)", 1).alias("domain"),
            "page_id", "url",
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("page_id").alias("n_pages"),
            F.min("url").alias("sample_url"),
        )
    )


# Inline license-header corpus: real-world opening lines (plus a dual
# license and a no-match), classified by first matching pattern in
# precedence order. Kept byte-identical between builder and oracle.
_LICENSE_ROWS = [
    (1, "Licensed under the Apache License, Version 2.0 (the License)"),
    (2, "Permission is hereby granted, free of charge (MIT License)"),
    (3, "This program is free software: GNU General Public License v3"),
    (4, "Redistribution and use in source and binary forms (BSD)"),
    (5, "Mozilla Public License Version 2.0"),
    (6, "Copyright 2024 Example Corp. All rights reserved."),
    (7, "Dual licensed under the MIT License or the Apache License 2.0"),
]

_LICENSE_VALUES = ", ".join(f"({i}, '{t}')" for i, t in _LICENSE_ROWS)

# (label, case-insensitive regex) in precedence order — first hit wins.
_LICENSE_PATTERNS = [
    ("apache-2.0", "apache license"),
    ("mit", "mit license"),
    ("gpl", "general public license"),
    ("bsd", "redistribution and use in source and binary forms"),
    ("mpl-2.0", "mozilla public license"),
]


def _license_case_sql() -> str:
    branches = "\n".join(
        f"  WHEN regexp_matches(lower(header), '{pat}') THEN '{lab}'"
        for lab, pat in _LICENSE_PATTERNS
    )
    return f"CASE\n{branches}\n  ELSE 'unknown' END"


_LICENSE_ORACLE = f"""
WITH raw(file_id, header) AS (VALUES {_LICENSE_VALUES})
SELECT file_id,
       {_license_case_sql()} AS license,
       regexp_matches(lower(header), 'apache license')
         AND regexp_matches(lower(header), 'mit license') AS is_dual
FROM raw
"""


@register("text_license_detect", "X", oracle=_LICENSE_ORACLE,
          doc="License detection (inline corpus): first-match precedence "
              "over case-insensitive marker patterns for Apache/MIT/GPL/"
              "BSD/MPL plus a dual-license flag — the compliance gate of "
              "a code-corpus pipeline")
def text_license_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure map-side regex classification; precedence order is a single
    CASE chain shared (generated) with the oracle so the two engines
    cannot disagree about tie-breaks. At corpus scale this runs on file
    headers only (first N bytes), not full contents — the pattern table
    is the thing to maintain, which is why it is data, not code."""
    raw = spark.createDataFrame(_LICENSE_ROWS, ["file_id", "header"])
    low = F.lower("header")
    expr = None
    for lab, pat in _LICENSE_PATTERNS:
        cond = low.rlike(pat)
        expr = F.when(cond, lab) if expr is None else expr.when(cond, lab)
    return raw.select(
        "file_id",
        expr.otherwise("unknown").alias("license"),
        (low.rlike("apache license") & low.rlike("mit license")).alias("is_dual"),
    )


# Inline mixed corpus: code and prose snippets for the classifier; the
# signals are symbol density, code-keyword hits, and line-start indent.
_CODE_ROWS = [
    (1, "def main(argv):\\n    return argv[0] if argv else None"),
    (2, "The quarterly report shows steady growth across all regions."),
    (3, "for (int i = 0; i < n; i++) { sum += a[i]; }"),
    (4, "SELECT user_id, COUNT(*) FROM events GROUP BY user_id;"),
    (5, "Once upon a time, a small team built a large data pipeline."),
    (6, "import os\\nimport sys\\nprint(os.path.join(sys.argv[1], x))"),
]

_CODE_VALUES = ", ".join(
    "({}, '{}')".format(i, t.replace("'", "''")) for i, t in _CODE_ROWS
)

_CODE_DETECT_ORACLE = f"""
WITH raw(snippet_id, body) AS (VALUES {_CODE_VALUES}),
sig AS (
  SELECT snippet_id,
         CAST(length(regexp_replace(body, '[^(){{}}\\[\\];=<>]', '', 'g')) AS DOUBLE)
           / length(body) AS sym_frac,
         CAST(len(regexp_extract_all(lower(body),
              '\\b(def|return|import|for|while|int|select|from|group by|print)\\b'))
           AS BIGINT) AS kw_hits
  FROM raw
)
SELECT snippet_id,
       round(sym_frac, 6) AS sym_frac,
       kw_hits,
       sym_frac > 0.05 OR kw_hits >= 2 AS is_code
FROM sig
"""


@register("text_code_detect", "X", oracle=_CODE_DETECT_ORACLE,
          doc="Code-vs-prose heuristic (inline corpus): structural-symbol "
              "density plus programming-keyword hits with an OR verdict "
              "— the router that sends documents to a code or prose "
              "tokenization/quality path")
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two regex-derived signals, no UDF: symbol fraction (brackets,
    semicolons, operators per char) and keyword count; either alone can
    fire — code-mixed prose routes to the code path by design (the
    cheaper error). The thresholds are ratio/integer comparisons on
    rounded values, cross-engine stable."""
    raw = spark.createDataFrame(_CODE_ROWS, ["snippet_id", "body"])
    sym_frac = (
        F.length(F.regexp_replace("body", r"[^(){}\[\];=<>]", "")).cast("double")
        / F.length("body")
    )
    kw = F.size(
        F.regexp_extract_all(
            F.lower("body"),
            F.lit(r"\b(def|return|import|for|while|int|select|from|group by|print)\b"),
            0,
        )
    ).cast("long")
    return raw.select(
        "snippet_id",
        F.round(sym_frac, 6).alias("sym_frac"),
        kw.alias("kw_hits"),
        ((sym_frac > 0.05) | (kw >= 2)).alias("is_code"),
    )


# --- tokenizer vocabulary coverage ------------------------------------------
VOCAB_SIZE = 256  # top-K corpus tokens by (freq desc, token asc)

_VOCAB_COVERAGE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents
),
clean AS (SELECT doc_id, lang, tok FROM toks WHERE tok <> ''),
vocab AS (
  SELECT tok FROM (
    SELECT tok, COUNT(*) AS freq FROM clean GROUP BY tok
  ) ORDER BY freq DESC NULLS LAST, tok ASC NULLS FIRST LIMIT {VOCAB_SIZE}
),
per_doc AS (
  SELECT c.doc_id, c.lang,
         COUNT(*) AS n_tokens,
         SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM clean c LEFT JOIN vocab v ON c.tok = v.tok
  GROUP BY c.doc_id, c.lang
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_oov) AS BIGINT) AS total_oov,
       round(SUM(n_oov) / CAST(SUM(n_tokens) AS DOUBLE), 6) AS oov_rate,
       round(AVG(n_oov / CAST(n_tokens AS DOUBLE)), 6) AS mean_doc_oov_rate
FROM per_doc GROUP BY lang
"""


@register("tokenize_vocab_coverage", "X", oracle=_VOCAB_COVERAGE_ORACLE,
          doc=f"Tokenizer vocabulary-coverage audit: top-{VOCAB_SIZE} corpus "
              "tokens as the vocab, per-language token/OOV totals and mean "
              "per-doc OOV rate — the pre-tokenization screen that decides "
              "whether a tokenizer's vocab fits a new corpus slice")
def tokenize_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: token frequencies are one partial+final groupBy (hot
    stopword tokens collapse in the combiner); the vocab is top-K of
    that — tiny by construction — so membership tagging is a broadcast
    left join against the exploded token stream, map-side. Per-doc and
    per-lang rollups are two more uniform-keyed aggregates. The
    (freq desc, token asc) tiebreak makes the vocab total-ordered and
    thus cross-engine deterministic."""
    docs = load(spark, sf_dir, "documents")
    clean = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    vocab = (
        clean.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("tok").asc())
        .limit(VOCAB_SIZE)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    per_doc = (
        clean.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_oov").cast("long").alias("total_oov"),
        F.round(F.sum("n_oov") / F.sum("n_tokens").cast("double"), 6).alias("oov_rate"),
        F.round(F.avg(F.col("n_oov") / F.col("n_tokens").cast("double")), 6).alias("mean_doc_oov_rate"),
    )
