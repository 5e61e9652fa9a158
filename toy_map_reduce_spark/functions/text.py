"""Text column expressions shared by the wordcount / dedup / textstats
families. Tokenizer semantics follow the reference map UDF
(reference ``user/UserDefinedFunctions.scala:12-13``): split on single
spaces, lowercase, strip ASCII non-word characters.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# Java's \w is ASCII-only; the class is spelled out so Spark (Java regex)
# and DuckDB (RE2) agree — SURVEY.md §7.4
NON_WORD_CLASS = "[^0-9a-z_]"


def norm_text(col):
    """Whitespace-collapse + lowercase normalization (dedup family)."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def tokens(col):
    """Split to token array, keeping empty tokens (limit -1)."""
    return F.split(col, " ", -1)
