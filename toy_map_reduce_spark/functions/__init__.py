"""Reusable column-expression builders shared across operators."""

from toy_map_reduce_spark.functions.vector import as_double, dot, l2_norm  # noqa: F401
from toy_map_reduce_spark.functions.text import norm_text, tokens  # noqa: F401
