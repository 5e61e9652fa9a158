"""toy_map_reduce_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``nperez-dom/toy-map-reduce`` (a toy distributed MapReduce runtime whose one
query is word count — see ``/root/reference``), generalized into a full
DataFrame/SQL operator set plus LLM-data-pipeline operators (dedup,
similarity search, multimodal columns, text analysis), designed for
100 TB-scale execution on Spark.

The reference's control plane (master/worker scheduling, shuffle files,
heartbeats — reference ``master/processor/MasterProcessorLiveImpl.scala``,
``worker/services/WorkerServiceImpl.scala``) is subsumed wholesale by
Spark's runtime; this package contains only the *data plane*: declarative
query builders registered in :mod:`toy_map_reduce_spark.registry`.
"""

from toy_map_reduce_spark.session import get_spark  # noqa: F401
from toy_map_reduce_spark.registry import all_specs, get_spec  # noqa: F401

__version__ = "0.1.0"
