"""fornax_spark — a from-scratch PySpark-native analytics engine.

Capabilities re-expressed Spark-first from the reference engine
(digicatapult/fornax, read-only at /root/reference): a full-text
inverted-index build + BM25 top-k query engine (the retrieval contract
of fornax's candidate-generation -> weighted-scoring -> deterministic
top-k pipeline, see /root/reference/fornax/api.py:940-1041), plus the
relational / graph / dedup / similarity operators inventoried in
SURVEY.md section 2.

Everything here is built on public knowledge only: the Apache Spark /
PySpark API, the reference repo's observable behavior, and published
papers (NeMa VLDB'13; Block-Max WAND, Ding & Suel SIGIR'11).
"""

__version__ = "0.1.0"

# the reference's handle-style user surface (api.py Connection /
# GraphHandle / QueryHandle), importable as `fornax_spark.GraphHandle`
# the way users import `fornax.GraphHandle`
from .api import (  # noqa: E402,F401
    Connection,
    CorpusHandle,
    GraphHandle,
    InvalidEdgeError,
    InvalidNodeError,
    NullValue,
    QueryHandle,
)
