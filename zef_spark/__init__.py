"""zef_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the zefhub/zef reference (see
SURVEY.md), re-expressed Spark-first: lazy op chains compile to single
Catalyst-optimized DataFrame plans; the versioned graph is bitemporal
columnar tables; streams are Structured Streaming.
"""

from .session import get_spark                      # noqa: F401
from .tokens import AET, ET, RT                     # noqa: F401
from . import vt                                    # noqa: F401
from .graph import (Graph, GraphSlice, NodeSet,     # noqa: F401
                    build_graph, graph_for, transact)
from . import ops                                   # noqa: F401
from .units import (QuantityFloat, QuantityInt,     # noqa: F401
                    units)

__version__ = "0.1.0"
