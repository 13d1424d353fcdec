from .graph import EdgeSet, Graph, GraphSlice, NodeSet  # noqa: F401
from .mapper import build_graph, graph_for              # noqa: F401
from . import ops as _ops                               # noqa: F401
from .delta import transact                             # noqa: F401
from .sync import GraphStore                            # noqa: F401
