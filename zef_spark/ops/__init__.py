"""Public op namespace: ``from zef_spark.ops import filter, map, sort``
or ``from zef_spark import ops as z`` then ``z.filter[...]``.

Op objects are created lazily from the registry (PEP 562), so ops
registered later (graph/pipeline modules) appear automatically.
"""

from . import local_ops as _local_ops  # noqa: F401  (registers)
from . import df_ops as _df_ops        # noqa: F401  (registers)
from . import scalar_ops as _scalar_ops  # noqa: F401  (registers)
from . import plumbing as _plumbing      # noqa: F401  (registers)
from . import completion as _completion  # noqa: F401  (registers)
from . import reflection as _reflection  # noqa: F401  (registers)
from . import registry_completion as _registry_completion  # noqa: F401
from .plumbing import (absorbed, func, peel, to_pipeline,  # noqa: F401
                       without_absorbed)
from .zef_functions import (GraphBox, func_versions,  # noqa: F401
                            load_func, store_func, zef_fn)
from .core import (LazyValue, OP_REGISTRY, ROW, ZefOp,  # noqa: F401
                   register_op)

# ensure graph + pipeline + streaming op registrations load with the
# namespace (pipeline's __init__ is lazy since r13 — load_all() forces
# the submodule imports that carry @register_op side effects)
from .. import graph as _graph         # noqa: F401
from ..pipeline import load_all as _pipeline_load_all
_pipeline_load_all()
from .. import streaming as _streaming  # noqa: F401,E402


def __getattr__(name: str) -> ZefOp:
    if name in OP_REGISTRY:
        return ZefOp(((name, ()),))
    raise AttributeError(f"no such op: {name}")


def __dir__():
    return sorted(OP_REGISTRY)
