from .registry import QUERIES, Query, query  # noqa: F401
from . import relational, pipeline_semantics, extensions  # noqa: F401  (registration side effects)
