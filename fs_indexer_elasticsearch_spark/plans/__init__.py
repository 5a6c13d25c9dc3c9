"""Declared query library: import all query modules to populate the
registry, then expose QUERIES / ORACLES."""

from .registry import ORACLES, QUERIES, query  # noqa: F401

# Import order is load order in the registry; keep stable.
from . import relational  # noqa: E402,F401
from . import relational_ext  # noqa: E402,F401
from . import relational_ext2  # noqa: E402,F401
from . import relational_ext3  # noqa: E402,F401
from . import relational_ext4  # noqa: E402,F401
from . import pipeline_queries  # noqa: E402,F401
from . import window_queries  # noqa: E402,F401
from . import llm_queries  # noqa: E402,F401
from . import misc_queries  # noqa: E402,F401
from . import timejoin_queries  # noqa: E402,F401
from . import sql_surface  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query"]
