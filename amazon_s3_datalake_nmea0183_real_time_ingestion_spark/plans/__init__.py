"""Query library — every SURVEY.md §2 engine op key, Spark impl + oracle SQL."""

from .registry import REGISTRY, Query, register  # noqa: F401

# Importing the modules populates REGISTRY.
from . import tierb  # noqa: F401,E402
from . import tiera  # noqa: F401,E402
from . import tierc  # noqa: F401,E402
