from .registry import REGISTRY, Query, query  # noqa: F401

# Importing the plan modules populates REGISTRY via the @query decorator.
from . import llm, relational, relational2, relational3, ruuvi, timeseries  # noqa: E402, F401
