from .registry import REGISTRY, Query, query  # noqa: F401

# Importing the plan modules populates REGISTRY via the @query decorator.
from . import (  # noqa: E402, F401
    llm,
    llm2,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    ruuvi,
    streaming_batchck,
    timeseries,
)
