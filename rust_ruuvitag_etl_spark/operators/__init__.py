from . import dedup, ruuvi_pipeline, similarity  # noqa: F401
