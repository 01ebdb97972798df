from . import ruuvi, text, vectors  # noqa: F401
