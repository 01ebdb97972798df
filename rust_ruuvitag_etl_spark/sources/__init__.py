from .tables import (  # noqa: F401
    TABLES,
    load,
    load_all,
    load_csv,
    load_json,
    register_views,
)
