from .tables import load_table, register_views  # noqa: F401
