from .cleaning import normalize_key, to_int, to_date_key  # noqa: F401
