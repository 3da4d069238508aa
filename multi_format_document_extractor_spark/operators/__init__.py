from .extract import EXTRACT_DDL, extract_pages  # noqa: F401
