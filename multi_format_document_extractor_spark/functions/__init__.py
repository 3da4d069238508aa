from . import confidence, normalize, textstats, validate  # noqa: F401
