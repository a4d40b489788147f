from . import asof, dedup, sessionize, topk  # noqa: F401
