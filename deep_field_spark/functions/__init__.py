from . import texting, vectors  # noqa: F401
