from .build import IndexBuilder, load_index  # noqa: F401
