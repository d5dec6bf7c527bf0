from . import bucketed, readers, synthetic, tables, warc  # noqa: F401
