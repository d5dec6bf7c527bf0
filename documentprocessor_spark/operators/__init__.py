from . import dedup, extract, html_parse, similarity, textstats  # noqa: F401
