from . import (  # noqa: F401
    dedup,
    extract,
    html_parse,
    model_infer,
    multimodal,
    similarity,
    textstats,
    tokenize,
)
