from . import (  # noqa: F401
    dedup,
    extract,
    html_parse,
    imageprep,
    model_infer,
    multimodal,
    similarity,
    skew,
    textstats,
    tokenize,
)
