from . import (  # noqa: F401
    dedup,
    extract,
    html_parse,
    imageprep,
    model_infer,
    ocr_kernel,
    multimodal,
    similarity,
    skew,
    textstats,
    tokenize,
    urlnorm,
)
