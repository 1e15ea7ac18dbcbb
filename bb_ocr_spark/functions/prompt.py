"""Deterministic prompt/context builder (U6).

Reference: create_enhanced_prompt (enhanced_extractor.py:563-586) — a fixed
template plus per-page "Page {i+1} OCR Text:" blocks assembled in page
order, with the per-span length cap applied (P3). The model call itself
(U7) is out of scope (non-deterministic); this stage produces the exact
context string a pluggable model stage would consume.

Pure expressions over the EXTRACTED span array — aggregate + format_string,
zero Python, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import config

DEFAULT_TEMPLATE = (
    "Extract structured metadata from the following document text.\n"
    "Return a single JSON object.\n\n{context}"
)


def page_blocks_col(extracted: Column) -> Column:
    """'Page {i} OCR Text:\\n{text}' blocks, in sequence order, text spans
    only, length-capped like the reference prompt context."""
    texts = F.filter(
        extracted,
        lambda s: (s["kind"] == "text")
        & (F.length(s["text"]) <= config.MAX_CONTEXT_CHARS_PER_SPAN),
    )
    return F.array_join(
        F.transform(
            texts,
            lambda s, i: F.format_string(
                "Page %d OCR Text:\n%s", i + F.lit(1), s["text"]
            ),
        ),
        "\n\n",
    )


def prompt_col(extracted: Column, template: str = DEFAULT_TEMPLATE) -> Column:
    head, _, tail = template.partition("{context}")
    return F.concat(F.lit(head), page_blocks_col(extracted), F.lit(tail))
