"""Canonical tokenizer / packing literals shared by ``queries/`` and
``operators/``.

These used to live in ``queries/text.py`` with ``operators/`` re-declaring
literal twins (pinned only by streamed==batch differential tests — a
test-time coupling, the ``_LANG_MARKERS`` lesson). ``operators/`` must not
import ``queries/`` (layering: queries import operators, never the
reverse), so the single source of truth sits below both layers here.
``queries/text.py`` re-exports them unchanged for its existing importers.

Reference: no counterpart (the reference has no tokenizer; these belong to
the LLM-pipeline extension, SURVEY.md §7.6).
"""

from __future__ import annotations

# the whitespace/punct-free word tokenizer every text query shares
TOKEN_RE = "[a-z0-9]+"

# tokens per training context window (packing / chunk manifests)
CTX_LEN = 512
