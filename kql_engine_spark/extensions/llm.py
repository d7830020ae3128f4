"""LLM-data-pipeline `evaluate` plugins (SURVEY.md §2.12) — placeholder;
implementations land with the M9 milestone this round."""

from __future__ import annotations
