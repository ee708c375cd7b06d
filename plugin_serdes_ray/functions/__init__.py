"""Scalar-layer semantics: coercion, schema inference, text transforms,
error policies — the per-cell layer of the reference (SURVEY.md §2.3-2.4)."""

from .errors import BadLineError, OnBadLines  # noqa: F401
