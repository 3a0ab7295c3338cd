"""Offline dataset tooling (reference utils/ parity, SURVEY.md L7)."""
