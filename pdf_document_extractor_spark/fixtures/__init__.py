"""Deterministic seeded fixture corpus (FIXTURES.md) — test inputs only."""

from .gen import gen_unit_corpus, gen_scale_corpus, SEED

__all__ = ["gen_unit_corpus", "gen_scale_corpus", "SEED"]
