"""Synthetic load-profile corpora (no real corpus ships in this environment)."""

from dctpu.corpus.synth import synth_corpus, synth_stream  # noqa: F401
