"""Data layer: Kaldi data-dir tooling and the corpus data factory
(reference SURVEY.md L6)."""
