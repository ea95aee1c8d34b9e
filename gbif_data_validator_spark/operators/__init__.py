"""Operators: the reference's evaluator/collector algebra as DataFrame
transforms (SURVEY.md §2), plus the training-data-pipeline operators
(dedup, similarity, text analysis, multimodal plumbing)."""
