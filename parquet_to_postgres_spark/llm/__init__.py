"""LLM-data-pipeline operators: dedup, similarity search, text analysis,
multimodal column plumbing, learned data selection (classify), both
standard subword tokenizers (bpe, unigram), and the composed curation
pipelines (pipeline.curate_corpus / curate_increment).

These are the training-data-pipeline capabilities mandated by the north
star (BASELINE.json) on top of the reference's ETL surface.  Everything
is DataFrame-first and designed so the hot path stays JVM-side
(higher-order functions, no row-at-a-time Python); pandas UDFs appear
only at the explicitly-marked Python boundary (multimodal decode, the
L8 UDF-surface demos).
"""
