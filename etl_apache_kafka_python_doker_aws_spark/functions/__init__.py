"""Function library: text analysis, deduplication, similarity search,
multimodal column handling — the LLM-data-pipeline surface (SURVEY.md §2.11).
"""
