"""Distributed operators: stats, sampling, encoding, and the LLM-data
pipeline extensions (dedup / similarity / text / multimodal)."""
