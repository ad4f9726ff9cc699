"""Composite operators: deduplication, similarity search, multimodal plumbing."""
