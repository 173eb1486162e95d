"""DataFrame-level operators: validation, dedupe, similarity, text
analysis, multimodal plumbing."""
