"""Large-scale training-data operations (beyond the reference's surface):
deduplication, similarity search, text analysis, multimodal plumbing."""
