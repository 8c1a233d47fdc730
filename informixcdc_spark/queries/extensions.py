"""Extension operators: dedup / similarity / text / multimodal (M5)."""
