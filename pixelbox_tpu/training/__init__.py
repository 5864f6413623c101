"""Contrastive embedder training (JAX port of the reference recipe)."""
