"""Monocular depth models (JAX/Flax ViT + DPT)."""
