"""Unsupervised trainers for the three model stages (the reference's L2+L4)."""
