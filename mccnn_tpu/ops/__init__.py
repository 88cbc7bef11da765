"""Optimized TPU ops (Pallas kernels) with jnp reference fallbacks."""
