"""Multi-chip scaling over a jax.sharding Mesh."""
