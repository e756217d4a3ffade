"""Multi-chip execution over jax.sharding meshes."""
