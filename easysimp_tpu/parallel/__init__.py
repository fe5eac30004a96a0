"""Device-mesh sharding for multi-chip SPMD domain decomposition."""
