"""Multi-device sharding: meshes, shard_map pipelines, halo exchange."""
