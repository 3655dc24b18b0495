"""Multi-chip parallelism: meshes, shard_map schedules, XLA collectives."""
