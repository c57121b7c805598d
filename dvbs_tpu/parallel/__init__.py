"""Device-mesh parallelism: multi-carrier channel banks via shard_map."""
