"""Device-mesh sharding of block synthesis (time-block × channel axes)."""
