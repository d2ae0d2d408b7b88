"""Pipeline orchestration: stage graph, checkpoints, lineage metrics."""
