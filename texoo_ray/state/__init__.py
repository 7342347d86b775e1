"""Run state: per-partition lineage manifests and resumable execution."""
