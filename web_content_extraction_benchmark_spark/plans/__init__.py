"""End-to-end DataFrame pipelines (extract -> score -> aggregate)."""
