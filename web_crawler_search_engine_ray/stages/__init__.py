"""map_batches stages composing the pipelines (stateless tasks or actor
pools per SURVEY.md §7.3)."""
