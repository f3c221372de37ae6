"""Cross-wave mutable state: seen-set shard actors, robots cache actors,
and wave checkpoints. These are the only places the engine steps outside
the Dataset API (SURVEY.md §7.3) — a shared mutable URL-seen set and a
single-flight robots cache cannot be expressed as pure batch transforms.
"""
