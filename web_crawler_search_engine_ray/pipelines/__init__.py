"""Driver-side pipeline composition (wave loop, index build, search)."""
