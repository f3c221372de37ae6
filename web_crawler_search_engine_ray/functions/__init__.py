"""Pure, batch-oriented kernels shared by the pipeline stages.

Everything in this package is deterministic, Ray-free and importable from
workers; stages call these on numpy object arrays / Arrow columns inside
``map_batches``.
"""
