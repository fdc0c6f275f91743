"""Multi-chip sharding tier (pjit / shard_map over a device mesh).

This is new TPU-native capability — the reference is single-device; see
``SURVEY.md`` §5 for the design plan.
"""

__all__: list[str] = []
