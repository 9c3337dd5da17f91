"""Distributed execution: device mesh, sharded inference, distributed
shuffle. The reference has none of this (SURVEY.md §2.4 absence list); here
it is a first-class subsystem."""

from .mesh import make_mesh, replicated, row_sharding  # noqa: F401
