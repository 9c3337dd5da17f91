"""Test/bench harnesses: sqllogictest runner + the 5 BASELINE benchmark
configs."""

from .sqllogic import SqlLogicRunner  # noqa: F401
