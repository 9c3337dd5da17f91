"""Relational operators: hash aggregate, hash join, sort, hashing — host
implementations plus TPU device kernels (SURVEY.md §7.2 M4)."""
