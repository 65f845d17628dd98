"""Relational operator compositions Spark lacks as single calls — built from
DataFrame primitives so Catalyst still owns the physical plan."""

from .asof import asof_join

__all__ = ["asof_join"]
