"""Relational operator library: compositions Spark lacks as single
primitives (as-of join, interval join, top-k per group, sessionize)."""
