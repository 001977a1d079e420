"""Composite relational operators built from DataFrame primitives."""
