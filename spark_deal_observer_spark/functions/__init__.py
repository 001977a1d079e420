"""Column-expression function libraries (the engine's scalar-function surface)."""
