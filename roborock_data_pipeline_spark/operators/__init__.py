"""Operator modules. Each registers its queries via registry.query()."""
