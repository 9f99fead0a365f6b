"""Reference-compat shims for ``siuba.experimental`` imports."""
