"""Registered query suite — importing the submodules populates the
registry consumed by __spark_entry__.py and the parity tests."""
