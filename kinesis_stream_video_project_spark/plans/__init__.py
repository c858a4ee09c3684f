"""Query plan modules. Importing :mod:`.registry` and calling its accessors
loads every query module and populates the registry."""
