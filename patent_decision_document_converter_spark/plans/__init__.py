"""Pipeline registry, mode chains, and Spark job assembly."""
