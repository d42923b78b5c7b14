"""Query/operator library. Each module exposes ``QUERIES`` — a dict
of name → (spark, sf_dir) -> DataFrame — and ``ORACLES`` — a dict of
name → DuckDB SQL string with identical output column names (the
driver's comparator sorts columns by name and value-hashes, so every
computed column is aliased the same on both sides)."""
