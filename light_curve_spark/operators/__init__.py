"""DataFrame operators: the engine's public query surface.

Each operator is declared against the DataFrame API so Catalyst owns the
physical plan; pandas/Arrow UDF kernels appear only where built-in
expressions cannot express the semantics (SURVEY.md §2)."""
