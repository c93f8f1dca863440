"""Pure-NumPy single-node kernels (no Spark imports).

These implement the reference's extract/match semantics
(/root/reference/src/main/java/be/panako/...) as batched NumPy, and double
as the single-node golden matcher for parity tests (SURVEY.md §5).
"""
