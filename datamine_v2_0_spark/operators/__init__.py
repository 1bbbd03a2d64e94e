"""Generic operator library — one tested wrapper per SURVEY.md §2 row.

Every operator is expressed with built-in DataFrame/Column primitives so
Catalyst keeps pushdown/pruning/codegen; pandas UDFs appear only where
Spark lacks the semantics (PELT, Savitzky-Golay, point-in-polygon).
"""
