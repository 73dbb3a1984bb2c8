"""SQL front end — parser, binder/planner, session.

The analog of the reference's sql/server (scanner sql_scan.c, yacc grammar
sql_parser.y, semantic analysis rel_select.c/rel_semantic.c, unnesting
rel_unnest.c) reduced to the analytical subset the engine executes:
SELECT with joins, grouping, window basics, subqueries (EXISTS/IN/scalar,
correlated via decorrelation-to-join), set ops, ORDER BY/LIMIT, plus
CREATE TABLE / COPY for ingestion.
"""

try:
    from .session import Session  # noqa: F401
except ImportError:  # session not built yet during bootstrap
    pass
