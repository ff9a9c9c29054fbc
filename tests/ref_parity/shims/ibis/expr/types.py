"""``ibis.expr.types`` stub: classes used in reference isinstance checks
and type annotations (calculated_columns.py:592, load_data.py:23)."""


class Expr:
    pass


class TableExpr(Expr):
    pass


class Table(Expr):
    pass
