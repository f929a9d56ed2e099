"""Expression compiler: cubes expression strings → ``pyspark.sql.Column``.

Parity: /root/reference/cubes/sql/expressions.py (SQLExpressionCompiler
157-225; function tables 25-60).  The reference compiles via the
external ``expressions`` package into SQLAlchemy; we parse with the
stdlib ``ast`` module and emit Column expressions, so the whole
expression tree stays inside Catalyst/whole-stage codegen — no Python
UDF in the hot path.

Grammar differences handled: the cubes grammar uses ``=`` for equality
and ``and``/``or``/``not`` keywords; we normalize ``=`` → ``==`` before
parsing (Python's ``and``/``or``/``not`` parse natively).
"""

from __future__ import annotations

import ast
import re
from typing import Any, Callable, Dict, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from cubes_spark.errors import ExpressionError

__all__ = ["SparkExpressionCompiler", "compile_expression", "FUNCTIONS"]

# ``a = b`` → ``a == b`` (but keep ``<=``, ``>=``, ``==``, ``!=``)
_EQ_NORMALIZE = re.compile(r"(?<![<>=!])=(?!=)")
#: the reference grammar's if(cond, a, b) — `if` is a Python keyword,
#: so rewrite the call name before ast parsing (iif is registered as
#: the same function)
_IF_NORMALIZE = re.compile(r"\bif\s*\(")

#: a quoted string literal (either quote style, backslash escapes)
_STRING_LITERAL = re.compile(r"'(?:\\.|[^'\\])*'|\"(?:\\.|[^\"\\])*\"")


def _normalize_outside_strings(expression: str) -> str:
    """Apply the `=`→`==` and `if(`→`iif(` rewrites only OUTSIDE
    string literals — a naive whole-text sub would corrupt literal
    values like ``replace(code, 'a=b', 'x')`` or ``'if(x)'``."""
    out = []
    last = 0
    for m in _STRING_LITERAL.finditer(expression):
        chunk = expression[last:m.start()]
        chunk = _EQ_NORMALIZE.sub("==", chunk)
        chunk = _IF_NORMALIZE.sub("iif(", chunk)
        out.append(chunk)
        out.append(m.group(0))
        last = m.end()
    tail = expression[last:]
    tail = _EQ_NORMALIZE.sub("==", tail)
    tail = _IF_NORMALIZE.sub("iif(", tail)
    out.append(tail)
    return "".join(out)


def _fn_left(col: Column, n: Column) -> Column:
    return F.substring(col, 1, n)


def _fn_right(col: Column, n: Column) -> Column:
    # substring from length-n+1; F.substring needs int positions, use expr-free form
    return F.substring(col, -n, n)


def _fn_if(cond: Column, a: Column, b: Column) -> Column:
    return F.when(cond, a).otherwise(b)


def _fn_case(*args: Column) -> Column:
    """``case(cond1, val1, cond2, val2, ..., [else_val])`` — searched
    CASE in call form (parity: the reference's ``case`` pass-through to
    SQLAlchemy ``sql.case``, /root/reference/cubes/sql/expressions.py:46,154).
    An odd trailing argument is the ELSE value; without it the result
    is NULL when no condition matches, like SQL CASE."""
    if len(args) < 2:
        raise ExpressionError(
            "case() needs at least a condition and a value")
    pairs, else_value = args, None
    if len(args) % 2 == 1:
        pairs, else_value = args[:-1], args[-1]
    result = F.when(pairs[0], pairs[1])
    for i in range(2, len(pairs), 2):
        result = result.when(pairs[i], pairs[i + 1])
    if else_value is not None:
        result = result.otherwise(else_value)
    return result


def _fn_extract(part: Any, col: Column) -> Column:
    return datepart(str(part), col)


def datepart(part: str, col: Column) -> Column:
    """Date-part extraction (parity: cubes mapping ``extract`` key,
    /root/reference/cubes/sql/query.py:582-583)."""
    part = part.lower()
    parts: Dict[str, Callable[[Column], Column]] = {
        "year": F.year,
        "month": F.month,
        "day": F.dayofmonth,
        "hour": F.hour,
        "minute": F.minute,
        "second": F.second,
        "week": F.weekofyear,
        "quarter": F.quarter,
        "dow": F.dayofweek,
        "doy": F.dayofyear,
    }
    try:
        return parts[part](col)
    except KeyError:
        raise ExpressionError(f"Unknown date part '{part}'")


#: Scalar function registry (parity: sql/expressions.py:25-60).
#: Values are callables Column... -> Column. Users may register more.
FUNCTIONS: Dict[str, Callable[..., Column]] = {
    # string
    "lower": F.lower,
    "upper": F.upper,
    "left": _fn_left,
    "right": _fn_right,
    "substr": lambda col, pos, length=None: (
        F.substring(col, pos, length) if length is not None
        else F.substring(col, pos, 2147483647)
    ),
    "lpad": F.lpad,
    "rpad": F.rpad,
    "replace": F.replace,
    "concat": F.concat,
    "repeat": F.repeat,
    # F.locate demands a Python-str substring; call_function routes
    # through SQL locate, which takes arbitrary expressions
    "position": lambda sub, string: F.call_function(
        "locate", sub, string),
    "length": F.length,
    "trim": F.trim,
    # math
    "round": F.round,
    # trunc is registered after its helper below
    "floor": F.floor,
    "ceil": F.ceil,
    # SQL MOD sign follows the dividend (the reference compiles to the
    # database's MOD) — pmod would return 2 for mod(-7, 3) instead of
    # the reference's -1
    "mod": lambda a, b: a % b,
    "remainder": lambda a, b: a % b,
    "sign": F.signum,
    "min": F.least,
    "max": F.greatest,
    "pow": F.pow,
    "exp": F.exp,
    "log": F.log,
    "log10": F.log10,
    "sqrt": F.sqrt,
    "cos": F.cos,
    "sin": F.sin,
    "tan": F.tan,
    "abs": F.abs,
    # date
    "extract": _fn_extract,
    # conditionals
    "coalesce": F.coalesce,
    "nullif": F.nullif,
    "if": _fn_if,
    "iif": _fn_if,
    "case": _fn_case,
}


def _fn_trunc(col: Column, scale: Any = None) -> Column:
    """TRUNC towards zero; optional decimal scale."""
    if scale is None:
        return F.when(col >= 0, F.floor(col)).otherwise(F.ceil(col))
    factor = F.lit(10.0) ** F.lit(scale)
    scaled = col * factor
    return (
        F.when(scaled >= 0, F.floor(scaled)).otherwise(F.ceil(scaled)) / factor
    )


FUNCTIONS["trunc"] = _fn_trunc

#: Variables (parity: sql/expressions.py:58-60,89-107)
VARIABLES: Dict[str, Callable[[], Column]] = {
    "current_date": F.current_date,
    "current_time": F.current_timestamp,
    "local_date": F.current_date,
    "local_time": F.current_timestamp,
}

_BINOP: Dict[type, Callable[[Column, Column], Column]] = {
    ast.Add: lambda a, b: a + b,
    ast.Sub: lambda a, b: a - b,
    ast.Mult: lambda a, b: a * b,
    ast.Div: lambda a, b: a / b,
    ast.Mod: lambda a, b: a % b,
    ast.Pow: lambda a, b: F.pow(a, b),
    ast.BitAnd: lambda a, b: a & b,
    ast.BitOr: lambda a, b: a | b,
    ast.FloorDiv: lambda a, b: F.floor(a / b),
}

_CMPOP: Dict[type, Callable[[Column, Column], Column]] = {
    ast.Eq: lambda a, b: a == b,
    ast.NotEq: lambda a, b: a != b,
    ast.Lt: lambda a, b: a < b,
    ast.LtE: lambda a, b: a <= b,
    ast.Gt: lambda a, b: a > b,
    ast.GtE: lambda a, b: a >= b,
    ast.In: lambda a, b: a.isin(b) if isinstance(b, list) else a.isin(*[b]),
    ast.Is: lambda a, b: a.isNull() if b is None else a.eqNullSafe(b),
}


class SparkExpressionCompiler:
    """Compile an expression string into a Column within a context of
    already-compiled attribute Columns (parity: SQLExpressionCompiler,
    sql/expressions.py:157-225)."""

    def __init__(
        self,
        context: Optional[Dict[str, Column]] = None,
        parameters: Optional[Dict[str, Any]] = None,
        functions: Optional[Dict[str, Callable[..., Column]]] = None,
    ) -> None:
        #: ref → Column of previously compiled attributes
        self.context = context if context is not None else {}
        #: query parameters substituted as literals
        self.parameters = parameters or {}
        self.functions = dict(FUNCTIONS)
        if functions:
            self.functions.update(functions)

    def compile(self, expression: str) -> Column:
        normalized = _normalize_outside_strings(expression)
        try:
            tree = ast.parse(normalized, mode="eval")
        except SyntaxError as e:
            raise ExpressionError(
                f"Invalid expression '{expression}': {e}"
            ) from e
        return self._compile(tree.body)

    # -- visitors -----------------------------------------------------

    def _compile(self, node: ast.AST) -> Any:
        method = getattr(self, f"_compile_{type(node).__name__}", None)
        if method is None:
            raise ExpressionError(
                f"Unsupported expression construct: {type(node).__name__}"
            )
        return method(node)

    def _lookup(self, name: str) -> Any:
        if name in self.context:
            return self.context[name]
        lowered = name.lower()
        if lowered in VARIABLES:
            return VARIABLES[lowered]()
        if lowered == "null":
            return F.lit(None)
        if lowered == "true":
            return F.lit(True)
        if lowered == "false":
            return F.lit(False)
        if name in self.parameters:
            return F.lit(self.parameters[name])
        raise ExpressionError(f"Unknown attribute or variable '{name}'")

    def _compile_Name(self, node: ast.Name) -> Any:
        return self._lookup(node.id)

    def _compile_Attribute(self, node: ast.Attribute) -> Any:
        # dotted reference like date.year → context lookup "date.year"
        parts = []
        cur: ast.AST = node
        while isinstance(cur, ast.Attribute):
            parts.append(cur.attr)
            cur = cur.value
        if isinstance(cur, ast.Name):
            parts.append(cur.id)
            ref = ".".join(reversed(parts))
            return self._lookup(ref)
        raise ExpressionError("Unsupported attribute expression")

    def _compile_Constant(self, node: ast.Constant) -> Any:
        if node.value is None:
            return F.lit(None)
        return F.lit(node.value)

    def _compile_BinOp(self, node: ast.BinOp) -> Any:
        op = _BINOP.get(type(node.op))
        if op is None:
            raise ExpressionError(
                f"Unsupported operator {type(node.op).__name__}"
            )
        return op(self._compile(node.left), self._compile(node.right))

    def _compile_BoolOp(self, node: ast.BoolOp) -> Any:
        values = [self._ensure_col(self._compile(v)) for v in node.values]
        result = values[0]
        for value in values[1:]:
            if isinstance(node.op, ast.And):
                result = result & value
            else:
                result = result | value
        return result

    def _compile_UnaryOp(self, node: ast.UnaryOp) -> Any:
        operand = self._compile(node.operand)
        if isinstance(node.op, ast.USub):
            return -operand
        if isinstance(node.op, ast.UAdd):
            return operand
        if isinstance(node.op, (ast.Not, ast.Invert)):
            return ~self._ensure_col(operand)
        raise ExpressionError(
            f"Unsupported unary operator {type(node.op).__name__}"
        )

    def _compile_Compare(self, node: ast.Compare) -> Any:
        left = self._compile(node.left)
        result = None
        for op, comparator in zip(node.ops, node.comparators):
            right = self._compile(comparator)
            fn = _CMPOP.get(type(op))
            if fn is None:
                raise ExpressionError(
                    f"Unsupported comparison {type(op).__name__}"
                )
            cond = fn(left, right)
            result = cond if result is None else (result & cond)
            left = right
        return result

    def _compile_Call(self, node: ast.Call) -> Any:
        if isinstance(node.func, ast.Name):
            fname = node.func.id.lower()
        else:
            raise ExpressionError("Unsupported function reference")
        fn = self.functions.get(fname)
        if fn is None:
            raise ExpressionError(f"Unknown function '{fname}'")
        args = [self._compile(arg) for arg in node.args]
        # `extract('year', col)` gets the part as a plain string
        if fname == "extract" and node.args:
            first = node.args[0]
            if isinstance(first, ast.Constant):
                args[0] = first.value
        return fn(*args)

    def _compile_List(self, node: ast.List) -> Any:
        return [self._compile(el) for el in node.elts]

    def _compile_Tuple(self, node: ast.Tuple) -> Any:
        return [self._compile(el) for el in node.elts]

    @staticmethod
    def _ensure_col(value: Any) -> Column:
        if isinstance(value, Column):
            return value
        return F.lit(value)


def compile_expression(
    expression: str,
    context: Optional[Dict[str, Column]] = None,
    parameters: Optional[Dict[str, Any]] = None,
) -> Column:
    """Convenience one-shot expression compilation."""
    return SparkExpressionCompiler(context, parameters).compile(expression)
