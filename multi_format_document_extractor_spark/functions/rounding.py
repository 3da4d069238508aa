"""Engine-portable rounding contract.

``round(x, n)`` disagrees between engines on halfway doubles: Spark rounds
the double's shortest decimal representation HALF_UP (BigDecimal.valueOf),
DuckDB rounds the binary value — e.g. round(4605.615, 2) → 4605.62 (Spark)
vs 4605.61 (DuckDB), because 4605.615 is stored as 4605.61499…

The engine therefore defines rounding as ``floor(x·10ⁿ + 0.5) / 10ⁿ`` on
BOTH sides: the identical sequence of exactly-rounded IEEE ops (multiply,
add, floor, divide) yields bit-identical results in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rnd(col: Column | str, n: int) -> Column:
    """Spark side of the rounding contract."""
    if isinstance(col, str):
        col = F.col(col)
    s = float(10**n)
    return F.floor(col * s + 0.5) / s


def rnd_sql(expr: str, n: int) -> str:
    """SQL side of the rounding contract (DuckDB and ANSI engines)."""
    s = float(10**n)
    return f"floor(({expr}) * {s} + 0.5) / {s}"


def portable_rounds(sql: str) -> str:
    """Rewrite every ``round(expr, n)`` in a SQL string to the floor form
    (recursively, paren-aware) so oracle SQL authored with readable round()
    calls follows the same contract as the Spark side."""
    out: list[str] = []
    i = 0
    while True:
        j = sql.find("round(", i)
        while j > 0 and (sql[j - 1].isalnum() or sql[j - 1] == "_"):
            j = sql.find("round(", j + 1)
        if j < 0:
            out.append(sql[i:])
            return "".join(out)
        out.append(sql[i:j])
        depth = 0
        k = j + len("round(")
        start = k
        last_comma = -1
        while True:
            ch = sql[k]
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    break
                depth -= 1
            elif ch == "," and depth == 0:
                last_comma = k
            elif ch == "'":
                k = sql.index("'", k + 1)
            k += 1
        assert last_comma > 0, f"round() without scale near: {sql[j : j + 80]}"
        expr = portable_rounds(sql[start:last_comma].strip())
        n = int(sql[last_comma + 1 : k].strip())
        out.append(rnd_sql(expr, n))
        i = k + 1
