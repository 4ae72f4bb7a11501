"""Cross-engine stable rounding.

Spark's round() applies HALF_UP to the shortest decimal representation
of a double (via BigDecimal); DuckDB rounds the binary double C-style.
They disagree exactly when a value sits on a rounding tie (e.g. the
average of eight 2-decimal values is often an exact .xxxx5). A +1e-9
nudge — applied identically on both engines — pushes every such value
off the boundary to the same side, while being far larger than any
cross-engine floating-point summation-order difference (~1e-12
relative) and far smaller than any legitimate gap between distinct
rounded outputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EPS = 1e-9


def rnd(col: Column | str, scale: int) -> Column:
    """Tie-stable round: round(col + 1e-9, scale)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c + F.lit(EPS), scale)


def nudge_rounds_sql(sql: str) -> str:
    """Rewrite every 2-arg round(expr, n) in an oracle SQL string to
    round((expr) + 1e-9, n) so DuckDB applies the same nudge."""
    out: list[str] = []
    i = 0
    low = sql.lower()
    while True:
        j = low.find("round(", i)
        if j == -1:
            out.append(sql[i:])
            break
        if j > 0 and (sql[j - 1].isalnum() or sql[j - 1] == "_"):
            out.append(sql[i : j + 6])
            i = j + 6
            continue
        k = j + 5  # index of '('
        depth = 0
        top_commas: list[int] = []
        k2 = k
        while k2 < len(sql):
            c = sql[k2]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            elif c == "," and depth == 1:
                top_commas.append(k2)
            k2 += 1
        inner_start = k + 1
        out.append(sql[i:j])
        if len(top_commas) == 1:
            a1 = sql[inner_start : top_commas[0]]
            a2 = sql[top_commas[0] + 1 : k2]
            # The trailing `+ 0.0` normalizes IEEE signed zero: DuckDB
            # rounds C-style (x*10^n, std::round, /10^n), so a tiny
            # negative like -3e-5 rounds to -0.0, while Spark's
            # BigDecimal-based round can only ever produce +0.0. The
            # values compare equal but their reprs (and hence the
            # driver's value hash) differ — the r7/r8
            # q_quality_classifier red. (-0.0) + (+0.0) is +0.0 in
            # round-to-nearest, and x + 0.0 == x for every other
            # value, so this is a no-op except on the mismatch case.
            # Type-safe: the nudge's `+ 1e-9` already makes the round
            # input DOUBLE, so `+ 0.0` never demotes a DECIMAL.
            out.append(f"(round(({nudge_rounds_sql(a1)}) + 1e-9,{a2}) + 0.0)")
        else:
            out.append(f"round({nudge_rounds_sql(sql[inner_start:k2])})")
        i = k2 + 1
    return "".join(out)
