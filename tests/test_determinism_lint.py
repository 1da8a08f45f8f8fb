"""Mechanical enforcement of the registry's order-independence rule.

A parallel DOUBLE sum's low bits depend on partition merge order, so any
`round(sum(<float>), d)` / `round(avg(<float>), d)` that reaches a result
column or comparison is a latent cross-run / cross-engine hash flip (the
round-4 ml_temperature_mix ±1 incident). The fix is always the same:
quantize each row to an exact integer BEFORE the sum (cents, 1e-4 units
for grid products, 1e-9 for per-row ratios), divide once after — see
onebrc_spark/registry.py's registration rules.

This test greps the source for the banned shapes and pins the surviving
sites to an explicit allowlist of justified exceptions. Adding a new
`round(sum(...))` over floats fails here with a pointer to the rule,
instead of failing as a mysterious driver hash mismatch months later.
"""

from __future__ import annotations

import re
from pathlib import Path

SRC = Path(__file__).resolve().parent.parent / "onebrc_spark"

# Lines carrying a float-sum-then-round shape. Lines that quantize to
# BIGINT/long first, sum integral columns (l_quantity, n_chars, seq_chars,
# counts), or are prose (comments/docstrings) are filtered below.
_BANNED = re.compile(r"round\(\s*sum\(|round\(\s*avg\(|F\.round\(\s*F\.(sum|avg)\(")
_EXEMPT_ON_LINE = re.compile(
    r"AS BIGINT|cast\(\"long\"\)|l_quantity|n_chars|seq_chars|sum_vc|count\(|cents"
)

# (filename, substring) pairs for the justified exceptions. Each is argued
# at its site:
#  - sql_udf_declared sum_sig: transcendental per-row values (sigmoid) have
#    no grid; magnitude ≤ 1 over ~1e3 rows puts summation-order noise
#    ~1e-13 against 4-dp boundaries 5e-5 apart.
#  - sim_label_centroid: off-grid float embedding components; noise ~1e-14.
ALLOWLIST = {
    ("sqlsurface.py", "1.0 / (1.0 + exp(-(value / 100.0))"),
    ("sqlsurface.py", "sigmoid_scaled(value)"),
    ("similarity.py", "embedding[1]"),
    ("similarity.py", "embedding[2]"),
    ("similarity.py", 'F.element_at("embedding", 1)'),
    ("similarity.py", 'F.element_at("embedding", 2)'),
    # `ok` is a bigint-cents column (try_cast from the parsed line), so the
    # sum is exact; only the final single division is float.
    ("onebrc.py", "F.sum(ok)"),
}

# registry.py is the rulebook itself — its docstring quotes the banned
# shapes as prose.
_SKIP_FILES = {"registry.py"}


def _is_prose(line: str) -> bool:
    stripped = line.lstrip()
    return stripped.startswith("#") or stripped.startswith("`")


def test_no_unquantized_float_aggregate_roundings():
    violations = []
    for path in sorted(SRC.rglob("*.py")):
        if path.name in _SKIP_FILES:
            continue
        in_doc = False
        for lineno, line in enumerate(path.read_text().splitlines(), 1):
            # crude docstring tracker: flip on lines with an odd number of
            # triple quotes (oracle SQL lives in regular strings, which we
            # DO want to scan, so only skip comments and doc prose)
            if line.count('"""') % 2 == 1:
                in_doc = not in_doc
                continue
            if in_doc and "sum(" not in line.lower():
                continue
            if not _BANNED.search(line):
                continue
            if _EXEMPT_ON_LINE.search(line) or _is_prose(line):
                continue
            if any(
                path.name == fn and frag in line for fn, frag in ALLOWLIST
            ):
                continue
            violations.append(f"{path.relative_to(SRC.parent)}:{lineno}: {line.strip()}")
    assert not violations, (
        "float SUM/AVG rounded into a result — quantize per-row to exact "
        "integers before the sum (registry.py rules), or add a justified "
        "ALLOWLIST entry:\n" + "\n".join(violations)
    )
