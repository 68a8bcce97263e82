"""One-shot mechanical rewrite: wrap ``sum(...) [OVER (...)] AS <alias>``
with an outer ``CAST(... AS BIGINT)`` for the offending aliases found by
``tools/oracle_type_scan.py`` (DuckDB widens sum(BIGINT) to HUGEINT; the
driver's fetch renders int128 as float64/Decimal and breaks the hash).

Operates on the query part files in place.  Idempotent: skips sites whose
sum is already wrapped in a CAST ending with AS BIGINT).
"""

from __future__ import annotations

import re
import sys

ALIASES = {
    "sw", "swx", "swxx", "g0", "g1", "cell_n", "cents", "n_tokens",
    "quality_sum_micro", "n_bigrams", "weight_micro", "total_tokens",
    "n_seqs", "waste_tokens", "wins_micro", "revenue_cents",
    "idle_balance_cents", "delta_cents", "day_offset_sum",
    "purchase_cents", "p1_cents", "p2_cents", "p3_cents", "p4_cents",
    "p5_cents", "sum_qty_cents", "sum_base_price_cents",
    "sum_disc_price_cents", "band_cents", "session_id", "sum_value_cents",
    "qty_cents", "part_cents", "high_line_count", "low_line_count",
    "promo_cents", "total_cents", "price_cents", "nation_cents",
    "profit_cents", "totacctbal_cents", "chars", "value_cents",
    "sum_cents", "chunk_checksum", "n_chars", "entropy_nano",
    "logprob_micro",
}

FILES = [
    "panelsplit_spark/queries_data.py",
    "panelsplit_spark/queries_wide.py",
    "panelsplit_spark/queries_dss.py",
    "panelsplit_spark/queries_tpch.py",
    "panelsplit_spark/queries_llm.py",
    "panelsplit_spark/queries_curate.py",
    "panelsplit_spark/queries_nlp.py",
]


def balanced_span(s: str, start: int) -> int:
    """Index just past the matching ')' for the '(' at s[start]."""
    depth = 0
    i = start
    while i < len(s):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced")


SUM_RE = re.compile(r"\bsum\s*\(", re.IGNORECASE)


def rewrite(text: str) -> tuple[str, int]:
    out = []
    pos = 0
    n = 0
    while True:
        m = SUM_RE.search(text, pos)
        if m is None:
            out.append(text[pos:])
            break
        end = balanced_span(text, m.end() - 1)
        # optional OVER (...) clause
        tail = text[end:]
        over = re.match(r"(\s+OVER\s*\()", tail, re.IGNORECASE)
        if over:
            end = balanced_span(text, end + over.end(1) - 1)
            tail = text[end:]
        alias = re.match(r"\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)", tail,
                         re.IGNORECASE)
        if not alias or alias.group(1) not in ALIASES:
            out.append(text[pos:end])
            pos = end
            continue
        # already wrapped?  look back for CAST( immediately before
        before = text[max(0, m.start() - 16):m.start()]
        if re.search(r"CAST\s*\(\s*$", before, re.IGNORECASE):
            out.append(text[pos:end])
            pos = end
            continue
        expr = text[m.start():end]
        out.append(text[pos:m.start()])
        out.append(f"CAST({expr} AS BIGINT)")
        pos = end
        n += 1
    return "".join(out), n


def main() -> int:
    total = 0
    for path in FILES:
        with open(path) as f:
            text = f.read()
        new, n = rewrite(text)
        if n:
            with open(path, "w") as f:
                f.write(new)
        print(f"{path}: {n} sites wrapped")
        total += n
    print(f"total {total}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
