#!/usr/bin/env python3
"""One-shot codemod (round 14): wrap DuckDB-oracle `round(expr, n) AS x`
sites as `(round(expr, n) + 0.0) AS x` to pin the zero sign (+0.0) to what
Spark's BigDecimal-based round always emits. Scala-side `round(...).as(..)`
sites are left alone (next char after the close paren is `.`). Sites
already followed by `+ 0.0` are skipped (idempotent).

Usage: python3 tools/fix_signed_zero.py [--dry] file.scala ...
"""
import re, sys


def rewrite(text):
    out, i, n, hits = [], 0, len(text), 0
    while i < n:
        m = re.compile(r"\bround\(").search(text, i)
        if not m:
            out.append(text[i:])
            break
        start = m.start()
        # word-boundary guard: \b already ensures prev char non-word
        out.append(text[i:start])
        # balanced-paren scan from the '(' at m.end()-1
        depth, j = 0, m.end() - 1
        while j < n:
            c = text[j]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        call = text[start:j + 1]
        rest = text[j + 1:]
        after = rest.lstrip()
        # SQL final-projection alias => wrap; anything else untouched.
        if re.match(r"(?i)AS\s", after) and not call.endswith("+ 0.0)"):
            out.append("(" + call + " + 0.0)")
            hits += 1
        else:
            out.append(call)
        i = j + 1
    return "".join(out), hits


def main():
    dry = "--dry" in sys.argv
    files = [a for a in sys.argv[1:] if not a.startswith("--")]
    total = 0
    for f in files:
        with open(f) as fh:
            text = fh.read()
        new, hits = rewrite(text)
        total += hits
        if hits:
            print(f"{f}: {hits} sites")
            if not dry:
                with open(f, "w") as fh:
                    fh.write(new)
    print(f"total: {total}")


if __name__ == "__main__":
    main()
