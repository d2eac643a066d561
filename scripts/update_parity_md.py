"""Regenerate PARITY.md's measured accuracy-ledger table from parity rows.

Reads JSON row lines (the output of `python bench.py --parity`) and rewrites
the table between the `<!-- parity:begin -->` / `<!-- parity:end -->`
markers, so the published agreement numbers are always artifact-derived.

Usage: python bench.py --parity > /tmp/parity.txt
       python scripts/update_parity_md.py /tmp/parity.txt
"""

import json
import re
import sys
from pathlib import Path

PARITY = Path(__file__).resolve().parent.parent / "PARITY.md"


def main():
    rows = []
    for path in sys.argv[1:]:
        for ln in Path(path).read_text().splitlines():
            ln = ln.strip()
            if not ln.startswith("{"):
                continue
            try:
                r = json.loads(ln)
            except json.JSONDecodeError:
                continue
            if isinstance(r, dict) and {"model", "quantity", "value"} <= r.keys():
                rows.append(r)
    if not rows:
        sys.exit("no parity rows found in the given files")
    body = "\n".join(
        f"| `{r['model']}` | {r['quantity']} | **{r['value']:.4f}** | "
        f"≥ {r['threshold']} | {'✅' if r['pass'] else '❌ FAIL'} | {r['oracle']} |"
        for r in rows
    )
    table = (
        "| model | quantity | measured | threshold | pass | f64 oracle |\n"
        "|---|---|---|---|---|---|\n" + body
    )
    text = PARITY.read_text()
    new, count = re.subn(
        r"<!-- parity:begin -->.*?<!-- parity:end -->",
        lambda _mo: f"<!-- parity:begin -->\n{table}\n<!-- parity:end -->",
        text,
        flags=re.S,
    )
    if count == 0:
        sys.exit("PARITY.md has no <!-- parity:begin/end --> markers")
    PARITY.write_text(new)
    print(f"PARITY.md: wrote {len(rows)} measured parity rows")


if __name__ == "__main__":
    main()
