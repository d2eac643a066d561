"""Regenerate docs/design.md's measured blocks from a bench artifact.

Round-4 verdict (weak-item 5 / next-round item 6): design.md's quoted
disk-stream stage table and ESS numbers drifted from the artifact twice.
This script makes design.md artifact-derived exactly like README.md
(scripts/update_readme_bench.py): it rewrites the marker-delimited blocks

    <!-- diskstream:begin --> ... <!-- diskstream:end -->
    <!-- ess:begin -->        ... <!-- ess:end -->

from the latest bench output / driver BENCH_r*.json. Hard-fails if a marker
block is missing or a needed line cannot be parsed, so drift cannot slip
through silently.

Usage: python scripts/update_design_bench.py BENCH_r05.json   (or raw bench output)
"""

import json
import re
import sys
from pathlib import Path

DESIGN = Path(__file__).resolve().parent.parent / "docs" / "design.md"


def collect_lines(paths):
    lines = []
    for path in paths:
        text = Path(path).read_text()
        try:  # driver artifact: JSON object wrapping the stdout/stderr tail
            obj = json.loads(text)
            if isinstance(obj, dict):
                lines += str(
                    obj.get("output") or obj.get("stdout") or obj.get("tail") or ""
                ).splitlines()
                continue
        except json.JSONDecodeError:
            pass
        lines += text.splitlines()
    return lines


def diskstream_block(lines):
    pat = re.compile(
        r"#\s*diskstream stages: disk\+prefetch-only pass=([\d.]+)s "
        r"\(([^)]*)\); full pipeline=([\d.]+)s"
    )
    hit = None
    for ln in lines:
        m = pat.search(ln)
        if m:
            hit = m  # last occurrence wins (freshest artifact last)
    if hit is None:
        raise SystemExit("update_design_bench: no '# diskstream stages' note found")
    return (
        "| stage | time |\n"
        "|---|---|\n"
        f"| disk + prefetch-only pass (no device work) | {hit.group(1)} s ({hit.group(2)}) |\n"
        f"| full pipeline (h2d + unpack + syrk + CG) | {hit.group(3)} s |"
    )


def ess_block(lines):
    pat = re.compile(
        r"(\w+) Gibbs effect-ESS/s \(n=(\d+), p=(\d+), ([^,]+(?:, [^,]+)*?), "
        r"signal panel h2=0.5; mean effect ESS=(\d+), sigma_e2 ESS=(\d+), "
        r"window=(\d+) post-burnin sweeps\)"
    )
    rows = {}
    for ln in lines:
        ln = ln.strip()
        if not ln.startswith("{"):
            continue
        try:
            m = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if not (isinstance(m, dict) and "metric" in m):
            continue
        g = pat.match(m["metric"])
        if g:
            rows[g.group(1)] = (g, m["value"])
    if not rows:
        raise SystemExit("update_design_bench: no effect-ESS/s metric lines found")
    out = []
    for model, (g, val) in rows.items():
        out.append(
            f"  - {model} ({g.group(4)}), n={g.group(2)} p={g.group(3)}: mean "
            f"effect ESS={g.group(5)}, σ²ₑ ESS={g.group(6)} of {g.group(7)} "
            f"post-burnin sweeps → {val} effect-ESS/s."
        )
    return "\n".join(out)


def replace_block(text, tag, body):
    pat = re.compile(
        rf"(<!-- {tag}:begin -->\n).*?(\n\s*<!-- {tag}:end -->)", re.DOTALL
    )
    new, nsub = pat.subn(lambda m: m.group(1) + body + m.group(2), text)
    if nsub != 1:
        raise SystemExit(
            f"update_design_bench: expected exactly one <!-- {tag}:begin/end --> "
            f"block in {DESIGN}, found {nsub}"
        )
    return new


def main():
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    lines = collect_lines(sys.argv[1:])
    text = DESIGN.read_text()
    text = replace_block(text, "diskstream", diskstream_block(lines))
    text = replace_block(text, "ess", ess_block(lines))
    DESIGN.write_text(text)
    print(f"{DESIGN.name}: diskstream + ess blocks regenerated")


if __name__ == "__main__":
    main()
