"""Docs stay honest: README's measured-benchmark table must be populated.

Round-3 regression: the table between the ``bench:begin/end`` markers was
empty because the updater script silently no-op'd (ADVICE r03, medium).
This guard fails the suite whenever the block is empty or the rows stop
looking like artifact-derived table rows, so the repo can never again ship
with zero measured numbers.
"""

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_readme_bench_table_populated():
    text = (REPO / "README.md").read_text()
    m = re.search(r"<!-- bench:begin -->(.*?)<!-- bench:end -->", text, re.S)
    assert m, "README.md lost its bench:begin/end markers"
    body = m.group(1).strip()
    assert body, "README bench table is EMPTY — run scripts/update_readme_bench.py"
    rows = [ln for ln in body.splitlines() if ln.startswith("|") and "**" in ln]
    assert len(rows) >= 4, f"README bench table has only {len(rows)} measured rows"


def test_readme_has_no_hand_written_numbers_outside_block():
    # Throughput claims belong in the artifact-derived block (or docs/design.md
    # where they carry their own provenance), not hand-typed into README prose.
    text = (REPO / "README.md").read_text()
    outside = re.sub(r"<!-- bench:begin -->.*?<!-- bench:end -->", "", text, flags=re.S)
    hits = re.findall(r"\b\d+(?:\.\d+)?\s*GSNP/s", outside)
    # the capability table cites two measured kernel rates with design context;
    # anything beyond that is drift.
    assert len(hits) <= 2, f"hand-written GSNP/s claims outside bench block: {hits}"


def test_parity_ledger_table_populated():
    text = (REPO / "PARITY.md").read_text()
    m = re.search(r"<!-- parity:begin -->(.*?)<!-- parity:end -->", text, re.S)
    assert m, "PARITY.md lost its parity:begin/end markers"
    rows = [ln for ln in m.group(1).splitlines() if ln.startswith("| `")]
    assert len(rows) >= 8, f"parity ledger has only {len(rows)} measured rows"
    assert "FAIL" not in m.group(1), "PARITY.md publishes a failing parity row"


def test_parity_quick_rows_pass():
    """The closed-form half of the --parity ledger, run live (the sampler
    and REML rows are covered by test_parity_oracles.py)."""
    from genomicbreedingmodels_tpu.parity import run_parity_ledger

    rows = run_parity_ledger(emit=lambda s: None, quick=True)
    assert len(rows) >= 5
    assert all(r["pass"] for r in rows), [r for r in rows if not r["pass"]]
