"""Lint: query builders must stay distributed — no driver-side .collect().

A .collect() inside a plans/ or pipeline/ builder materializes an unbounded
intermediate on the driver, which breaks at cluster scale (reference parity:
hyrise operators never materialize through the client either). The
sanctioned exceptions are single-bounded-row trainer-loop reads: the
connected-components fixpoint in dedup.py (one aggregate scalar per
iteration, convergence test), the BPE merge argmax in text.py (one
limit(1) row per merge — the chosen pair must become a literal in the
next rewrite expression, an inherently driver-side decision), and
lsh_band_bloom_positions (NOT a registered builder: a stream-setup
helper that collects the <= 4032 distinct Bloom bit positions — the
bounded filter artifact a gate broadcasts, same contract as
bloom_gated_stream's prev_bits).
"""
from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "hyrise_spark"

# file -> substrings of lines allowed to contain ".collect("
ALLOWED = {
    "pipeline/dedup.py": ['F.sum("label")', "int(r.bit) for r in bits.collect()"],
    "pipeline/text.py": [".limit(1)"],
}

# F.collect_set / F.collect_list are aggregate functions, not actions.
AGG_FN = re.compile(r"\bF\.collect_(set|list)\(")
COLLECT = re.compile(r"\.collect\(")


def test_no_driver_collect_in_builders():
    offenders = []
    for sub in ("plans", "pipeline"):
        for path in sorted((PKG / sub).glob("*.py")):
            rel = f"{sub}/{path.name}"
            for lineno, line in enumerate(path.read_text().splitlines(), 1):
                if not COLLECT.search(AGG_FN.sub("", line)):
                    continue
                if any(tok in line for tok in ALLOWED.get(rel, [])):
                    continue
                offenders.append(f"{rel}:{lineno}: {line.strip()}")
    assert not offenders, "driver-side collect in builders:\n" + "\n".join(offenders)
