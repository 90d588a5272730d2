"""The size-aware FFT auto tables must agree with the measured sweep
artifact (bench/fftsize_v5e_r5.jsonl) — same trust-anchor idea as the
cost-model cross-check: a hand edit to either the table or the artifact
that makes auto pick a measured loser fails here.

Tolerance: auto's pick must be within 5% of the best measured engine at
that (size, precision) cell (near-ties like 1024-highest inverse are
legitimate picks on SNR grounds)."""

import json
import os
from collections import defaultdict

import pytest

from llzlab_tpu.ops import transform as tr

ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
ART = os.path.join(ROOT, "bench", "fftsize_v5e_r5.jsonl")


def _load(op):
    cells = defaultdict(dict)
    for line in open(ART):
        line = line.strip()
        if not line:
            continue
        r = json.loads(line)
        if r.get("op") != op or "msps" not in r:
            continue
        if r["precision"] not in ("high", "highest"):
            continue
        # keep the best (min-wall) value if a cell was measured twice
        cur = cells[(r["nfft"], r["precision"])].get(r["engine"], 0.0)
        cells[(r["nfft"], r["precision"])][r["engine"]] = max(
            cur, r["msps"])
    return cells


@pytest.mark.parametrize("op,auto", [
    ("fft", tr._auto_rfft_engine),
    ("ifft", tr._auto_irfft_engine),
    ("cfft", tr._auto_cfft_engine),
])
def test_auto_picks_measured_winner(op, auto):
    cells = _load(op)
    assert cells, f"artifact has no {op} rows"
    for (n, prec), engines in sorted(cells.items()):
        pick = auto(n, prec)
        assert pick in engines, (
            f"{op} n={n} {prec}: auto picked {pick!r} which the "
            f"artifact never measured ({sorted(engines)})")
        best = max(engines.values())
        got = engines[pick]
        assert got >= 0.95 * best, (
            f"{op} n={n} {prec}: auto picked {pick} at {got:.0f} Msps "
            f"but the measured best is {best:.0f} "
            f"({max(engines, key=engines.get)})")
