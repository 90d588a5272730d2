"""README/STATUS per-config numbers must be the mechanical render of a
current BENCH record (VERDICT r4 weak #5 / #6: hand-copied tables
drifted 2-4% from the driver record for two rounds)."""

import glob
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

import render_bench_tables as rbt  # noqa: E402


def _docs_with_markers():
    out = []
    for name in ("README.md", "STATUS.md"):
        path = os.path.join(ROOT, name)
        if os.path.exists(path) and rbt.BEGIN_RE.search(open(path).read()):
            out.append(path)
    return out


def test_rendered_block_matches_source():
    docs = _docs_with_markers()
    assert docs, "no doc carries the BENCH-TABLE markers"
    for path in docs:
        text = open(path).read()
        m = rbt.BEGIN_RE.search(text)
        src = re.search(r"source=(BENCH_r\d+\.json)", m.group(0))
        assert src, f"{path}: marker lacks source="
        block = text[m.start(): text.index(rbt.END) + len(rbt.END)]
        assert block == rbt.render(src.group(1)), (
            f"{path}: table does not match its source "
            f"{src.group(1)} — rerun scripts/render_bench_tables.py")


def test_source_is_a_current_round():
    """The rendered source must be the newest BENCH record, or lag it
    by at most one round (the driver writes BENCH_r{N}.json AFTER the
    round's last commit, so a one-round lag is structural)."""
    files = sorted(
        glob.glob(os.path.join(ROOT, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    allowed = {os.path.basename(p) for p in files[-2:]}
    for path in _docs_with_markers():
        m = rbt.BEGIN_RE.search(open(path).read())
        src = re.search(r"source=(BENCH_r\d+\.json)", m.group(0)).group(1)
        assert src in allowed, (
            f"{path} rendered from {src}, newest allowed: {allowed}")
