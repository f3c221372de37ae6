"""Scale-anti-pattern lint over the engine source.

The 100 TB design rules this repo builds on (README / SURVEY §7) are easy
to erode one convenience call at a time: a `take_all()` that "is only for
debugging", a pandas batch format "just for this stage". This test walks
every engine module and fails on the known scale-killers, with an
explicit whitelist for the few sites that are provably small-data (each
carries its justification below — extend the whitelist consciously, in
review, not by reflex).
"""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / (
    "web_crawler_search_engine_ray"
)

# (pattern, human name). Patterns are matched per source line with
# comments stripped.
FORBIDDEN = [
    (re.compile(r"""batch_format\s*=\s*["']pandas["']"""), "pandas batch format"),
    (re.compile(r"\.iter_rows\("), "driver-side row iteration"),
    (re.compile(r"\.take_all\("), "full-dataset driver collect"),
    (re.compile(r"\.to_pandas\("), "driver-side pandas materialization"),
    # Dataset.map(fn) is per-row Python; map_batches/map_groups are fine
    # (the lookahead excludes the method-NAME continuation, so
    # `.map(_private_fn)` is still caught).
    (re.compile(r"\.map(?!_)\("), "per-row Dataset.map"),
]

# (filename, substring that must appear on the offending line): sites
# verified small-data — documented here so the next reader sees WHY.
WHITELIST = {
    # one row PER HASH BUCKET (n_seq_buckets total, ~256), not per record
    ("stages/index.py", 'r["rows"] for r in counts.take_all()'),
    # postings for the QUERY'S terms only (top-k path), already pruned
    ("pipelines/search.py", "df = tbl.to_pandas()"),
    # JavaScript Array.map inside the serve HTML template string — not a
    # Ray Dataset call
    ("__main__.py", "d.results.map(x=>"),
    # ThreadPoolExecutor.map over per-HOST fetch groups (network I/O
    # transport, gated off by default) — not a Ray Dataset call
    ("stages/http_fetch.py", "list(ex.map(run_host, by_host.values()))"),
}


def _lines(path: pathlib.Path):
    """Source lines with comments stripped via the tokenizer (a naive
    '#'-split would truncate at '#' inside string literals and hide
    offenders later on the line)."""
    import io
    import tokenize

    text = path.read_text()
    comment_starts: dict[int, int] = {}
    try:
        for tok in tokenize.generate_tokens(io.StringIO(text).readline):
            if tok.type == tokenize.COMMENT:
                comment_starts[tok.start[0]] = tok.start[1]
    except tokenize.TokenError:
        pass  # fall back to raw lines on malformed source
    for i, raw in enumerate(text.splitlines(), 1):
        line = raw[: comment_starts[i]] if i in comment_starts else raw
        if line.strip():
            yield i, line


def test_no_scale_antipatterns_in_engine():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        rel = str(path.relative_to(PKG))
        for lineno, line in _lines(path):
            for pat, name in FORBIDDEN:
                if not pat.search(line):
                    continue
                if any(
                    rel.endswith(f) and frag in line for f, frag in WHITELIST
                ):
                    continue
                offenders.append(f"{rel}:{lineno} [{name}] {line.strip()}")
    assert not offenders, (
        "scale anti-patterns found (whitelist deliberate exceptions in "
        "tests/test_scale_lint.py):\n" + "\n".join(offenders)
    )


def test_whitelist_is_current():
    """Every whitelist entry must still match a real line — stale entries
    hide new offenders behind old justifications."""
    for fname, frag in WHITELIST:
        path = PKG / fname
        assert path.exists(), f"whitelisted file gone: {fname}"
        assert any(
            frag in line for _, line in _lines(path)
        ), f"stale whitelist entry: {fname} :: {frag}"
