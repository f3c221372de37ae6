"""Unit pins for bench._compact — the one-line driver record: the
overflow fold must conserve total query time across repeated folds and
leave normal-size records untouched (no Ray needed)."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def _record(queries: dict) -> dict:
    return {
        "metric": "m",
        "value": 1.0,
        "unit": "sec",
        "sf": "x",
        "num_cpus": 32,
        "crawl": {"crawl_sec": 1.0},
        "queries": queries,
    }


def test_compact_normal_record_unfolded():
    out = bench._compact(_record({f"q{i}": 0.4 for i in range(80)}))
    assert "_fast_queries_total" not in out["queries"]
    assert len(out["queries"]) == 80


def test_compact_fold_conserves_total_time():
    qs = {f"synthetic_query_name_padpadpadpadpadpadpad_{i:03d}": 0.4
          for i in range(300)}
    out = bench._compact(_record(qs))
    line = json.dumps(out, separators=(",", ":"))
    assert len(line) <= 3500 or len(out["queries"]) <= 10
    kept = sum(v for k, v in out["queries"].items()
               if k != "_fast_queries_total")
    agg = out["queries"].get("_fast_queries_total", 0.0)
    assert abs(kept + agg - 300 * 0.4) < 0.5  # folds accumulate, never drop
    # the aggregate itself must never have been folded away
    assert "_fast_queries_total" in out["queries"]


def test_compact_scaling_fields_pass_through():
    rec = _record({"q": 0.4})
    rec["scaling_4_16"] = {
        "crawl_efficiency": 0.5,
        "index_efficiency": 0.9,
        "tokenize_efficiency": 1.3,
        "lo": {"docs_indexed_per_sec": 400.0},
        "hi": {"docs_indexed_per_sec": 1500.0},
        "retries": 0,
        "ceiling": {"membw_eff": 0.44, "cpu_eff": 0.8},
        "vs_ceiling": {"crawl": 1.14, "index": 1.13, "tokenize": 1.63},
    }
    out = bench._compact(rec)
    s4 = out["scaling_4_16"]
    assert s4["ceiling"] == {"membw_eff": 0.44, "cpu_eff": 0.8}
    assert s4["vs_ceiling"]["crawl"] == 1.14
    assert s4["crawl_eff"] == 0.5 and s4["retries"] == 0
