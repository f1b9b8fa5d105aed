"""Findings rule tier tests (M12 analog): registry semantics + custom rules."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from code_graph_rag_ray.stages.findings import FindingRule, scan_findings


def _ds(texts):
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )


def test_default_rules_count_matches():
    ds = _ds(["the stream sorted slowly", "no hits here x", "run 12 and 345"])
    out = scan_findings(ds).to_pandas()
    got = {(r.doc_id, r.rule_id): r.n_matches for r in out.itertuples()}
    assert got[(0, "s_word")] == 3          # stream, sorted, slowly
    assert got[(2, "number_run")] == 2      # 12, 345
    assert (0, "number_run") not in got     # zero-match rows dropped
    sev = dict(zip(out.rule_id, out.severity))
    assert sev["number_run"] == "warn"


def test_custom_rule_registry_plug_point():
    rules = [FindingRule("shout", r"[A-Z]{4,}", "error")]
    ds = _ds(["WARNING this is LOUD", "quiet text"])
    out = scan_findings(ds, rules).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.doc_id, r.rule_id, r.severity, r.n_matches) == (0, "shout", "error", 2)
