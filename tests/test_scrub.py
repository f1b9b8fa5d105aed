"""PII / pattern redaction (stages/scrub.py) unit tests."""

from __future__ import annotations

import pyarrow as pa

from code_graph_rag_ray.stages.scrub import DEFAULT_RULES, scrub_batch


def _t(texts):
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )


def test_scrub_default_rules():
    b = _t(
        [
            "mail bob.smith+x@corp.example.com now",
            "from 192.168.0.1 to 10.0.0.255 end",
            "call +1-555-867-5309 or +44-20-7946-0958",
            "clean text no pii",
        ]
    )
    out = scrub_batch(b).to_pylist()
    assert out[0]["text_clean"] == "mail <EMAIL> now"
    assert out[0]["n_email"] == 1 and out[0]["n_ipv4"] == 0
    assert out[1]["text_clean"] == "from <IP> to <IP> end"
    assert out[1]["n_ipv4"] == 2
    assert out[2]["text_clean"] == "call <PHONE> or <PHONE>"
    assert out[2]["n_phone"] == 2
    assert out[3]["text_clean"] == "clean text no pii"
    assert out[3]["n_email"] == out[3]["n_ipv4"] == out[3]["n_phone"] == 0


def test_scrub_idempotent():
    b = _t(["a@b.co 1.2.3.4 +1-555-0000-11"])
    once = scrub_batch(b)
    again = scrub_batch(once.rename_columns(
        ["doc_id", "n_email", "n_ipv4", "n_phone", "text"]
    ))
    assert once["text_clean"].to_pylist() == again["text_clean"].to_pylist()


def test_scrub_custom_rule_registry():
    rules = DEFAULT_RULES + (("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),)
    b = _t(["ssn 123-45-6789 here"])
    out = scrub_batch(b, rules=rules).to_pylist()[0]
    assert out["text_clean"] == "ssn <SSN> here"
    assert out["n_ssn"] == 1
