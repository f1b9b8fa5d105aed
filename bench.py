"""Benchmark harness (driver contract).

Runs the headline KG-construction pipeline plus representative operator
pipelines over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) with
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and
prints ONE JSON line:

    {"metric": "kg_build_sec", "value": <headline sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
     "pages": n, "triples": n, "triples_per_sec": r}

``--scaling`` runs the headline pipeline twice in fresh subprocesses
(num_cpus=8 then 32) on the same input and reports both throughputs plus
scaling efficiency = (t8/t32)/(32/8).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _sf_of(path: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def run_bench() -> dict:
    import ray

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    factor = int(os.environ.get("GRAFT_BENCH_FACTOR", "4"))

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    try:
        from code_graph_rag_ray.context import configure_data_context

        configure_data_context()

        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from code_graph_rag_ray.functions.vocab import (
            ENTITY_VOCAB_SORTED,
            RELATION_VOCAB_SORTED,
        )
        from code_graph_rag_ray.pipelines import catalog
        from code_graph_rag_ray.pipelines.kg import build_kg
        from code_graph_rag_ray.sources.pages import _docs_to_pages_batch

        # warm the OS page cache (untimed)
        rd.read_parquet(f"{sf_dir}/documents.parquet").count()
        rd.read_parquet(f"{sf_dir}/lineitem.parquet").count()

        # ---- headline: KG construction over (replicated) documents→pages ----
        # Replication (factor× with distinct doc ids) gives the pipeline
        # enough rows that per-stage compute, not fixed overhead, dominates —
        # the same input at every parallelism level.
        def replicate(b: pa.Table, *, _f=factor) -> pa.Table:
            tables = []
            n = b.num_rows
            base = b["doc_id"].to_numpy(zero_copy_only=False)
            for k in range(_f):
                t = b.set_column(
                    b.column_names.index("doc_id"), "doc_id",
                    pa.array(base + k * 10_000_000, pa.int64()),
                )
                tables.append(t)
            del n
            return pa.concat_tables(tables)

        docs = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
        ).map_batches(replicate, batch_format="pyarrow")
        pages = docs.map_batches(_docs_to_pages_batch, batch_format="pyarrow")

        alias_tbl = pa.Table.from_pylist(
            [{"alias": w, "entity_id": w, "prior": 1.0} for w in ENTITY_VOCAB_SORTED]
        )
        relations = {w: w for w in RELATION_VOCAB_SORTED}

        t0 = time.perf_counter()
        kg = build_kg(
            pages, alias_tbl, relations=relations,
            linker_concurrency=max(2, num_cpus - 2),
        )
        n_pages = kg["mentions"].count()  # forces the mentions materialize
        n_triples = kg["edges"].count()
        headline = time.perf_counter() - t0

        # ---- representative per-query timings ----
        per_q: dict[str, float] = {}
        for name in ("q1_pricing_summary", "q5_nation_revenue", "doc_triples",
                     "doc_quality", "events_hourly", "knn_brute"):
            t0 = time.perf_counter()
            res = catalog.QUERIES[name](sf_dir)
            if hasattr(res, "count"):
                res.count()
            per_q[name] = round(time.perf_counter() - t0, 3)

        del np
        return {
            "metric": "kg_build_sec",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": per_q,
            "sf": _sf_of(sf_dir),
            "num_cpus": num_cpus,
            "bench_factor": factor,
            "mention_rows": int(n_pages),
            "triples": int(n_triples),
            "triples_per_sec": round(n_triples / headline, 1),
        }
    finally:
        ray.shutdown()


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "triples_per_sec_8": r_lo["triples_per_sec"],
        "triples_per_sec_32": r_hi["triples_per_sec"],
        "sf": r_hi["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
